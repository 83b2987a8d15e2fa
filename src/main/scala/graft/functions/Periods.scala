package graft.functions

/** M11: period-record parsing — `process_period_record`
  * (`pipeline/process/base/mapper.py:196-271`): a Period record with no
  * timespan derives one from its primary-name content.
  *
  * Intended semantics (century regexes `:188-194`, comma-split `:215-217`):
  * century phrases (with early/mid/late qualifiers) map to year spans,
  * century ranges span first-start..second-end, otherwise the text after
  * the last comma ("Dynasty, 304-439") or the whole content goes through
  * make_datetime. DEVIATION, documented: the reference's final
  * `else: dates = content` overwrites the single-century and comma
  * branches (an indentation slip that makes them dead code); we
  * implement the evident intent. DateLib already parses the century
  * phrase forms natively, so the delegation order below reproduces it.
  *
  * Every Period record also gains the AAT Period classification
  * (aat:300081446, `:198-205`) — surfaced by the caller.
  */
object Periods {

  val PeriodClass = "http://vocab.getty.edu/aat/300081446"

  def periodTimespan(content0: String): Option[DateLib.DateRange] = {
    if (content0 == null) return None
    val content = content0.trim
    DateLib.makeDatetime(content).orElse {
      val i = content.lastIndexOf(',')
      if (i >= 0) DateLib.makeDatetime(content.substring(i + 1).trim) else None
    }
  }
}
