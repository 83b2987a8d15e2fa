package graft.functions

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** Date parsing with BCE + open-precision semantics.
  *
  * Re-expression of the reference's date handling
  * (`pipeline/process/utils/mapper_utils.py:241-494` make_datetime,
  * `pipeline/sources/general/wikidata/mapper.py:76-119` precision wrapper,
  * `pipeline/process/base/mapper.py:188-271` century phrases,
  * `pipeline/sources/lux/marklogic/mapper.py:83-97` BCE epoch seconds).
  *
  * Semantics: a date string + optional precision yields a closed interval
  * `[begin, end]` of ISO strings where `end = begin + 1 precision-unit - 1s`.
  * Years are proleptic-Gregorian ISO (year 0 = 1 BCE), always rendered
  * 4-digit zero-padded with a leading '-' for BCE; values NEVER pass
  * through TimestampType (BCE-unsafe) — epoch seconds are derived as Long.
  *
  * Deviations from the reference (documented, deliberate):
  *  - the EDTF library's double end-second subtraction quirk is not
  *    reproduced; end is always exactly next-period-start minus 1s;
  *  - Hebrew-calendar years (>4500) are rejected rather than converted;
  *  - locale fallbacks beyond English month names are unsupported.
  */
object DateLib {

  final case class DateRange(begin: String, end: String)

  private val parenPrefix = "^\\([^)]*\\)\\s*".r
  private val eightDigit = "^\\d{8}$".r
  private val sixDigit = "^\\d{6}$".r
  private val shortYearIso = "^(-?)(\\d{2,3})(-\\d\\d-\\d\\d([^0-9].*|$))".r
  private val germanBc = "^(?:(\\d\\d)\\.(\\d\\d)\\.)?v(\\d{2,3})$".r
  // numeric-year-only: "1000 BC"; century phrases keep their own suffix
  private val bceSuffix = "(?i)^(\\d{1,4})\\s+(?:B\\.?C\\.?E?\\.?|BCE)$".r
  private val isoLike =
    "^(-?)(\\d{1,6})(?:-(\\d{1,2})(?:-(\\d{1,2})(?:[T ](\\d{1,2}):(\\d{1,2})(?::(\\d{1,2}))?Z?)?)?)?$".r
  private val masked = "^(-?)(\\d{1,3})(X{1,3})$".r
  private val approxYear = "^(-?\\d{1,4})[?~]$".r
  private val yearRange = "^(-?\\d{1,4})\\s*-\\s*(-?\\d{1,4})$".r
  private val century =
    "(?i)^(?:early|mid|late)?\\s*(\\d{1,2})(?:st|nd|rd|th) century( (?:B\\.?C\\.?E?\\.?|BCE))?$".r
  private val centuryRange =
    "(?i)^(?:early|mid|late)?\\s*(\\d{1,2})(?:st|nd|rd|th) century\\s*-\\s*(?:early|mid|late)?\\s*(\\d{1,2})(?:st|nd|rd|th) century$".r
  private val monthNames: Map[String, Int] = {
    val full = Seq("january", "february", "march", "april", "may", "june",
      "july", "august", "september", "october", "november", "december")
    (full.zipWithIndex.map { case (m, i) => m -> (i + 1) } ++
      full.zipWithIndex.map { case (m, i) => m.take(3) -> (i + 1) }).toMap
  }
  // "September 2002" / "Sep 2002" / "19 September 2002" / "September 19, 2002"
  private val monthYear = "(?i)^([a-z]{3,9})\\.?,?\\s+(\\d{3,4})$".r
  private val dayMonthYear = "(?i)^(\\d{1,2})(?:st|nd|rd|th)?\\s+([a-z]{3,9})\\.?,?\\s+(\\d{3,4})$".r
  private val monthDayYear = "(?i)^([a-z]{3,9})\\.?\\s+(\\d{1,2})(?:st|nd|rd|th)?,?\\s+(\\d{3,4})$".r
  private val numericDmy = "^(\\d{1,2})[./](\\d{1,2})[./](\\d{4})$".r
  private val numericYmd = "^(\\d{4})[./](\\d{1,2})[./](\\d{1,2})$".r

  /** Precision char -> ChronoUnit for interval width. */
  private def unitOf(prec: Char): ChronoUnit = prec match {
    case 'Y' => ChronoUnit.YEARS
    case 'M' => ChronoUnit.MONTHS
    case 'D' => ChronoUnit.DAYS
    case 'h' => ChronoUnit.HOURS
    case 'm' => ChronoUnit.MINUTES
    case _   => ChronoUnit.SECONDS
  }

  /** ISO render with sign + 4-digit-padded year (BCE-safe, no Z). */
  def fmt(dt: LocalDateTime): String = {
    val y = dt.getYear
    val sign = if (y < 0) "-" else ""
    f"$sign${math.abs(y)}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02dT${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
  }

  private def range(begin: LocalDateTime, prec: Char): DateRange = {
    val end = begin.plus(1, unitOf(prec)).minusSeconds(1)
    DateRange(fmt(begin), fmt(end))
  }

  private def rangeYears(y1: Int, y2: Int): DateRange =
    DateRange(fmt(LocalDateTime.of(y1, 1, 1, 0, 0, 0)),
      fmt(LocalDateTime.of(y2, 1, 1, 0, 0, 0).plusYears(1).minusSeconds(1)))

  /** Parse a cleaned ISO-component string into (begin, inferred precision). */
  private def parseIso(sign: String, y: String, mo: String, d: String,
      h: String, mi: String, s: String): Option[(LocalDateTime, Char)] = {
    val year = y.toInt * (if (sign == "-") -1 else 1)
    val prec: Char =
      if (s != null) 's' else if (mi != null) 'm' else if (h != null) 'h'
      else if (d != null) 'D' else if (mo != null) 'M' else 'Y'
    try Some((LocalDateTime.of(year,
      if (mo != null) mo.toInt else 1, if (d != null) d.toInt else 1,
      if (h != null) h.toInt else 0, if (mi != null) mi.toInt else 0,
      if (s != null) s.toInt else 0), prec))
    catch { case _: Exception => None }
  }

  /** The main entry: date string (+ optional precision Y/M/D/h/m/s) ->
    * closed [begin, end] interval, or None if unparseable/garbage. */
  def makeDatetime(rawIn: String, precision: String = ""): Option[DateRange] = {
    if (rawIn == null) return None
    var v = parenPrefix.replaceFirstIn(rawIn, "")
      .replace("edtf", "").replace("=", "-").trim
    if (eightDigit.matches(v)) v = s"${v.substring(0, 4)}-${v.substring(4, 6)}-${v.substring(6)}"
    if (v.isEmpty || v.startsWith("9999") || v == "0000" ||
      v.toLowerCase.contains("jh") || v.length > 34) return None
    if (v.startsWith("- ")) v = "-" + v.substring(2).trim
    if (v.startsWith("0000-12-31") || v.startsWith("0000-01-01")) v = "0001" + v.substring(4)
    v = shortYearIso.replaceAllIn(v, m =>
      m.group(1) + ("0" * (4 - m.group(2).length)) + m.group(2) + m.group(3))
    if (v.contains("-00T00:00:00")) v = v.substring(0, v.indexOf('T'))
    germanBc.findFirstMatchIn(v).foreach { m =>
      // German "v" (vor Christus) is human BCE numbering too: N BCE -> ISO -(N-1)
      val isoY = 1 - m.group(3).toInt
      val ys = if (isoY == 0) "0000" else f"-${-isoY}%04d"
      v = if (m.group(1) != null) s"$ys-${m.group(2)}-${m.group(1)}" else ys
    }
    if (sixDigit.matches(v)) v = s"${v.substring(0, 4)}-${v.substring(4)}"
    // BCE suffix form uses human year numbering (no year zero), while ISO is
    // astronomical (year 0 = 1 BCE) — same convention the century path uses,
    // so "1000 BC" and "10th century BCE" agree: year N BCE -> ISO -(N-1).
    bceSuffix.findFirstMatchIn(v).foreach { m =>
      val isoY = 1 - m.group(1).trim.toInt
      v = if (isoY == 0) "0000" else f"-${-isoY}%04d"
    }

    val effPrec: String => Char = inferred =>
      if (precision.nonEmpty) precision.head else inferred.head

    v match {
      case century(n, bce) =>
        val c = n.toInt
        // Nth century CE: years (N-1)*100 .. (N-1)*100+99;
        // Nth century BCE: years N*100..(N-1)*100+1 BCE -> ISO 1-N*100 .. -(N-1)*100
        if (bce != null) Some(rangeYears(1 - c * 100, -((c - 1) * 100)))
        else Some(rangeYears((c - 1) * 100, (c - 1) * 100 + 99))
      case centuryRange(a, b) =>
        Some(rangeYears((a.toInt - 1) * 100, (b.toInt - 1) * 100 + 99))
      case masked(sign, digits, xs) =>
        // EDTF masked year: the X run is the unknown span, so "1XX" is the
        // 3-digit range 100-199, not 1000-1999.
        val missing = xs.length
        val lo = (digits + "0" * missing).toInt
        val hi = (digits + "9" * missing).toInt
        if (sign == "-") Some(rangeYears(-hi, -lo)) else Some(rangeYears(lo, hi))
      case approxYear(y) =>
        val yr = y.toInt
        Some(rangeYears(yr - 1, yr + 1))
      case yearRange(a, b) if a.toInt <= b.toInt && a.length == 4 =>
        Some(rangeYears(a.toInt, b.toInt))
      case isoLike(sign, y, mo, d, h, mi, s) =>
        if (y.toInt > 4500 && sign.isEmpty) None // Hebrew-calendar years: unsupported
        else parseIso(sign, y, mo, d, h, mi, s).map { case (begin, inferred) =>
          range(begin, if (precision.nonEmpty) precision.head else inferred)
        }
      case monthYear(mn, y) if monthNames.contains(mn.toLowerCase.take(3)) &&
          monthNames.contains(mn.toLowerCase) || monthNames.contains(mn.toLowerCase.take(3)) =>
        monthNames.get(mn.toLowerCase).orElse(monthNames.get(mn.toLowerCase.take(3)))
          .flatMap(m => try Some(range(LocalDateTime.of(y.toInt, m, 1, 0, 0, 0),
            effPrec("M"))) catch { case _: Exception => None })
      case dayMonthYear(d, mn, y) =>
        monthNames.get(mn.toLowerCase).orElse(monthNames.get(mn.toLowerCase.take(3)))
          .flatMap(m => try Some(range(LocalDateTime.of(y.toInt, m, d.toInt, 0, 0, 0),
            effPrec("D"))) catch { case _: Exception => None })
      case monthDayYear(mn, d, y) =>
        monthNames.get(mn.toLowerCase).orElse(monthNames.get(mn.toLowerCase.take(3)))
          .flatMap(m => try Some(range(LocalDateTime.of(y.toInt, m, d.toInt, 0, 0, 0),
            effPrec("D"))) catch { case _: Exception => None })
      case numericDmy(a, b, y) =>
        // day-first when unambiguous, else month-first
        val (dd, mm) = if (a.toInt > 12) (a.toInt, b.toInt) else (b.toInt, a.toInt)
        try Some(range(LocalDateTime.of(y.toInt, mm, dd, 0, 0, 0), effPrec("D")))
        catch { case _: Exception => None }
      case numericYmd(y, m, d) =>
        try Some(range(LocalDateTime.of(y.toInt, m.toInt, d.toInt, 0, 0, 0), effPrec("D")))
        catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Wikidata wrapper: `+YYYY-MM-DDT00:00:00Z` + numeric precision
    * (11=day, 10=month, 9=year; <9 decade/century/millennium -> None). */
  def makeDatetimeWikidata(time: String, precision: Int): Option[DateRange] = {
    if (precision < 9) return None
    var t = if (time.startsWith("+")) time.substring(1) else time
    if (t.endsWith("Z")) t = t.dropRight(1)
    // unknown month/day encoded as -00: clamp to -01 (not the sign digit)
    if (t.length > 1) t = t.charAt(0) + t.substring(1).replace("-00", "-01")
    val neg = t.startsWith("-")
    val body = if (neg) t.substring(1) else t
    val parts = body.split("[-T]")
    val precChar = precision match { case 9 => "Y" case 10 => "M" case _ => "D" }
    val trimmed = precision match {
      case 9 => parts(0)
      case 10 => s"${parts(0)}-${parts(1)}"
      case _ => body.split("T")(0)
    }
    makeDatetime((if (neg) "-" else "") + trimmed, precChar)
  }

  /** F12: BCE-safe epoch seconds from an ISO string (proleptic Gregorian,
    * int64 — the reference needed numpy for the same reason). */
  def epochSeconds(iso: String): Option[Long] = iso match {
    case isoLike(sign, y, mo, d, h, mi, s) =>
      try {
        val year = y.toInt * (if (sign == "-") -1 else 1)
        Some(LocalDateTime.of(year,
          if (mo != null) mo.toInt else 1, if (d != null) d.toInt else 1,
          if (h != null) h.toInt else 0, if (mi != null) mi.toInt else 0,
          if (s != null) s.toInt else 0).toEpochSecond(java.time.ZoneOffset.UTC))
      } catch { case _: Exception => None }
    case _ => None
  }

  /** F5: BCE-aware year extraction from a timespan begin string. */
  def yearOf(iso: String): Option[Int] = {
    if (iso == null || iso.isEmpty) None
    else if (iso.startsWith("-"))
      iso.substring(1).split("[-T]").headOption.flatMap(y =>
        y.toIntOption.map(i => -i))
    else iso.split("[-T]").headOption.flatMap(_.toIntOption)
  }

  private val maxLifeSeconds: Long = 122L * 365 * 24 * 3600 + 30 * 24 * 3600

  /** F4: birth/death sanity — die after born, live at most ~122 years. */
  def plausibleLifespan(bornBegin: String, diedEnd: String): Boolean =
    (epochSeconds(bornBegin), epochSeconds(diedEnd)) match {
      case (Some(b), Some(d)) => d >= b && (d - b) <= maxLifeSeconds
      case _ => true // missing data never disqualifies
    }
}
