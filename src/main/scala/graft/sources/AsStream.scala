package graft.sources

/** S6: the ActivityStreams / IIIF Change Discovery harvester walk —
  * re-expression of `pipeline/process/base/harvester.py:111-286`
  * (ASHarvester): the collection's LAST page walks backwards via `prev`
  * links, each page's items processed in REVERSE (newest first), so the
  * whole crawl runs newest→oldest and STOPS ENTIRELY at the first item
  * older than last_harvest (`:186-189`).
  *
  * Faithful details:
  *   - change types lowercase to {update, create, delete, move, merge,
  *     split, refresh}; anything else is an update (`:192-199`);
  *   - `refresh` stops the stream (`:201-206`);
  *   - object URIs smush http/https to the namespace's scheme before
  *     identifier stripping (`:213-218`);
  *   - the seen-set keeps only the NEWEST occurrence of an identifier
  *     (`:220-224`); deletes shadow anything older (`:226-229`);
  *   - `harvest_from` (windowed backfill) skips items newer than the
  *     window (`:231-233`);
  *   - deletes yield an empty datestamp (`:239-243`);
  *   - a page whose prev points at itself ends the walk (the infinite-
  *     loop guard, `:160-166`).
  *
  * Like Pmh: the page walk is sequential driver I/O (link-following);
  * Spark parallelism starts on the harvested Dataset. */
object AsStream {

  final case class AsItem(changeType: String, objectId: String, endTime: String)

  val changeTypes: Set[String] =
    Set("update", "create", "delete", "move", "merge", "split", "refresh")

  /** A paged stream: `lastPage` is the collection's `last` link; `page`
    * returns items in STREAM order (oldest→newest) + the prev link. */
  trait PageSource {
    def lastPage: Option[String]
    def page(id: String): (Seq[AsItem], Option[String])
  }

  final case class Harvested(change: String, ident: String, datestamp: String)

  def crawl(src: PageSource, namespace: String, lastHarvest: String,
      harvestFrom: Option[String] = None): Seq[Harvested] = {
    val out = Seq.newBuilder[Harvested]
    val seen = scala.collection.mutable.HashSet[String]()
    val deleted = scala.collection.mutable.HashSet[String]()
    val visitedPages = scala.collection.mutable.HashSet[String]()
    var pageId = src.lastPage
    var stopped = false
    while (pageId.isDefined && !stopped) {
      val (items, prev) = src.page(pageId.get)
      val it = items.reverseIterator
      while (it.hasNext && !stopped) {
        val item = it.next()
        if (item.endTime < lastHarvest) stopped = true // ends the STREAM
        else {
          val chg0 = Option(item.changeType).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("update")
          val chg = if (changeTypes(chg0)) chg0 else "update"
          if (chg == "refresh") stopped = true
          else {
            // http/https smush toward the namespace scheme
            val uri =
              if (item.objectId.startsWith("https://") && namespace.startsWith("http://"))
                item.objectId.replace("https://", "http://")
              else if (item.objectId.startsWith("http://") && namespace.startsWith("https://"))
                item.objectId.replace("http://", "https://")
              else item.objectId
            val ident = uri.replace(namespace, "")
            if (!seen(ident)) {
              seen += ident
              if (!deleted(ident)) {
                if (chg == "delete") deleted += ident
                if (harvestFrom.exists(f => item.endTime > f)) ()
                else if (chg == "delete") out += Harvested(chg, ident, "")
                else out += Harvested(chg, ident, item.endTime)
              }
            }
          }
        }
      }
      // prev == self is the reference's infinite-loop guard; the
      // visited set extends it to cycles of EVERY length (A -> B -> A
      // from a corrupt feed would loop the driver forever), matching
      // Pmh's resumption-token guard
      visitedPages += pageId.get
      pageId = if (stopped) None
        else prev.filterNot(visitedPages.contains)
    }
    out.result()
  }
}
