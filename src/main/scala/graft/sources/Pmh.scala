package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** S7: the OAI-PMH harvester shape — re-expression of
  * `pipeline/process/base/harvester.py:46-108` (PmhHarvester):
  * resumption-token paged walk over ListIdentifiers, incremental
  * cutoff on datestamps, every harvested header an "update" (PMH has
  * no change types, `:88`).
  *
  * The page walk is inherently sequential (each response carries the
  * next token), exactly like the reference's HTTP loop — the harvest
  * frontier is driver-side I/O; Spark parallelism starts immediately
  * after, when the harvested header set becomes a Dataset feeding the
  * fetch/map stages. `PageSource` abstracts the endpoint so tests and
  * fixtures inject deterministic feeds.
  *
  * Faithful subtlety (`:76-90` + `:97-108`): a page STOPS yielding at
  * the first header older than last_harvest (the generator `return`),
  * but pagination continues to the next resumption token regardless —
  * exactly the reference's control flow.
  */
object Pmh {

  final case class Header(ident: String, datestamp: String)
  final case class Harvested(change: String, ident: String, datestamp: String)

  /** One page: headers in feed order + the next resumption token. */
  trait PageSource {
    def fetch(token: Option[String]): (Seq[Header], Option[String])
  }

  /** Walk all pages; within each page take headers until the first one
    * older than `lastHarvest` (lexicographic, like the ISO-timestamp
    * string compare in `:79`). */
  def crawl(src: PageSource, lastHarvest: String): Seq[Harvested] = {
    val out = Seq.newBuilder[Harvested]
    val seen = scala.collection.mutable.Set.empty[String]
    var token: Option[String] = None
    var done = false
    while (!done) {
      val (headers, next) = src.fetch(token)
      out ++= headers
        .takeWhile(_.datestamp >= lastHarvest)
        .map(h => Harvested("update", h.ident, h.datestamp))
      next match {
        // a server cycling tokens (A -> B -> A ...) would loop the
        // driver forever: stop the walk the first time ANY token
        // repeats, bounding it against cycles of every length
        // (mirrors AsStream's prev==self page guard)
        case Some(t) if !seen.add(t) => done = true
        case Some(t) => token = Some(t)
        case None => done = true
      }
    }
    out.result()
  }

  def toDataset(spark: SparkSession, rows: Seq[Harvested]): Dataset[Harvested] = {
    import spark.implicits._
    spark.createDataset(rows)
  }
}
