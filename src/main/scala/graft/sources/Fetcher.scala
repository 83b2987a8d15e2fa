package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S8: the record fetcher with its networkmap — re-expression of
  * `pipeline/process/base/fetcher.py:30-85`:
  *
  *   - identifiers validate before templating into fetch URLs
  *     (`:30-44`);
  *   - the networkmap (url → prior response) is consulted first: "0"/
  *     "000" or a 3-digit failure status mean "request anyway" (the
  *     reference logs and retries); anything longer is a recorded
  *     REDIRECT whose target re-templates (`:46-55`);
  *   - 200 responses wrap into the record envelope (data, source,
  *     identifier); failures surface with their status so the caller
  *     can append them to the networkmap (`:62-82`).
  *
  * Spark shape: the networkmap is a broadcast-joined table, the fetch
  * frontier a Dataset, and the transport a pluggable function executed
  * in mapPartitions (per-partition session init, like the acquirer
  * pools). Tests and fixtures inject a deterministic transport — no
  * network I/O lives in this library. */
object Fetcher {

  final case class Fetched(kind: String, identifier: String, url: String,
      status: Int, body: String)

  /** One pass over the frontier: returns kind "ok" rows (envelopes) and
    * kind "err" rows (networkmap updates: url + failure status). */
  def fetchAll(ids: Dataset[String], template: String => String,
      validate: String => Boolean, networkmap: DataFrame,
      transport: String => (Int, String)): Dataset[Fetched] = {
    val spark = ids.sparkSession
    import spark.implicits._
    val frontier = ids.filter(validate)
      .map(id => (id, template(id))).toDF("identifier", "url")
    val joined = frontier
      .join(broadcast(networkmap.select($"url", $"resp")), Seq("url"), "left")
      .select($"identifier", $"url", $"resp").as[(String, String, String)]
    joined.mapPartitions { it =>
      // per-partition transport/session init would go here
      it.map { case (id, url0, resp) =>
        val url =
          if (resp == null) url0
          else if (resp == "0" || resp == "000" ||
            (resp.length == 3 && resp.forall(_.isDigit) && resp.toInt > 399))
            url0 // recorded failure: request anyway (fetcher.py:48-50)
          else if (resp.length > 3) template(resp) // recorded redirect
          else url0
        val (status, body) = transport(url)
        if (status == 200) Fetched("ok", id, url, status, body)
        else Fetched("err", id, url, status, null)
      }
    }
  }
}
