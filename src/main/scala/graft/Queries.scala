package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the test tables and
  * (when SQL-expressible) the equivalent DuckDB oracle SQL.
  *
  * Determinism contract (driver hash-compares against DuckDB):
  *   - results are deterministic SETS (driver sorts before hashing);
  *   - float aggregates are quantized to integer units (cents etc.), summed
  *     exactly in BIGINT, and only then converted to double via a fixed
  *     formula — identical IEEE ops on identical integers are bit-exact on
  *     both engines regardless of partitioning / summation order;
  *   - every LIMIT/top-k carries a total order (unique tie-break column).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Queries {
  private val registry = scala.collection.mutable.LinkedHashMap[String, QueryDef]()

  private[graft] def register(q: QueryDef): Unit = {
    require(!registry.contains(q.name), s"duplicate query ${q.name}")
    registry(q.name) = q
  }

  /** All registration groups; referencing the objects forces their init. */
  private lazy val groups: Seq[QueryGroup] = Seq(
    RelationalQueries, TextQueries, DedupQueries, SimilarityQueries,
    GraphQueries, MergeQueries, LuxQueries, StreamQueries, SourceQueries,
    OpsQueries, ExportQueries, ScaleQueries, MapperQueries, PatchQueries,
    WdQueries, MlIndexQueries, CleanupQueries, IncrementalQueries,
    GeoQueries, BuildChainQueries, CurationQueries)

  lazy val all: Seq[QueryDef] = { groups.foreach(_.register()); registry.values.toSeq }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
  lazy val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}

trait QueryGroup {
  /** Register this group's QueryDefs via Queries.register. */
  def register(): Unit
}
