package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial operators over synthetic integer-microdegree points — the
  * geo side of the reference's place handling (WKT points/boxes,
  * `pipeline/process/merger.py:177-244`, `wikidata/mapper.py:776-822`)
  * extended to the distance-join shape a 100 TB pipeline needs (nearest
  * facility / place-conflation joins).
  *
  * Scale design: a distance-≤-r join NEVER runs as a cross join. Each
  * point maps to a square grid cell of side exactly r; a true pair within
  * distance r is then guaranteed to sit in the same cell or one of the 8
  * neighbors, so probing the 3×3 neighborhood is EXACT (no recall loss).
  * The join is a plain equi-join on cell id — shuffle ∝ 9·|probe| +
  * |build|, each cell a tiny fraction of the corpus. Coordinates are
  * integer microdegrees so squared distances (≤ ~1.3e17) stay exact in
  * Long and both engines agree bit-for-bit.
  */
object GeoQueries extends QueryGroup {

  /** Distance threshold in integer microdegrees (2°). */
  val RadiusMicro = 2000000L

  /** Deterministic synthetic point for key k: multiplier pair folds the
    * key over the lat/lon domain (µdeg). */
  private def latCol(k: Column, m: Long): Column =
    pmod(k * m, lit(180000000L)) - 90000000L
  private def lonCol(k: Column, m: Long): Column =
    pmod(k * m, lit(360000000L)) - 180000000L
  private def latSql(k: String, m: Long): String =
    s"(($k * $m) % 180000000 + 180000000) % 180000000 - 90000000"
  private def lonSql(k: String, m: Long): String =
    s"(($k * $m) % 360000000 + 360000000) % 360000000 - 180000000"

  /** J19: grid-bucketed distance join — every (customer, supplier) point
    * pair within RadiusMicro (squared euclidean on the planar µdeg
    * grid). Build side carries its own cell; probe side explodes to the
    * 3×3 cell neighborhood; the distance predicate then filters the few
    * co-bucketed candidates. Oracle = the brute-force quadratic join,
    * feasible only at test sf — which is exactly the point. */
  def gridDistanceJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = RadiusMicro
    // intDiv is true FLOOR division (see its doc): cells straddling zero
    // stay exactly r wide, which the 3×3 neighborhood guarantee needs
    def cell(x: Column) = TextQueries.intDiv(x, lit(r))
    val cust = Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long").as("c_key"))
      .withColumn("cx", latCol($"c_key", 7919L))
      .withColumn("cy", lonCol($"c_key", 104729L))
    val supp = Tables.load(spark, dir, "supplier")
      .select($"s_suppkey".cast("long").as("s_key"))
      .withColumn("sx", latCol($"s_key", 15485863L))
      .withColumn("sy", lonCol($"s_key", 32452843L))
      .withColumn("cell_x", cell($"sx")).withColumn("cell_y", cell($"sy"))
    val probes = cust
      .withColumn("cell_x", explode(array(
        cell($"cx") - 1, cell($"cx"), cell($"cx") + 1)))
      .withColumn("cell_y", explode(array(
        cell($"cy") - 1, cell($"cy"), cell($"cy") + 1)))
    probes.join(supp, Seq("cell_x", "cell_y"))
      .withColumn("d2",
        ($"cx" - $"sx") * ($"cx" - $"sx") + ($"cy" - $"sy") * ($"cy" - $"sy"))
      .filter($"d2" <= lit(r * r))
      .select($"c_key", $"s_key", $"d2")
  }
  private val gridDistanceOracle: String =
    s"""WITH c AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS c_key,
       |    ${latSql("c_custkey", 7919L)} AS cx,
       |    ${lonSql("c_custkey", 104729L)} AS cy
       |  FROM customer),
       |s AS (
       |  SELECT CAST(s_suppkey AS BIGINT) AS s_key,
       |    ${latSql("s_suppkey", 15485863L)} AS sx,
       |    ${lonSql("s_suppkey", 32452843L)} AS sy
       |  FROM supplier)
       |SELECT c_key, s_key, (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) AS d2
       |FROM c, s
       |WHERE (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy)
       |  <= ${RadiusMicro * RadiusMicro}""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("j19_grid_distance_join", gridDistanceJoin,
      Some(gridDistanceOracle), bench = true))
  }
}
