package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` column) — the similarity-search surface of a
  * training-data pipeline (reference analog: SimilarQuery more-like-this,
  * `pipeline/storage/marklogic/ml_lexer.py:22-148`, generalized to vectors).
  *
  * Scale design: the query set is broadcast (small side), so brute-force
  * top-k is a map-side cross product + per-query top-k — no slow cross
  * shuffle. The LSH variant buckets both sides by a deterministic
  * random-hyperplane signature; at 100 TB the bucket join shuffles only
  * (bucket, vec) pairs and each bucket is a tiny fraction of the corpus
  * (multi-probe would widen recall). Vectors are milli-quantized to
  * integers so dot products are exact and the single IEEE sqrt+divide is
  * bit-stable across engines.
  */
object SimilarityQueries extends QueryGroup {
  import TextQueries.{HashP => P}
  import DedupQueries.{aj, bj}

  private val NQueries = 10 // probe set: vec_id < 10
  private val LshBits = 8

  /** Milli-quantized integer vector + its squared norm. */
  private def quantized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label",
        transform($"embedding", x => round(x.cast("double") * 1000d).cast("long")).as("q"))
      .withColumn("n2", functions.VecMath.dotCol($"q", $"q"))
  }
  private val quantizedSql: String =
    s"""SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT) * CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding]),
       |      (a,b)->a+b) AS n2
       |  FROM embeddings""".stripMargin

  private def cosMilli(qa: Column, qb: Column, n2a: Column, n2b: Column): Column =
    floor(lit(1000d) *
      functions.VecMath.dotCol(qa, qb).cast("double") /
      sqrt(n2a.cast("double") * n2b.cast("double"))).cast("long")
  private def cosMilliSql(qa: String, qb: String, n2a: String, n2b: String): String =
    s"""CAST(floor(1000.0 *
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), [$qa[i]*$qb[i] for i in range(1, len($qa)+1)]), (x,y)->x+y)
       |      / sqrt(CAST($n2a AS DOUBLE) * CAST($n2b AS DOUBLE))) AS BIGINT)""".stripMargin

  /** Brute-force cosine top-k: broadcast probe set x full corpus scan,
    * per-probe top-10 by (cos desc, vec_id) — the exact baseline. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val base = quantized(spark, dir)
    val probes = base.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"q".as("pq"), $"n2".as("pn2"))
    val scored = base.join(broadcast(probes), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosMilli($"pq", $"q", $"pn2", $"n2").as("cos_milli"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos_milli".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select($"query_id", $"rank", $"vec_id", $"cos_milli")
  }
  private val knnBruteOracle: String =
    s"""WITH base AS ($quantizedSql),
       |probes AS (SELECT vec_id AS query_id, q AS pq, n2 AS pn2 FROM base WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT query_id, vec_id,
       |    ${cosMilliSql("pq", "q", "pn2", "n2")} AS cos_milli
       |  FROM base JOIN probes ON vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_milli,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_milli DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_milli FROM ranked WHERE rank <= 10""".stripMargin

  /** LSH-bucketed ANN: 8-bit random-hyperplane signature per vector
    * (map-side), probes search only their own bucket, top-5 by cosine.
    * The IVF-style scale path: bucket size ~ corpus/2^bits. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val base = quantized(spark, dir)
    val bucketed = base.withColumn("bucket",
      functions.VecMath.sigCol($"q", LshBits, offset = 16))
    val probes = bucketed.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"bucket".as("pbucket"),
        $"q".as("pq"), $"n2".as("pn2"))
    val scored = bucketed.join(broadcast(probes),
        $"bucket" === $"pbucket" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosMilli($"pq", $"q", $"pn2", $"n2").as("cos_milli"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos_milli".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id", $"cos_milli")
  }
  private val annLshOracle: String = {
    val bits = (0 until LshBits).map { k =>
      val s = s"list_reduce(list_prepend(CAST(0 AS BIGINT), [q[i] * (((${aj(k + 16)}*i+${bj(k + 16)}) % $P) % 2 * 2 - 1) for i in range(1, len(q)+1)]), (a,b)->a+b)"
      s"(CASE WHEN $s > 0 THEN ${1L << k} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH base AS ($quantizedSql),
       |bucketed AS (SELECT vec_id, q, n2, CAST($bits AS BIGINT) AS bucket FROM base),
       |probes AS (SELECT vec_id AS query_id, bucket AS pbucket, q AS pq, n2 AS pn2
       |  FROM bucketed WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT query_id, vec_id,
       |    ${cosMilliSql("pq", "q", "pn2", "n2")} AS cos_milli
       |  FROM bucketed JOIN probes ON bucket = pbucket AND vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_milli,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_milli DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_milli FROM ranked WHERE rank <= 5""".stripMargin
  }

  /** Multi-probe ANN: each query additionally probes the 8 buckets at
    * Hamming distance 1 from its own signature (flip one hyperplane) —
    * the standard recall-widening move (multi-probe LSH, Lv et al.
    * VLDB'07): near neighbors that landed just across one hyperplane
    * are recovered without rebuilding the index or adding tables. Probe
    * volume is 9× the single-probe join's probe side (still tiny);
    * corpus-side work is unchanged. */
  def annMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val base = quantized(spark, dir)
    val bucketed = base.withColumn("bucket",
      functions.VecMath.sigCol($"q", LshBits, offset = 16))
    val probeBuckets = array(lit(0L) +:
      (0 until LshBits).map(k => lit(1L << k)): _*)
    val probes = bucketed.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"q".as("pq"), $"n2".as("pn2"),
        explode(probeBuckets).as("flip"),
        $"bucket".as("pbucket"))
      .select($"query_id", $"pq", $"pn2",
        $"pbucket".bitwiseXOR($"flip").as("probe"))
    val scored = bucketed.join(broadcast(probes),
        $"bucket" === $"probe" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosMilli($"pq", $"q", $"pn2", $"n2").as("cos_milli"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos_milli".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id", $"cos_milli")
  }
  private val annMultiprobeOracle: String = {
    val bits = (0 until LshBits).map { k =>
      val s = s"list_reduce(list_prepend(CAST(0 AS BIGINT), [q[i] * (((${aj(k + 16)}*i+${bj(k + 16)}) % $P) % 2 * 2 - 1) for i in range(1, len(q)+1)]), (a,b)->a+b)"
      s"(CASE WHEN $s > 0 THEN ${1L << k} ELSE 0 END)"
    }.mkString(" + ")
    val flips = (Seq(0L) ++ (0 until LshBits).map(k => 1L << k))
      .map(f => s"SELECT $f AS flip").mkString("\nUNION ALL\n")
    s"""WITH base AS ($quantizedSql),
       |bucketed AS (SELECT vec_id, q, n2, CAST($bits AS BIGINT) AS bucket FROM base),
       |flips AS ($flips),
       |probes AS (SELECT vec_id AS query_id, q AS pq, n2 AS pn2,
       |    xor(bucket, flip) AS probe
       |  FROM bucketed, flips WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT query_id, vec_id,
       |    ${cosMilliSql("pq", "q", "pn2", "n2")} AS cos_milli
       |  FROM bucketed JOIN probes ON bucket = probe AND vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_milli,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_milli DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_milli FROM ranked WHERE rank <= 5""".stripMargin
  }

  override def register(): Unit = {
    Queries.register(QueryDef("v1_knn_brute", knnBrute, Some(knnBruteOracle), bench = true))
    Queries.register(QueryDef("v2_ann_lsh", annLsh, Some(annLshOracle)))
    Queries.register(QueryDef("v3_ann_multiprobe", annMultiprobe, Some(annMultiprobeOracle)))
  }
}
