package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5: the geonames-style TSV loader — re-expression of
  * `pipeline/sources/general/geonames/loader.py:31-78`: the
  * allCountries.txt tab-separated dump plus the hierarchy.txt
  * child→parent table become Place records with
  *
  *   - a primary name (column 2) and alternate names (column 4,
  *     comma-separated) minus any equal to the primary (`:64-67`);
  *   - `POINT ( lng lat )` geometry when both coordinates are present
  *     (`:68-69`, the reference's exact spacing);
  *   - a part_of parent from the hierarchy map (`:39-43`, `:70-71`);
  *   - identifiers namespaced from the numeric id.
  *
  * Spark shape: the TSV reads with an explicit schema (header-less,
  * tab-separated — predicate pushdown and column pruning apply), the
  * hierarchy is a broadcast left join, and the record build is pure
  * column expressions — the reference's 12M-row Python loop
  * (`:44-78`, with its own throughput ETA printouts) becomes one
  * map-stage scan. */
object Geonames {

  import org.apache.spark.sql.types._

  /** The leading columns of allCountries.txt (loader.py:10-29). */
  val schema: StructType = StructType(Seq(
    StructField("gnid", LongType),
    StructField("name", StringType),
    StructField("asciiname", StringType),
    StructField("alternatenames", StringType),
    StructField("latitude", StringType),
    StructField("longitude", StringType)))

  val hierarchySchema: StructType = StructType(Seq(
    StructField("parent", LongType),
    StructField("child", LongType),
    StructField("htype", StringType)))

  /** Load the dump + hierarchy into Place rows:
    * (ident, primary, alt_names, wkt, parent_ident). */
  def load(spark: SparkSession, allCountries: String, hierarchy: String,
      namespace: String): DataFrame = {
    import spark.implicits._
    val places = spark.read.option("sep", "\t").schema(schema).csv(allCountries)
    val parents = spark.read.option("sep", "\t").schema(hierarchySchema)
      .csv(hierarchy)
      .select($"child", $"parent")
    places
      .join(broadcast(parents), places("gnid") === parents("child"), "left")
      .select(
        concat(lit(namespace), $"gnid").as("ident"),
        $"name".as("primary"),
        // alternates minus the primary (loader.py:64-67)
        filter(split(coalesce($"alternatenames", lit("")), ","),
          a => a =!= $"name" && a =!= "").as("alt_names"),
        // the reference's exact WKT spacing (loader.py:68-69)
        when($"latitude".isNotNull && $"latitude" =!= "" &&
             $"longitude".isNotNull && $"longitude" =!= "",
          concat(lit("POINT ( "), $"longitude", lit(" "), $"latitude", lit(" )")))
          .as("wkt"),
        when($"parent".isNotNull, concat(lit(namespace), $"parent"))
          .as("parent_ident"))
  }
}
