package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** r17 optimization pin: the k-means / IVF / PQ assign argmin moved from
  * `element_at(array_sort(structs), 1)` to `array_min(structs)` (O(K),
  * no per-row sorted copy). Both resolve through the SAME element
  * ordering (the struct interpreted ordering), so the replacement must
  * be result-identical on every edge the assign can see: distance ties
  * (cid tiebreak), and NULL d2 fields (dimension-mismatched vectors —
  * the dot's null-on-mismatch contract). This spec pins that equality
  * directly on the expression pair, plus the escape-rendering swap
  * (regexp_replace → literal replace) on the N-Triples export path. */
class KmeansArgminSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("array_min(structs) == array_sort(structs)[1] incl. ties and null fields") {
    import spark.implicits._
    // (d2, cid) candidates per row: plain, tied d2, null d2 first/last
    val rows = Seq(
      Seq((Some(5L), 2L), (Some(3L), 7L), (Some(9L), 1L)),   // plain argmin
      Seq((Some(3L), 9L), (Some(3L), 2L), (Some(8L), 1L)),   // tie → min cid
      Seq((None: Option[Long], 4L), (Some(1L), 6L)),          // null d2 present
      Seq((None: Option[Long], 3L), (None: Option[Long], 1L)) // all null d2
    ).toDF("cand")
    val structs = transform($"cand", c =>
      struct(c.getField("_1").as("d2"), c.getField("_2").as("cid")))
    val got = rows.select(
      array_min(structs).as("via_min"),
      element_at(array_sort(structs), 1).as("via_sort")).collect()
    got.foreach { r => assert(r.get(0) === r.get(1), r.toString) }
  }

  test("literal replace == regexp_replace for the N-Triples escapes") {
    import spark.implicits._
    val names = Seq("""plain""", """a"quote""", """back\slash""",
      """both\"mixed\\""", """\""", "\"\"", "").toDF("name")
    val viaRegex = regexp_replace(
      regexp_replace($"name", "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val viaReplace = replace(replace($"name", lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\""))
    val got = names.select(viaReplace.as("a"), viaRegex.as("b")).collect()
    got.foreach { r => assert(r.getString(0) === r.getString(1), r.toString) }
  }
}
