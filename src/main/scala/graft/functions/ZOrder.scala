package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) encoding: interleave the low `bits` bits of two
  * key columns so that sorting by the single morton key clusters rows
  * that are close in BOTH dimensions. That is the layout trick behind
  * multi-dimensional data skipping: writers lay files out in morton
  * order, so every file's min/max footer bounds a small box in (a, b)
  * space and a predicate on EITHER column prunes files — a plain
  * lexicographic sort only ever prunes on its leading column.
  *
  * Pure bit arithmetic (shift/and/or), codegen-friendly, and exactly
  * reproducible in ANSI SQL — `mortonSql` emits the same expression
  * for the DuckDB oracle. */
object ZOrder {

  /** Morton code of the low `bits` bits of `a` and `b`; bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. */
  def mortonCol(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same encoding as a SQL expression over column names. */
  def mortonSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
