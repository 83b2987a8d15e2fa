package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage: map every output column of a DataFrame to the
  * set of SOURCE table columns it transitively derives from, by one
  * bottom-up pass over the analyzed logical plan. Provenance is the
  * governance question a training-data pipeline answers constantly —
  * "which raw fields fed this feature?" — and the analyzed plan
  * already knows; this just reads it out.
  *
  * Mechanics: leaf relations label their attributes `<source>.<col>`
  * (source = the file-relation's root directory name, e.g.
  * `lineitem.parquet` → `lineitem`); every Alias introduced by a
  * Project / Aggregate / Window / Generate node maps its new ExprId to
  * the union of its referenced attributes' lineage. Joins, filters,
  * sorts and set-ops pass attribute identity through untouched, so no
  * per-operator cases are needed for them. Conservative by design:
  * lineage covers DATA flow through expressions, not control flow
  * (a filter's predicate columns do not taint every output). */
object Lineage {

  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val resolved = scala.collection.mutable.Map.empty[ExprId, Set[String]]

    def sourceOf(leaf: LeafNode): String = leaf match {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          val name = h.location.rootPaths.headOption
            .map(_.getName).getOrElse("relation")
          name.replaceAll("\\.(parquet|json|csv|orc)$", "")
        case _ => "relation"
      }
      case other => other.nodeName.toLowerCase(java.util.Locale.ROOT)
    }

    def lineageOf(refs: Iterable[Attribute]): Set[String] =
      refs.flatMap(a => resolved.getOrElse(a.exprId, Set.empty[String])).toSet

    def record(ne: NamedExpression): Unit = ne match {
      case a: Alias =>
        resolved(a.exprId) = lineageOf(a.references.toSeq)
      case _ => // plain attribute: identity already resolved at its origin
    }

    def walk(p: LogicalPlan): Unit = p match {
      case leaf: LeafNode =>
        val src = sourceOf(leaf)
        leaf.output.foreach(a => resolved(a.exprId) = Set(s"$src.${a.name}"))
      case other =>
        other.children.foreach(walk)
        other match {
          case Project(exprs, _) => exprs.foreach(record)
          case a: Aggregate => a.aggregateExpressions.foreach(record)
          case w: Window => w.windowExpressions.foreach(record)
          case g: Generate =>
            val in = lineageOf(g.generator.references.toSeq)
            g.generatorOutput.foreach(a => resolved(a.exprId) = in)
          case e: Expand =>
            // grouping-set expansion: each output attr derives from the
            // union of the column at its position across projections
            e.output.zipWithIndex.foreach { case (a, i) =>
              resolved(a.exprId) = e.projections
                .flatMap(row => lineageOf(row(i).references.toSeq)).toSet
            }
          case _ => // pass-through operators keep attribute identity
        }
    }

    walk(df.queryExecution.analyzed)
    df.queryExecution.analyzed.output
      .map(a => a.name -> resolved.getOrElse(a.exprId, Set.empty[String]))
      .toMap
  }
}
