package graft

import org.scalatest.funsuite.AnyFunSuite

/** The composed LA build chain (la_build_pipeline): plan pins + the
  * cross-stage invariants no single-stage oracle can see. */
class BuildChainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val lines: Seq[String] = {
    import spark.implicits._
    Queries.queries("la_build_pipeline")(spark, TestSpark.sf)
      .as[String].collect().toSeq
  }

  test("chain produces a non-empty well-formed N-Triples set") {
    assert(lines.nonEmpty)
    assert(lines.forall(l => l.startsWith("<urn:graft:y") && l.endsWith(" .")))
    assert(lines.distinct.size == lines.size, "duplicate triples in export")
  }

  test("every merged entity exports exactly one type, name and timespan") {
    def subjects(pred: String): Seq[String] =
      lines.filter(_.contains(s"<urn:graft:$pred>")).map(_.takeWhile(_ != ' '))
    val types = subjects("type")
    assert(types.nonEmpty)
    assert(types.distinct.size == types.size, "entity with two type triples")
    assert(subjects("name").sorted == types.sorted)
    assert(subjects("timespan").sorted == types.sorted)
  }

  test("reidentify rewrote every member id onto an exported cluster") {
    // every identifier triple's subject must be an exported entity, and
    // the cluster id must be <= every member it absorbed (min-winner CC)
    val typeSubj = lines.filter(_.contains("<urn:graft:type>"))
      .map(_.takeWhile(_ != ' ')).toSet
    val idents = lines.filter(_.contains("<urn:graft:identifier>"))
    assert(idents.nonEmpty)
    idents.foreach { l =>
      val subj = l.takeWhile(_ != ' ')
      assert(typeSubj.contains(subj), s"orphan identifier triple: $l")
      val y = subj.stripPrefix("<urn:graft:y").stripSuffix(">").toLong
      val pk = l.split("\"")(1).stripPrefix("p").toLong
      assert(y <= pk, s"cluster id $y not the min member in: $l")
    }
  }

  test("final plan is join-shaped: no cartesian product, no window") {
    val p = Queries.queries("la_build_pipeline")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in chain plan:\n$p")
    assert(!p.contains("Window"), s"window exec in chain plan:\n$p")
  }
}
