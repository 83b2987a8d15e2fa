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

  test("incremental update: output partitions into carried + recomputed") {
    import spark.implicits._
    val out = Queries.queries("la_incremental_update")(spark, TestSpark.sf)
      .select($"yuid", $"idents_csv").as[(Long, String)].collect()
    // result is a set keyed by yuid (carried and recomputed are disjoint)
    assert(out.map(_._1).distinct.length == out.length)
    // every delta part (pk % 10 == 0) appears exactly once in the output
    val allIdents = out.flatMap(_._2.split(","))
    assert(allIdents.distinct.length == allIdents.length)
    val deltaIdents = allIdents.filter(_.stripPrefix("p").toLong % 10 == 0)
    assert(deltaIdents.nonEmpty)
    // untouched day-0 clusters carry forward: some cluster has no delta pk
    assert(out.exists(r => !r._2.split(",").exists(_.stripPrefix("p").toLong % 10 == 0)))
  }

  test("incremental update plan: touched filters broadcast, no cartesian") {
    val p = Queries.queries("la_incremental_update")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
    assert(!p.contains("Window"), s"window exec in plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"touched-label set not broadcast:\n$p")
  }

  test("daily run: version advances exactly once per replay, idempotent state") {
    import spark.implicits._
    def run() = Queries.queries("la_daily_run")(spark, TestSpark.sf)
      .select($"yuid", $"n_members", $"idents_csv", $"v_advance")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    val first = run()
    val second = run() // a second daily replay of the same feed
    // each replay commits exactly one new manifest version...
    assert(first.forall(_._4 == 1L), "first run must advance the version by 1")
    assert(second.forall(_._4 == 1L), "replay must advance the version by 1")
    // ...and publishes the identical table state (the feed is the same)
    assert(first == second, "replayed daily run diverged from the first")
  }

  test("daily run: delete shadowing and last_harvest cut reach the table") {
    import spark.implicits._
    val idents = Queries.queries("la_daily_run")(spark, TestSpark.sf)
      .select($"idents_csv").as[String].collect()
      .flatMap(_.split(",")).map(_.stripPrefix("p").toLong)
    val delta = idents.filter(_ % 10 == 0)
    assert(delta.nonEmpty, "no harvested delta part reached the published table")
    // the same-day delete (pk % 40 == 0) shadows its update: never admitted
    assert(!delta.exists(_ % 40 == 0), "a deleted ident leaked into the table")
    // the last_harvest stream stop cuts everything at pk <= 40
    assert(!delta.exists(_ <= 40), "an older-than-last_harvest item was admitted")
    // non-delete, non-cut delta parts all arrived
    assert(delta.exists(pk => pk > 40 && pk % 40 != 0))
  }
}
