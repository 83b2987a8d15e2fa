package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties .explain audits
  * verified (pushdown, pruning, broadcast) must survive refactors. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def planOf(name: String): String =
    Queries.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("scan queries push filters into the parquet scan") {
    val p = planOf("s1_scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"missing pushdown:\n$p")
  }

  test("evolved dataset: merged schema reads old rows null, gen prunes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = SourceQueries.evolutionDir(spark, TestSpark.sf)
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.contains("price_cents"), "schema not merged")
    // old-generation rows surface the evolved column as null
    assert(df.filter($"gen" === 1 && $"price_cents".isNotNull).count() === 0L)
    // the generation partition column prunes: a gen=2 read never
    // touches generation-1 files (adding a column must not force a
    // rewrite or rescan of the old data)
    val plan = df.filter($"gen" === 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(gen"),
      s"no partition pruning:\n$plan")
    assert(!plan.contains("gen=1"), s"gen=1 files in scan:\n$plan")
  }

  test("scan queries prune columns (no full-width read)") {
    val p = planOf("s1_scan_pushdown")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_returnflag"), "pruned column still read")
  }

  test("dimension joins broadcast the small sides") {
    val p = planOf("q3_revenue_nation_year")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("snowflake rollup broadcasts the whole dim chain (q4)") {
    val p = planOf("q4_region_rollup")
    // customer, nation, region all broadcast; the fact side never
    // shuffles for a dim hop
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dim chain not fully broadcast:\n$p")
  }

  test("aggregations are partial (map-side combine before exchange)") {
    val p = planOf("q1_agg")
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange"))
  }

  test("geometry arbitration stays inside codegen (no UDF in the plan)") {
    val p = planOf("f10_geometry_merge")
    assert(!p.contains("UDF"), s"Scala UDF escaped codegen:\n$p")
  }

  test("bm25 corpus stats collapse to one broadcast row (no per-doc join)") {
    val p = planOf("q10_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"stats row not broadcast:\n$p")
    // the stats aggregate is partial (map-side) before the single-row exchange
    assert(p.contains("partial_count"), s"no map-side stats combine:\n$p")
  }

  test("decontamination joins the benchmark shingles as a broadcast semi-join") {
    val p = planOf("d7_decontaminate")
    assert(p.contains("LeftSemi"), s"no semi-join in plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
  }

  test("pii scrub plan is map-only (no exchange, no UDF)") {
    val p = planOf("t_pii_scrub")
    assert(!p.contains("Exchange"), s"scrub should not shuffle:\n$p")
    assert(!p.contains("UDF"), s"scrub should stay columnar:\n$p")
  }

  test("classifier scoring plan is map-only (no exchange, no UDF)") {
    val p = planOf("t_classifier_score")
    assert(!p.contains("Exchange"), s"scoring should not shuffle:\n$p")
    assert(!p.contains("UDF"), s"scoring should stay columnar:\n$p")
  }

  test("bpe pre-tokenizer covers every whitespace word (fertility >= 1000)") {
    import spark.implicits._
    val p = planOf("t_bpe_tokens")
    assert(!p.contains("Exchange"), s"tokenizing should not shuffle:\n$p")
    val rows = Queries.queries("t_bpe_tokens")(spark, TestSpark.sf)
      .select($"n_bpe", $"n_ws", $"fertility_milli")
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (bpe, ws, fert) =>
      // every non-space char is matched by some alternative, so a
      // whitespace word yields at least one regex token
      assert(bpe >= ws, s"bpe=$bpe < ws=$ws")
      assert(ws == 0 || fert >= 1000L)
    }
  }

  test("trained-IVF answers every probe with a full contiguous top-5") {
    import spark.implicits._
    val rows = Queries.queries("v7_ann_ivf_trained")(spark, TestSpark.sf)
      .select($"query_id", $"rank").as[(Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10, s"expected 10 probe queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to 5L), s"query $q ranks not 1..5")
    }
  }

  test("PQ search: full contiguous top-5 per probe, distances monotone") {
    import spark.implicits._
    val rows = Queries.queries("v8_pq_search")(spark, TestSpark.sf)
      .select($"query_id", $"rank", $"vec_id", $"approx_d2")
      .as[(Long, Long, Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10, s"expected 10 probe queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to 5L), s"query $q ranks not 1..5")
      // ADC distances non-decreasing with rank, self excluded
      assert(sorted.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
      assert(!rs.exists(_._3 == q), s"query $q returned itself")
    }
  }

  test("PQ rerank: exact-cosine order, recall@5 at least PQ's own") {
    import spark.implicits._
    val rows = Queries.queries("v10_pq_rerank")(spark, TestSpark.sf)
      .select($"query_id", $"rank", $"vec_id", $"cos_milli")
      .as[(Long, Long, Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10, s"expected 10 probe queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to 5L), s"query $q ranks not 1..5")
      // exact cosine non-increasing with rank, self excluded
      assert(sorted.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
      assert(!rs.exists(_._3 == q), s"query $q returned itself")
    }
    // re-ranking can only improve recall@5 against brute-force truth:
    // stage 2 re-orders PQ's top-20 by the same exact metric brute uses
    def top5(name: String): Map[Long, Set[Long]] =
      Queries.queries(name)(spark, TestSpark.sf)
        .select($"query_id", $"rank", $"vec_id")
        .as[(Long, Long, Long)].collect()
        .filter(_._2 <= 5).groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._3).toSet }
    val truth = top5("v1_knn_brute")
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    val rPq = recall(top5("v8_pq_search"))
    val rRerank = recall(top5("v10_pq_rerank"))
    assert(rRerank >= rPq,
      s"rerank recall $rRerank below raw PQ recall $rPq")
  }

  test("IVF-PQ: contiguous top-5 per probe, ADC distances monotone") {
    import spark.implicits._
    val rows = Queries.queries("v9_ivf_pq")(spark, TestSpark.sf)
      .select($"query_id", $"rank", $"vec_id", $"approx_d2")
      .as[(Long, Long, Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10, s"expected 10 probe queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to 5L), s"query $q ranks not 1..5")
      assert(sorted.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
      assert(!rs.exists(_._3 == q), s"query $q returned itself")
    }
  }

  test("IVF append: shard fully accounted, corpus cells untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Queries.queries("v11_ivf_append")(spark, TestSpark.sf)
      .select($"cid", $"n_corpus", $"n_added", $"add_inertia")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val shardN = emb.filter($"vec_id" % 10 === 9).count()
    val corpusN = emb.filter($"vec_id" % 10 =!= 9).count()
    // every arriving vector lands in exactly one frozen cell; the
    // corpus-side inverted lists are complete and unchanged
    assert(rows.map(_._3).sum == shardN, "shard vectors lost or duplicated")
    assert(rows.map(_._2).sum == corpusN, "corpus assignment incomplete")
    // a cell emptied by the Lloyd update may hold only arrivals, but a
    // row with neither members nor arrivals is a phantom
    assert(rows.forall(r => r._2 > 0 || r._3 > 0), "phantom cell")
    assert(rows.forall(r => r._4 >= 0 && (r._3 > 0 || r._4 == 0)))
  }

  test("as-of join compiles to a window scan, not a join product") {
    val p = planOf("j14_asof_join")
    assert(!p.contains("Join"), s"as-of must not materialize a join:\n$p")
    assert(p.contains("Window"))
  }

  test("range join buckets into an equi-join (no nested-loop product)") {
    val p = planOf("j15_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("Cartesian"),
      s"range join degenerated to a product:\n$p")
  }

  test("threshold sweep: 21-point grid with monotone confusion counts") {
    import spark.implicits._
    val rows = Queries.queries("t_threshold_sweep")(spark, TestSpark.sf)
      .select($"threshold", $"tp", $"fp", $"fn", $"recall_milli")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 21)
    assert(rows.map(_._1).toSeq == (-1000L to 1000L by 100L).toSeq)
    // raising the cutoff can only shrink the accepted set
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2, s"tp grew at ${hi._1}")
      assert(hi._3 <= lo._3, s"fp grew at ${hi._1}")
      assert(hi._4 >= lo._4, s"fn shrank at ${hi._1}")
      assert(hi._5 <= lo._5, s"recall grew at ${hi._1}")
    }
    // scores live in [-1000, 1000], so the lowest cutoff accepts all:
    // perfect recall (when any positives exist)
    val first = rows.head
    if (first._2 + first._4 > 0) assert(first._5 == 1000L)
  }

  test("unimax: capped languages get exactly C epochs, budget is respected") {
    import spark.implicits._
    val rows = Queries.queries("t_unimax")(spark, TestSpark.sf)
      .select($"lang", $"n_tokens", $"capped", $"alloc_tokens", $"epochs_milli")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._1)) // ascending size — allocation order
    assert(rows.nonEmpty)
    // the epoch cap binds exactly on capped rows (C = 1 epoch)
    rows.filter(_._3 == 1L).foreach { r =>
      assert(r._4 == r._2 && r._5 == 1000L, s"capped ${r._1} off-cap: $r")
    }
    // uncapped rows all get the same equal share, strictly under the cap
    val shares = rows.filter(_._3 == 0L).map(_._4).distinct
    assert(shares.length <= 1, s"unequal uncapped shares: $shares")
    rows.filter(_._3 == 0L).foreach { r =>
      assert(r._4 < r._2 && r._5 < 1000L, s"uncapped ${r._1} at/over cap: $r")
    }
    // cappedness is a PREFIX of the ascending-size order (the closed
    // form's monotonicity claim)
    val flags = rows.map(_._3)
    assert(flags.sameElements(flags.sorted.reverse), s"capped not a prefix: ${flags.toSeq}")
    // total allocation never exceeds the budget (3/4 of corpus tokens)
    val budget = rows.map(_._2).sum * 3 / 4
    assert(rows.map(_._4).sum <= budget)
  }

  test("dsir: threshold selection meets quota and recovers the target slice") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Queries.queries("t_dsir_select")(spark, TestSpark.sf)
      .select($"doc_id", $"score_milli", $"selected")
      .as[(Long, Long, Long)].collect()
    val n = rows.length
    val sel = rows.filter(_._3 == 1L)
    // the descending-cumulative cutoff admits at least ceil(n/4) docs
    // (ties at the cutoff may push it over — that's the documented slack)
    assert(sel.length >= (n + 3) / 4, s"quota missed: ${sel.length} of $n")
    // selection is a pure score threshold: no unselected doc outscores
    // a selected one
    if (sel.nonEmpty && sel.length < n) {
      val minSel = sel.map(_._2).min
      val maxUnsel = rows.filter(_._3 == 0L).map(_._2).max
      assert(maxUnsel < minSel, s"threshold violated: $maxUnsel >= $minSel")
    }
    // importance weighting recovers the target: the selected set is at
    // least as target-heavy as the corpus
    val en = Tables.load(spark, TestSpark.sf, "documents")
      .filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    val corpusFrac = en.size.toDouble / n
    val selFrac = sel.count(r => en(r._1)).toDouble / sel.length
    assert(selFrac >= corpusFrac,
      f"selected en fraction $selFrac%.3f below corpus $corpusFrac%.3f")
  }

  test("CMS estimates never undercount, and sketch state stays bounded") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Queries.queries("t_cms_counts")(spark, TestSpark.sf)
      .select($"token", $"exact_n", $"cms_n")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS undercounted '$tok': $est < $exact")
    }
    // the sketch is a fixed grid — corpus- and vocabulary-independent
    val toks = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(TextQueries.tokensCol(lower($"text"))).as("tok"))
      .select($"tok", TextQueries.wordHash($"tok").as("h"))
    val nCells = toks.select(explode(array((0 until TextQueries.CmsD).map(j =>
        struct(lit(j).as("row"),
          pmod(pmod(lit(functions.VecMath.aj(56 + j)) * $"h" +
            lit(functions.VecMath.bj(56 + j)), lit(TextQueries.HashP)),
            lit(TextQueries.CmsW)).as("bucket"))): _*)).as("c"))
      .select($"c.row", $"c.bucket").distinct().count()
    assert(nCells <= TextQueries.CmsD * TextQueries.CmsW)
  }

  test("deterministic HLL registers match a plain-Scala reimplementation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val P = TextQueries.HashP
    val m = TextQueries.HllM
    val (a, b) = (functions.VecMath.aj(60), functions.VecMath.bj(60))
    def wordHash(word: String): Long =
      word.foldLeft(0L)((acc, c) => (acc * TextQueries.WordB + c.toLong) % P)
    val bySource = Tables.load(spark, TestSpark.sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1)
    val want = bySource.map { case (src, docs) =>
      val regs = scala.collection.mutable.Map.empty[Long, Long]
      docs.flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .foreach { tok =>
          val h2 = (a * wordHash(tok) + b) % P
          val w = h2 / m
          val rho = if (w == 0) 26L else 26L - java.lang.Long.toBinaryString(w).length
          val reg = h2 % m
          regs(reg) = math.max(regs.getOrElse(reg, 0L), rho)
        }
      val s = regs.values.map(mj => 1.0 / math.pow(2.0, mj.toDouble)).sum +
        (m - regs.size).toDouble
      src -> (regs.values.sum,
        math.floor(1000.0 * 0.709 * (m * m).toDouble / s).toLong)
    }
    val got = Queries.queries("t_hll_counts")(spark, TestSpark.sf)
      .select($"source", $"reg_digest", $"hll_est_milli")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want)
    // this corpus' ~31-token vocab sits in the small-range regime where
    // the raw estimator reads high by design (linear counting is the
    // production correction; its ln() is not last-ulp-pinned across
    // engines, so the oracle-checked surface stays raw) — the estimate
    // must still be a bounded overcount, never an undercount
    val exact = Queries.queries("t_hll_counts")(spark, TestSpark.sf)
      .select($"source", $"exact_distinct").as[(String, Long)].collect().toMap
    got.foreach { case (src, (_, estMilli)) =>
      assert(estMilli >= exact(src) * 1000L, s"$src: HLL undercounts")
      assert(estMilli <= exact(src) * 3000L, s"$src: HLL bias unbounded")
    }
  }

  test("stratified sample plan is map-only (no exchange)") {
    val p = planOf("t_stratified_sample")
    assert(!p.contains("Exchange"), s"sampling should not shuffle:\n$p")
  }

  test("dedup clusters: survivors are cluster minima and cover all docs") {
    import spark.implicits._
    val rows = Queries.queries("d6_dedup_clusters")(spark, TestSpark.sf)
      .as[(Long, Long, Boolean)].collect()
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.map(_._1).min == c, s"cluster $c canonical is not the min id")
      assert(ms.count(_._3) == 1, s"cluster $c must keep exactly one doc")
      assert(ms.find(_._3).get._1 == c)
    }
    val n = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(rows.length == n, "every document must receive a cluster decision")
  }

  test("similar-full compiles to hash joins only (no cartesian product)") {
    val p = planOf("q9b_similar_full")
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"NLJ in plan:\n$p")
  }

  test("reconcile fixpoint rounds stay join-shaped (no cartesian)") {
    val p = planOf("j6_reconcile_fixpoint")
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
  }

  test("jsonl roundtrip anti-joins the existing ids (skip-existing)") {
    val p = planOf("k1_jsonl_roundtrip")
    assert(p.contains("LeftAnti"), s"skip-existing not an anti-join:\n$p")
  }

  test("ngram LM: train docs score pure-trigram, scores stay in [0,1000]") {
    import spark.implicits._
    val rows = Queries.queries("t_ngram_lm")(spark, TestSpark.sf)
      .select($"doc_id", $"n_pos", $"n_tri_hits", $"n_big_hits", $"lm_milli")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nPos, h3, h2, lm) =>
      assert(h3 + h2 <= nPos, s"doc $id: hits exceed positions")
      assert(lm >= 0L && lm <= 1000L, s"doc $id: score $lm out of range")
      // every trigram of a TRAIN doc is in the trigram table by
      // construction, so train docs hit the top backoff level everywhere
      if (id % 10 != 0) assert(h3 == nPos, s"train doc $id missed a trigram")
    }
    // held-out docs exercise the backoff: at least one validation doc
    // falls through to a lower order (else the split is degenerate)
    assert(rows.exists { case (id, nPos, h3, _, _) =>
      id % 10 == 0 && nPos > 0 && h3 < nPos })
  }

  test("hard negatives: ranked per probe, cross-label, semi-hard in band") {
    import spark.implicits._
    val rows = Queries.queries("v12_hard_negatives")(spark, TestSpark.sf)
      .select($"query_id", $"rank", $"vec_id", $"label", $"cos_milli",
        $"pos_milli", $"margin_milli", $"semi_hard")
      .as[(Long, Long, Long, Int, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val probeLabel = Tables.load(spark, TestSpark.sf, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to g.length.toLong))
      // descending cosine within the probe's list
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._5 >= b._5; case _ => true })
      g.foreach { r =>
        assert(r._4 != probeLabel(qid), s"negative shares probe $qid's label")
        assert(r._7 == r._6 - r._5, "margin mismatch")
        if (r._8 == 1L)
          assert(r._7 > 0L && r._7 <= 100L, s"semi-hard out of band: $r")
      }
    }
  }

  test("source overlap: full upper-triangle matrix with bounded measures") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Queries.queries("t_source_overlap")(spark, TestSpark.sf)
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"n_shared",
        $"containment_milli", $"jaccard_milli")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    val k = Tables.load(spark, TestSpark.sf, "documents")
      .filter(size(TextQueries.tokensCol($"text")) >= 3)
      .select($"source").distinct().count()
    assert(rows.length == k * (k - 1) / 2, s"not a full upper triangle")
    rows.foreach { case (a, b, na, nb, sh, cont, jac) =>
      assert(a < b, "pair not ordered")
      assert(sh <= math.min(na, nb), s"$a/$b share more than the smaller set")
      assert(cont >= jac, s"$a/$b containment below jaccard")
      assert(cont >= 0L && cont <= 1000L && jac >= 0L && jac <= 1000L)
    }
  }

  test("pagerank: every graph node ranked, mass bounded by the damping") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Queries.queries("g3_pagerank")(spark, TestSpark.sf)
      .select($"node", $"rank_milli", $"degree")
      .as[(Long, Long, Long)].collect()
    val nNodes = Tables.load(spark, TestSpark.sf, "lineitem")
      .filter($"l_orderkey" % 50 === 0)
      .select(explode(array($"l_partkey", $"l_suppkey" + 1000000L)).as("n"))
      .distinct().count()
    assert(rows.length == nNodes, "ranked node set differs from the graph")
    rows.foreach { case (n, r, d) =>
      assert(r >= 150L, s"node $n below the teleport floor")
      assert(d >= 1L)
    }
    // per-iteration mass: floor division only sheds mass, so the total
    // stays within [teleport floor, uniform-start total]
    val total = rows.map(_._2).sum
    assert(total >= 150L * nNodes && total <= 1000L * nNodes,
      s"rank mass $total outside [${150 * nNodes}, ${1000 * nNodes}]")
    // the damping mixes: ranks are not stuck at the uniform start
    assert(rows.map(_._2).distinct.length > 1, "degenerate uniform ranks")
  }

  test("substrate eviction unpersists and the cache rebuilds lazily") {
    val (e1, _) = LuxQueries.substrate(spark, TestSpark.sf)
    val (e2, _) = LuxQueries.substrate(spark, TestSpark.sf)
    assert(e1 eq e2) // cached: same persisted instance
    LuxQueries.evictSubstrate(spark)
    assert(e1.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val (e3, _) = LuxQueries.substrate(spark, TestSpark.sf)
    assert(!(e3 eq e1)) // rebuilt fresh after eviction
    LuxQueries.evictSubstrate(spark) // leave the session clean
  }

  test("salted join shuffles on (key, salt), no broadcast short-circuit") {
    val p = planOf("j16_salted_join")
    assert(p.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"broadcast defeated the salt:\n$p")
    // the join keys must include the salt column on both sides
    val joinLine = p.linesIterator.find(_.contains("ShuffledHashJoin")).get
    assert(joinLine.contains("salt"), s"salt not in join keys: $joinLine")
  }
}
