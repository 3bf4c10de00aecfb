package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Round-11 contracts: the weighted backbone MV (G8 reads the artifact
  * instead of re-deriving), the G9 derive-once pipeline (backbone
  * projection runs exactly once for three kernels), and the bipartite-
  * projection degree cap (the last unguarded quadratic stage — hot
  * customers are bounded, the default cap is row-identical at test SFs,
  * and the effect of a BINDING cap on the top-decile backbone is
  * quantified and pinned, not assumed away).
  */
class Round11Spec extends SparkSpec {

  test("G8 weighted MV: sssp over the MV artifact equals the fresh derivation") {
    import spark.implicits._
    val fresh = Graph.sssp(spark, sfDir).collect().toSeq
    Graph.backboneMaterialize(spark, sfDir).count()
    Graph.useMaterializedBackbone(Graph.backboneRoot(sfDir))
    try {
      assert(Graph.sssp(spark, sfDir).collect().toSeq === fresh)
      // the weighted read in MV mode scans the artifact, never the base
      // tables — the (u, v, shared) columns come from parquet
      val plan = Graph.backboneWeighted(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("graft_backbone_mv_"), plan.take(800))
      assert(!plan.contains("lineitem"), plan.take(800))
    } finally Graph.clearMaterializedBackbone()
  }

  test("G9 pipeline: backbone derived once, kernels run off the artifact, stages agree with standalone kernels") {
    import spark.implicits._
    val before = graft.ops.ScopedCache.scopesOpened
    val (mv, tri, lpa, dist) = Graph.graphPipelineParts(spark, sfDir)
    val opened = graft.ops.ScopedCache.scopesOpened - before
    // one weighted derivation = exactly 2 scopes (w, edges — the wedge
    // generator streams pairs without caching them); a kernel
    // re-deriving the projection would open 2 more
    assert(opened === 2, s"pipeline opened $opened cache scopes, expected 2")
    for ((df, nm) <- Seq((tri, "triangles"), (lpa, "labelprop"), (dist, "sssp"))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("lineitem") && !plan.contains("orders"),
        s"$nm kernel re-derives from base tables:\n${plan.take(800)}")
    }
    // stage summaries recompute from the standalone (derive-mode) kernels
    val rows = Graph.graphPipeline(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Set("backbone", "triangles", "labelprop", "sssp"))
    assert(rows("backbone")._1 === mv.count())
    val triStandalone = Graph.triangles(spark, sfDir)
      .agg(sum($"n_tri"), sum(when($"n_tri" > 0, 1L).otherwise(0L))).head()
    assert(rows("triangles") === ((triStandalone.getLong(0), triStandalone.getLong(1))))
    val lpaStandalone = Graph.labelProp(spark, sfDir)
      .agg(count(lit(1)), max($"n_nodes")).head()
    assert(rows("labelprop") === ((lpaStandalone.getLong(0), lpaStandalone.getLong(1))))
  }

  test("degree cap: the default cap is row-identical to uncapped at test SFs") {
    import spark.implicits._
    // consume one scoped-cached instance before constructing the next
    // (the ScopedCache one-live-instance-per-plan constraint)
    val capped = Graph.deriveBackboneWeighted(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val uncapped = Graph.deriveBackboneWeighted(spark, sfDir, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(capped === uncapped)
    assert(capped.nonEmpty)
  }

  test("degree cap: a hub customer's wedge pairs are bounded by cap², not degree²") {
    import spark.implicits._
    def wedgeCount(nSup: Int, cap: Int): Long = {
      val pairs = spark.range(nSup).select(lit(1L).as("c"), $"id".as("s"))
      Graph.wedgePairs(pairs, cap).count()
    }
    // uncapped: quadratic in hub degree
    assert(wedgeCount(400, Int.MaxValue) === 400L * 399 / 2)
    // capped: flat at cap*(cap-1)/2 no matter how large the hub grows —
    // the projection stage can no longer go quadratic on one key
    assert(wedgeCount(400, 64) === 64L * 63 / 2)
    assert(wedgeCount(1600, 64) === 64L * 63 / 2)
    // the cap keeps the hub's LOWEST supplier ids — deterministic
    val kept = Graph.wedgePairs(
        spark.range(100).select(lit(1L).as("c"), $"id".as("s")), 10)
      .select(explode(array($"u", $"v")).as("s"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === (0L until 10L))
  }

  test("substring cut removes exactly the flagged spans on a hand-built corpus") {
    import spark.implicits._
    // doc 1 and doc 2 share the 8-token run "a b c d e f g h"; everything
    // else is unique, so coverage is [0,7] in doc 1 and [3,10] in doc 2
    val docs = Seq(
      (1L, "a b c d e f g h x y z"),
      (2L, "p q r a b c d e f g h"),
      (3L, "totally unrelated text with no duplicated window at all ok"))
      .toDF("doc_id", "text")
    val got = graft.llm.TextDedup.substringCutFrom(spark, docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 3 has no flagged window → not emitted (byte-identical to input)
    assert(got.keySet === Set(1L, 2L))
    val md5of = (s: String) =>
      Seq(s).toDF("x").select(md5($"x")).head().getString(0)
    assert(got(1L) === ((11L, 8L, 3L, md5of("x y z"))))
    assert(got(2L) === ((11L, 8L, 3L, md5of("p q r"))))
    // a FULLY covered doc emits md5 of the empty string
    val twin = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val full = graft.llm.TextDedup.substringCutFrom(spark, twin).collect()
    assert(full.forall(r => r.getLong(2) === 8L && r.getString(4) === md5of("")))
  }

  test("substring cut reconciles with the L7 coverage accounting per source") {
    import spark.implicits._
    // the cut removes exactly the positions the L7 sweep counts: per
    // source, Σ cut_tokens == L7 dup_tokens (two independent
    // implementations of coverage — interval-merge+filter vs running-max
    // sweep)
    val perSource = graft.llm.TextDedup.substringCut(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source").agg(sum($"cut_tokens").as("cut"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val l7 = graft.llm.TextDedup.substringDup(spark, sfDir)
      .select($"source", $"dup_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(l7.nonEmpty && l7.values.sum > 0, "fixture has no duplicated spans")
    for ((src, dup) <- l7) assert(perSource.getOrElse(src, 0L) === dup,
      s"source $src: cut=${perSource.getOrElse(src, 0L)} != L7 dup_tokens=$dup")
  }

  test("degree cap: quantified top-decile backbone stability under a BINDING cap (sf0.01)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    // sf0.01 degree distribution: max 67, median 33. A cap in the upper
    // tail (50 ≈ 0.75×max) binds on a minority of customers and keeps
    // ≥85% of the top-decile backbone (measured 0.878 recall / 0.805
    // precision); a cap at the MEDIAN binds on half the corpus and
    // keeps <50% — the cap is a tail-safety bound for pathological
    // hubs, NOT a quality-neutral sparsifier, so deployments set it
    // above the expected degree distribution (e.g. p99.9 × margin).
    val full = Graph.deriveBackboneWeighted(spark, dir, Int.MaxValue)
      .select($"u", $"v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Graph.deriveBackboneWeighted(spark, dir, 50)
      .select($"u", $"v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inter = (full & capped).size.toDouble
    assert(inter / full.size >= 0.85, f"recall ${inter / full.size}%.3f < 0.85")
    assert(inter / capped.size >= 0.75, f"precision ${inter / capped.size}%.3f < 0.75")
  }

  test("C19 funnel: every stage binds on a hand-built corpus; 3 cache scopes") {
    import spark.implicits._
    // one benchmark doc (src0), then a corpus exercising every drop rule:
    // d1 too short, d2 repetitious bigrams, d3 stopword-heavy, d4=d5 exact
    // duplicates (dedup keeps one), d6 contains the benchmark 8-gram
    // (decontaminated away), d7 clean survivor
    val dup = "cat dog bird fish lion tiger bear wolf fox deer owl bat ant bee elk"
    val docs = Seq(
      (10L, "src0", "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "src1", "tiny doc only"),
      (2L, "src1", "x y x y x y x y x y x y x y x y"),
      (3L, "src1", "the w1 the w2 the w3 the w4 the w5 the w6 the w7 the w8"),
      (4L, "src1", dup),
      (5L, "src1", dup),
      (6L, "src1", "alpha beta gamma delta epsilon zeta eta theta m1 m2 m3 m4 m5 m6 m7"),
      (7L, "src1", "red green blue yellow purple orange pink brown black white gray cyan lime navy teal"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length($"text"))
    val before = graft.ops.ScopedCache.scopesOpened
    val out = graft.llm.Curation.curationPipelineFrom(docs)
    assert(graft.ops.ScopedCache.scopesOpened - before === 3,
      "funnel construction must open exactly 3 cache scopes (signals, survivors, clean)")
    val m = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a_raw") === 7L)       // src0 excluded from the corpus
    assert(m("b_filter") === 4L)    // d1/d2/d3 dropped, three distinct rules
    assert(m("c_dedup") === 3L)     // d4=d5 collapsed
    assert(m("d_decontam") === 2L)  // d6 contaminated
    assert(m("e_train") + m("f_val") + m("g_test") === m("d_decontam"))
  }

  test("C19 funnel: monotone retention and exact split partition at sfDir") {
    import spark.implicits._
    val rows = graft.llm.Curation.curationPipeline(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m = rows.map(t => t._1 -> t._2).toMap
    val toks = rows.map(t => t._1 -> t._3).toMap
    assert(m("a_raw") >= m("b_filter") && m("b_filter") >= m("c_dedup")
      && m("c_dedup") >= m("d_decontam"))
    assert(m("b_filter") < m("a_raw"), "quality filter must bind on the fixture corpus")
    assert(m("e_train") + m("f_val") + m("g_test") === m("d_decontam"))
    assert(toks("e_train") + toks("f_val") + toks("g_test") === toks("d_decontam"))
    // token retention moves with doc retention at every stage
    assert(toks("a_raw") >= toks("b_filter") && toks("b_filter") >= toks("c_dedup")
      && toks("c_dedup") >= toks("d_decontam"))
  }

  test("T17/T18: NB confusion partitions the held-out docs; AUC separates the rule") {
    import spark.implicits._
    val conf = graft.llm.TextAnalysis.nbClassify(spark, sfDir).collect()
    val langs = graft.Tables.documents(spark, sfDir)
      .select($"lang").distinct().as[String].collect().toSet
    assert(conf.map(_.getLong(2)).sum ===
      graft.Tables.documents(spark, sfDir).filter($"doc_id" % 5 >= 4).count())
    assert(conf.forall(r => langs(r.getString(0)) && langs(r.getString(1))))
    val auc = graft.llm.TextAnalysis.aucQuality(spark, sfDir).collect().head
    assert(auc.getLong(0) > 0 && auc.getLong(1) > 0, auc.toString)
    val a = auc.getDouble(2)
    // the quality score shares signals with the keep rule, so it must
    // rank keepers above droppers far better than chance
    assert(a > 0.7 && a <= 1.0, s"auc=$a")
  }

  test("E18 NSW beam search: sound ranks, effective sims, honest recall floor") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    val nsw = graft.llm.Embeddings.nswTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = graft.llm.Embeddings.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val qids = exact.map(_._1).distinct.sorted
    assert(nsw.map(_._1).distinct.sorted === qids)
    qids.foreach { q =>
      val rows = nsw.filter(_._1 == q).sortBy(_._2)
      assert(rows.map(_._2).toSeq === Seq(1, 2, 3))
      assert(rows.sliding(2).forall(p => p.head._4 >= p.last._4))
      assert(rows.forall(_._3 >= 5)) // corpus ids only, never a query id
    }
    // effectiveness: each query's best found sim within 75% of the exact
    // best (measured 0.81–1.0 at this SF; random pairs average ~0)
    val exBest = exact.filter(_._2 == 1).map(r => r._1 -> r._4).toMap
    qids.foreach { q =>
      assert(exBest(q) > 0)
      val nb = nsw.filter(_._1 == q).map(_._4).max
      assert(nb >= 0.75 * exBest(q), s"q=$q nsw=$nb exact=${exBest(q)}")
    }
    // honest recall floor vs the exact top-3 (measured 6/15; LSH-seeded
    // degree-10 graph on structureless random vectors — the documented
    // recall ceiling, far above the ~0.6% random-chance rate)
    val ex3 = exact.filter(_._2 <= 3).map(r => (r._1, r._3)).toSet
    val hits = nsw.map(r => (r._1, r._3)).count(ex3)
    assert(hits >= 4, s"recall@3 = $hits/${ex3.size}")
  }

  test("C20 budget cut equals the brute-force quality-greedy prefix") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    // independent oracle: global sort by (quality desc, doc_id asc),
    // admit while the running token sum fits half the corpus
    val per = graft.Tables.documents(spark, sfDir)
      .withColumn("toks", split($"text", " "))
      .withColumn("n_tok", size($"toks").cast("long"))
      .withColumn("n_stop", size(filter($"toks", t => t === "the" || t === "a")))
      .withColumn("n_alpha", length(regexp_replace($"text", "[^a-z]", "")))
      .withColumn("quality", graft.llm.TextAnalysis.qualityFormula(
        $"n_stop", $"n_tok", $"n_alpha", $"n_chars"))
      .select($"doc_id", $"source", $"n_tok", $"quality")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val budget = per.map(_._3).sum / 2
    var cum = 0L
    val kept = per.sortBy(t => (-t._4, t._1)).takeWhile { t =>
      cum += t._3; cum <= budget
    }
    val expect = kept.groupBy(_._2).map { case (src, ds) =>
      (src, ds.length.toLong, ds.map(_._3).sum) }.toSeq.sortBy(_._1)
    val got = graft.llm.Curation.budgetCut(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    assert(got.map(_._3).sum <= budget)
  }

  test("T20 winnowing: shared passages pair, disjoint docs never do") {
    import spark.implicits._
    // a 20-token passage shared verbatim between docs 1 and 2, embedded in
    // unrelated contexts; docs 3/4 share nothing with anyone (disjoint
    // vocabularies, so no accidental shared 4-gram)
    val run = (1 to 20).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $run eta theta iota"),
      (2L, s"uno dos tres cuatro cinco seis $run siete ocho nueve"),
      (3L, "red orange yellow green blue indigo violet umber ochre teal"),
      (4L, "lion tiger bear wolf fox otter lynx seal hare mole")
    ).toDF("doc_id", "text")
    val pairs = graft.llm.TextAnalysis.winnowPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the winnowing guarantee (k=4, w=4): a shared run of >= 7 tokens
    // shares >= 1 selected fingerprint; 20 tokens span 13 windows so the
    // >= 2 reporting threshold is comfortably met — and ONLY for (1,2)
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)), pairs.toSeq)
    assert(pairs.head._3 >= 2)
    // no self-pairs, canonical orientation
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("C21 temperature mix: sqrt-boost on a skewed corpus, identity on the uniform one") {
    import spark.implicits._
    // skewed hand corpus: 64-doc "big" vs 4-doc "small" source
    val docs = ((1 to 64).map(i => (i.toLong, "big", 10L)) ++
      (65 to 68).map(i => (i.toLong, "small", 10L)))
      .toDF("doc_id", "source", "n_chars")
    val got = graft.llm.Curation.tempMixOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bysrc = got.map(t => t._1 -> t).toMap
    // exact weight math: w = floor(sqrt(n)*1e6), W = 1e7, N = 68
    assert(bysrc("big")._3 === 800000L && bysrc("small")._3 === 200000L)
    // independent replay of the residue materialization with JDK md5:
    // t_big = 54 (downsample), t_small = 13 (3 whole epochs + remainder 1)
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t42:$id".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val expBig = (1 to 64).map(i => 0L + (if (h(i) % 64 < 54 % 64) 1L else 0L)).sum
    val expSmall = (65 to 68).map(i => 3L + (if (h(i) % 4 < 13 % 4) 1L else 0L)).sum
    assert(bysrc("big")._4 === expBig, got.toSeq)
    assert(bysrc("small")._4 === expSmall, got.toSeq)
    // alpha < 1 boosts the rare source and shrinks the dominant one
    assert(bysrc("small")._4.toDouble / 4 > 1.0)
    assert(bysrc("big")._4.toDouble / 64 < 1.0)
    // the driver corpus is source-uniform: temperature mix must be the
    // identity there UP TO the documented ppm-floor rounding — weight_ppm
    // = floor(w/W * 1e6) loses at most 1 ppm per source, so |out − in|
    // ≤ 1 regardless of whether the source count divides 1e6 (exact
    // equality only holds when it does, which a corpus change could break
    // spuriously)
    val real = graft.llm.Curation.tempMix(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(math.abs(r.getLong(1) - r.getLong(3)) <= 1L, r.toString))
  }
}
