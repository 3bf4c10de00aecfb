package graft

import org.apache.spark.sql.functions._

/** Round-12 pins: the near-dup pair-graph MV (build-once LSH pairs + CC
  * labels shared by C3/C12/C18), the E21 read-only IVF path, and the
  * ScopedCache abandonment TTL.
  */
class PairGraphMvSpec extends SparkSpec {

  test("pair-graph MV: labels artifact equals a fresh LSH+CC derivation") {
    import spark.implicits._
    val fromMv = llm.TextDedup.componentLabels(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = graft.ops.Graph.connectedComponents(
        llm.TextDedup.minhashLsh(spark, sfDir).select($"doc_a", $"doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromMv === fresh)
    assert(fromMv.nonEmpty, "pair graph is empty at this SF — pins are vacuous")
  }

  test("pair-graph MV: consumers are memoized reads; refresh re-publishes") {
    // first consumer (above test or this call) built the artifact
    llm.TextDedup.componentLabels(spark, sfDir).count()
    val root = new java.io.File(llm.TextDedup.pairGraphRoot(sfDir))
    assert(root.isDirectory, s"$root missing after componentLabels")
    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val cs = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        cs.flatMap(c => if (c.isDirectory) walk(c) else Seq(c))
      }
      walk(root).map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = snapshot()
    assert(before.nonEmpty)
    // a second consumer must READ, not rebuild: byte layout untouched
    llm.Curation.dupClusters(spark, sfDir).count()
    assert(snapshot() === before, "memoized consumer rewrote the artifact")
    // an explicit refresh must re-publish (new part files / mtimes)
    llm.TextDedup.refreshPairGraphMv(spark, sfDir)
    assert(snapshot() !== before, "refresh did not rewrite the artifact")
  }

  test("pair-graph MV append: incremental batch ingest equals a full rebuild") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val resident = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    // scratch corpora: the resident 80% as its own dataset dir (the MV is
    // keyed by dir), and the full corpus as the rebuild reference
    val baseDir = java.nio.file.Files.createTempDirectory("graft_pg_base").toString
    val fullDir = java.nio.file.Files.createTempDirectory("graft_pg_full").toString
    try {
      resident.write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
      docs.write.mode("overwrite").parquet(s"$fullDir/documents.parquet")
      llm.TextDedup.refreshPairGraphMv(spark, baseDir)
      // TWO appends, so cross-batch pairs (batch2 doc near-dupping a
      // batch1 doc, whose shingles are NOT in the corpus table) are
      // exercised — the single-append form silently missed them
      llm.TextDedup.appendPairGraphMv(spark, baseDir,
        batch.filter($"doc_id" % 10 === 0).select($"doc_id", $"text"))
      llm.TextDedup.appendPairGraphMv(spark, baseDir,
        batch.filter($"doc_id" % 10 =!= 0).select($"doc_id", $"text"))
      def labelMap(dir: String) = llm.TextDedup.componentLabels(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val incremental = labelMap(baseDir)
      val rebuilt = labelMap(fullDir)
      assert(incremental === rebuilt)
      // the pin must be binding: the batches actually contributed pairs,
      // including at least one CROSS-BATCH pair (both endpoints appended)
      val basePairs = llm.TextDedup.pairGraphPairs(spark, baseDir)
      assert(basePairs.filter($"doc_a" % 5 === 0 || $"doc_b" % 5 === 0).count() > 0,
        "no batch-side pairs at this SF — append test is vacuous")
      assert(basePairs.filter($"doc_a" % 5 === 0 && $"doc_b" % 5 === 0
          && ($"doc_a" % 10 === 0) =!= ($"doc_b" % 10 === 0)).count() > 0,
        "no cross-batch pairs at this SF — the second-append path is vacuous")
      // and the appended pair SET matches the full rebuild's
      val fullPairs = llm.TextDedup.pairGraphPairs(spark, fullDir)
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select($"doc_a", $"doc_b", $"n_common", $"n_a", $"n_b")
          .collect().map(_.toSeq).toSet
      assert(pairSet(basePairs) === pairSet(fullPairs))
    } finally {
      // the MV roots are on the shutdown hook; the scratch corpora are
      // not — delete them here or every run leaks two corpus copies
      graft.ops.ArtifactRoots.delete(baseDir)
      graft.ops.ArtifactRoots.delete(fullDir)
    }
  }

  test("pair-graph consumers never re-shingle: plans are artifact reads") {
    // the durable form of the round-12 fix: if a refactor silently
    // reconnects a consumer to the raw-text derivation, its physical
    // plan re-acquires the shingle generator / LSH stages — pin their
    // absence (the quality signal legitimately scans documents; it must
    // be the ONLY corpus-shaped work left in these plans)
    llm.TextDedup.componentLabels(spark, sfDir).count() // ensure built
    for (name <- Seq("cur_neardedup_best", "cur_leak_safe_split", "cur_dup_clusters")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("graft_shingles"), s"$name re-derives shingles")
      assert(!plan.toLowerCase.contains("1000000007"), s"$name re-runs minhash")
    }
  }

  test("cur_neardedup_mv (refresh + artifact read) equals cur_neardedup_best") {
    val mv = llm.Curation.nearDedupMv(spark, sfDir).collect().map(_.toSeq)
    val best = llm.Curation.nearDedupBest(spark, sfDir).collect().map(_.toSeq)
    assert(mv.toSeq === best.toSeq)
  }

  test("E21 emb_ivf_read equals the inline emb_ivf_topk on the same index recipe") {
    val read = llm.Embeddings.ivfReadTopK(spark, sfDir).collect().map(_.toSeq)
    val inline = llm.Embeddings.ivfTopK(spark, sfDir).collect().map(_.toSeq)
    assert(read.toSeq === inline.toSeq)
  }

  test("ScopedCache TTL: an abandoned untilResultConsumed scope frees its blocks") {
    import spark.implicits._
    spark.catalog.clearCache()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val cached = Seq(1L, 2L, 3L).toDF("v").cache()
    cached.count() // materialize the blocks
    val result = cached.agg(sum($"v").as("s"))
    graft.ops.ScopedCache.untilResultConsumed(cached, result)
    // result is NEVER executed — the abandonment TTL must release the
    // cache after AbandonAfterActions foreign actions complete
    assert((spark.sparkContext.getPersistentRDDs.keySet -- baseline).nonEmpty)
    for (_ <- 1 to graft.ops.ScopedCache.AbandonAfterActions)
      spark.range(1).count(): Unit
    // listener delivery is async on the listener bus — poll briefly
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    assert(leaked.isEmpty, s"abandoned scope still pins RDDs: $leaked")
  }
}
