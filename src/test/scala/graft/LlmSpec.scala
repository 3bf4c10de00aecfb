package graft

import org.apache.spark.sql.functions._
import graft.llm.{Embeddings, Multimodal, TextAnalysis, TextDedup}

/** LLM-pipeline operators: invariants that must hold on any corpus,
  * checked on sf0.001.
  */
class LlmSpec extends SparkSpec {

  test("exact dedup: n_docs = n_unique + n_dupes per source") {
    import spark.implicits._
    val bad = TextDedup.exactDedup(spark, sfDir)
      .filter($"n_docs" =!= $"n_unique" + $"n_dupes")
    assert(bad.isEmpty)
  }

  test("exact dedup agrees with an independent distinct-count") {
    import spark.implicits._
    val got = TextDedup.exactDedup(spark, sfDir)
      .agg(sum($"n_unique")).head.getLong(0)
    val expected = Tables.documents(spark, sfDir)
      .groupBy($"source").agg(countDistinct($"text").as("u"))
      .agg(sum($"u")).head.getLong(0)
    assert(got === expected)
  }

  test("ngram Jaccard pairs are ordered, thresholded, and symmetric-free") {
    import spark.implicits._
    val pairs = TextDedup.ngramJaccard(spark, sfDir).cache()
    assert(pairs.filter($"doc_a" >= $"doc_b").isEmpty)
    assert(pairs.filter($"jaccard" < 0.8 || $"jaccard" > 1.0).isEmpty)
    // n_common never exceeds either side's shingle count
    assert(pairs.filter($"n_common" > least($"n_a", $"n_b")).isEmpty)
    pairs.unpersist()
  }

  test("minhash LSH finds every identical-text pair (j=1 ⇒ all bands collide)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // identical-text pairs with >= 3 tokens (shingle precondition)
    val dupPairs = docs.as("x").join(docs.as("y"),
        $"x.text" === $"y.text" && $"x.doc_id" < $"y.doc_id"
          && size(split($"x.text", " ")) >= 3)
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
    val found = TextDedup.minhashLsh(spark, sfDir).select("doc_a", "doc_b")
    assert(dupPairs.exceptAll(found).isEmpty, "an identical pair was missed")
  }

  test("simhash: identical docs have Hamming distance 0") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dupPairs = docs.as("x").join(docs.as("y"),
        $"x.text" === $"y.text" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
    val zero = TextDedup.simhash(spark, sfDir).filter($"hamming" === 0)
      .select("doc_a", "doc_b")
    assert(dupPairs.exceptAll(zero).isEmpty)
  }

  test("cosine top-k: ranks dense 1..5, sims within [-1,1] and non-increasing") {
    import spark.implicits._
    val tk = Embeddings.cosineTopK(spark, sfDir).cache()
    assert(tk.count() === 25) // 5 queries × k=5
    assert(tk.filter($"sim" < -1.0 || $"sim" > 1.0).isEmpty)
    val monotone = tk
      .withColumn("prev", lag($"sim", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"rnk")))
      .filter($"prev".isNotNull && $"prev" < $"sim")
    assert(monotone.isEmpty)
    tk.unpersist()
  }

  test("IVF top-k never beats brute force (it searches a subset)") {
    import spark.implicits._
    val brute1 = Embeddings.cosineTopK(spark, sfDir)
      .filter($"rnk" === 1).select($"qid", $"sim".as("best"))
    val ivf1 = Embeddings.ivfTopK(spark, sfDir)
      .filter($"rnk" === 1).select($"qid", $"sim".as("ivf_best"))
    val beat = ivf1.join(brute1, "qid").filter($"ivf_best" > $"best")
    assert(beat.isEmpty)
  }

  test("IVF learned centroids: label-free plan, recall >= 3/5 of brute-force top-3") {
    import spark.implicits._
    val ivf = Embeddings.ivfTopK(spark, sfDir).cache()
    // the coarse quantizer is TRAINED, not label-derived: nothing in the
    // whole IVF plan may even read the label column
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("label"), "IVF plan must not touch the label column")
    // recall: of the 15 true top-3 neighbors (5 queries × 3), the 3-of-10
    // cell probe must find at least 9 (measured: 10 at sf0.001/sf0.01,
    // 11 at sf0.1 — deterministic, so this is a regression pin not a
    // statistical bound)
    val brute = Embeddings.cosineTopK(spark, sfDir)
      .filter($"rnk" <= 3).select($"qid", $"cid")
    val hits = ivf.select($"qid", $"cid").join(brute, Seq("qid", "cid")).count()
    assert(hits >= 9, s"IVF recall degraded: $hits/15 true neighbors found")
    ivf.unpersist()
  }

  test("LSH near-dup pairs are ordered and honor the 0.4 threshold") {
    import spark.implicits._
    val nd = Embeddings.lshNearDup(spark, sfDir).cache()
    assert(nd.filter($"va" >= $"vb").isEmpty)
    assert(nd.filter($"sim" < 0.4).isEmpty)
    nd.unpersist()
  }

  test("knn graph: edges are mutual, ordered, rank-bounded, and deduped") {
    import spark.implicits._
    val g = Embeddings.knnGraph(spark, sfDir).cache()
    assert(g.filter($"va" >= $"vb").isEmpty)
    assert(g.filter($"rnk_ab" < 1 || $"rnk_ab" > 5 || $"rnk_ba" < 1 || $"rnk_ba" > 5).isEmpty)
    assert(g.filter($"sim" < -1.000001 || $"sim" > 1.000001).isEmpty)
    // (va, vb) is a key: the mutual join emits each surviving edge once
    assert(g.groupBy($"va", $"vb").count().filter($"count" > 1).isEmpty)
    // substring dedup: rates bounded and totals consistent
    val sd = TextDedup.substringDup(spark, sfDir)
    assert(sd.filter($"dup_tokens" > $"total_tokens" || $"dup_tokens" < 0).isEmpty)
    assert(sd.filter($"n_docs_spanned" > $"n_docs").isEmpty)
    g.unpersist()
  }

  test("fingerprint: identical texts share fp; quality ratios in [0,1]") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val fp = TextAnalysis.fingerprint(spark, sfDir).join(docs, "doc_id")
    val clash = fp.as("x").join(fp.as("y"),
        $"x.text" === $"y.text" && $"x.doc_id" < $"y.doc_id")
      .filter($"x.fp" =!= $"y.fp")
    assert(clash.isEmpty, "identical text produced different fingerprints")
    val q = TextAnalysis.qualityScore(spark, sfDir)
    assert(q.filter($"stop_ratio" < 0 || $"stop_ratio" > 1).isEmpty)
    assert(q.filter($"alpha_ratio" < 0 || $"alpha_ratio" > 1).isEmpty)
    assert(q.filter($"quality" < 0 || $"quality" > 1).isEmpty)
  }

  test("corpus split covers every doc once with ~80/10/10 proportions") {
    import spark.implicits._
    val s = llm.Curation.splitCorpus(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(s.agg(sum($"n_docs")).head.getLong(0) === total)
    val train = s.filter($"split" === "train").agg(sum($"n_docs")).head.getLong(0)
    assert(math.abs(train.toDouble / total - 0.8) < 0.08, s"train frac ${train.toDouble / total}")
    s.unpersist()
  }

  test("dup clusters: every minhash pair lands in one cluster; sizes >= 2") {
    import spark.implicits._
    val pairs = llm.TextDedup.minhashLsh(spark, sfDir).select($"doc_a", $"doc_b")
    val clusters = llm.Curation.dupClusters(spark, sfDir).cache()
    assert(clusters.filter($"n_members" < 2).isEmpty)
    // members across clusters = distinct docs in the pair graph
    val nodes = pairs.select($"doc_a".as("d")).unionByName(pairs.select($"doc_b".as("d")))
      .distinct().count()
    assert(clusters.agg(sum($"n_members")).head.getLong(0) === nodes)
    clusters.unpersist()
  }

  test("sequence packing: bins respect the budget start-offsets, all docs packed") {
    import spark.implicits._
    val packed = llm.Curation.pack(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(packed.agg(sum($"n_docs")).head.getLong(0) === total)
    // bins are dense per source starting at 0
    val firstBins = packed.groupBy($"source").agg(min($"bin").as("b0"))
    assert(firstBins.filter($"b0" =!= 0).isEmpty)
    packed.unpersist()
  }

  test("langid confusion matrix covers every document exactly once") {
    import spark.implicits._
    val total = Tables.documents(spark, sfDir).count()
    val covered = TextAnalysis.langId(spark, sfDir).agg(sum($"n_docs")).head.getLong(0)
    assert(covered === total)
  }

  test("stratified sample: only 'en' is downsampled; counts bounded") {
    import spark.implicits._
    val s = llm.Curation.sampleCorpus(spark, sfDir).cache()
    assert(s.filter($"lang" =!= "en").filter($"n_kept" =!= $"n_docs").isEmpty,
      "non-en languages must be kept in full")
    val en = s.filter($"lang" === "en").head()
    assert(en.getAs[Long]("n_kept") <= en.getAs[Long]("n_docs"))
    // deterministic: a second run returns the identical frame
    val again = llm.Curation.sampleCorpus(spark, sfDir)
    assert(s.exceptAll(again).isEmpty && again.exceptAll(s).isEmpty)
    s.unpersist()
  }

  test("decontamination: probe source absent; exact copies of probe docs are flagged") {
    import spark.implicits._
    val d = llm.Curation.decontaminate(spark, sfDir).cache()
    assert(d.filter($"source" === "src0").isEmpty)
    assert(d.filter($"n_contaminated" > $"n_docs").isEmpty)
    // any non-probe doc with text identical to a probe doc must be contaminated
    val docs = Tables.documents(spark, sfDir)
    val probeTexts = docs.filter($"source" === "src0")
      .filter(size(split($"text", " ")) >= 8).select($"text").distinct()
    val exactCopies = docs.filter($"source" =!= "src0")
      .join(probeTexts, Seq("text"), "left_semi")
      .groupBy($"source").agg(count(lit(1)).as("n_copies"))
    val under = d.join(exactCopies, Seq("source"))
      .filter($"n_contaminated" < $"n_copies")
    assert(under.isEmpty, "an exact probe copy escaped decontamination")
    d.unpersist()
  }

  test("repetition: dup_frac in [0,1]; a doc of one repeated token maxes out") {
    import spark.implicits._
    val r = TextAnalysis.repetition(spark, sfDir)
    assert(r.filter($"avg_dup_frac" < 0 || $"avg_dup_frac" > 1).isEmpty)
    assert(r.filter($"max_dup_frac" < 0 || $"max_dup_frac" > 1).isEmpty)
    assert(r.filter($"n_repetitious" > $"n_docs").isEmpty)
  }

  test("crossdoc dup: rates bounded, totals consistent, exact copies saturate") {
    import spark.implicits._
    val d = TextDedup.crossdocDup(spark, sfDir).cache()
    assert(d.filter($"n_dup_shingles" > $"n_shingles").isEmpty)
    assert(d.filter($"dup_rate" < 0 || $"dup_rate" > 1).isEmpty)
    assert(d.filter($"min_doc_dup_frac" > $"max_doc_dup_frac").isEmpty)
    // every doc with >= 3 tokens contributes exactly once
    val eligible = Tables.documents(spark, sfDir)
      .filter(size(split($"text", " ")) >= 3).count()
    assert(d.agg(sum($"n_docs")).head.getLong(0) === eligible)
    d.unpersist()
    // a corpus with one exact pair: both copies have every shingle shared,
    // the singleton has none → per-source extremes are exactly 1.0 and 0.0
    val dir = java.nio.file.Files.createTempDirectory("graft_xdoc").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s0", 29L),
      (1L, "alpha beta gamma delta epsilon", "en", "s0", 29L),
      (2L, "one two three four five six", "en", "s0", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tiny = TextDedup.crossdocDup(spark, dir).collect()
    assert(tiny.length === 1)
    val row = tiny.head
    assert(row.getAs[Long]("n_docs") === 3L)
    assert(row.getAs[Double]("max_doc_dup_frac") === 1.0)
    assert(row.getAs[Double]("min_doc_dup_frac") === 0.0)
  }

  test("dup clusters: empty candidate graph (no near-dups) yields empty result, no crash") {
    import spark.implicits._
    // three clearly distinct docs → minhashLsh finds zero pairs
    val dir = java.nio.file.Files.createTempDirectory("graft_nodups").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0", 40L),
      (1L, "one two three four five six seven eight", "en", "s0", 38L),
      (2L, "red orange yellow green blue indigo violet maroon", "en", "s1", 48L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(llm.Curation.dupClusters(spark, dir).isEmpty)
  }

  test("quality filter: drop reasons partition the corpus exactly") {
    import spark.implicits._
    val f = llm.Curation.filterCorpus(spark, sfDir).cache()
    val bad = f.filter(
      $"n_too_short" + $"n_repetitious" + $"n_stopword_heavy" + $"n_kept" =!= $"n_docs")
    assert(bad.isEmpty, "reason counts must sum to n_docs per source")
    assert(f.agg(sum($"n_docs")).head.getLong(0) === Tables.documents(spark, sfDir).count())
    f.unpersist()
  }

  test("edit distance: identical texts (same 3-token prefix) found at distance 0") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dupPairs = docs.as("x").join(docs.as("y"),
        $"x.text" === $"y.text" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
    val zero = TextDedup.editDistance(spark, sfDir)
      .filter($"edit_dist" === 0).select("doc_a", "doc_b")
    assert(dupPairs.exceptAll(zero).isEmpty)
    // and the triangle-ish sanity: distance is symmetric-free and ordered
    assert(TextDedup.editDistance(spark, sfDir).filter($"doc_a" >= $"doc_b").isEmpty)
  }

  test("media codec: PNG round-trip reproduces the pixel formula exactly") {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir).limit(20)
      .select($"doc_id", $"text", md5($"text").as("md5hex"),
        (lit(4) + $"n_chars" % 12).cast("int").as("w"),
        (lit(4) + ($"n_chars" * 3) % 12).cast("int").as("h"))
    val dec = Multimodal.decodeImages(Multimodal.encodeImages(media)).collect()
    assert(dec.length === 20)
    dec.foreach { r =>
      assert(r.getAs[Boolean]("decode_ok"), s"doc ${r.getAs[Long]("doc_id")} failed decode")
      val (w, h) = (r.getAs[Int]("w"), r.getAs[Int]("h"))
      assert(r.getAs[Int]("dec_w") === w && r.getAs[Int]("dec_h") === h)
      val d1 = r.getAs[String]("md5hex").map(Character.digit(_, 16)).sum
      val expected = (for { y <- 0 until h; x <- 0 until w } yield (d1 + 7 * x + 13 * y) % 256).map(_.toLong).sum
      assert(r.getAs[Long]("px_sum") === expected, s"pixel sum mismatch for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("media codec: corrupt payloads take the error side-channel, good rows unaffected") {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir).filter($"doc_id" < 3)  // ids 0,1,2 → one per branch
      .select($"doc_id", md5($"text").as("md5hex"),
        (lit(4) + $"n_chars" % 12).cast("int").as("w"),
        (lit(4) + ($"n_chars" * 3) % 12).cast("int").as("h"))
    val corrupted = Multimodal.encodeImages(media)
      // corrupt one payload (truncate), null another, keep the third intact
      .withColumn("media",
        when($"doc_id" % 3 === 0, expr("substring(media, 1, 4)"))
          .when($"doc_id" % 3 === 1, lit(null).cast("binary"))
          .otherwise($"media"))
    val dec = Multimodal.decodeImages(corrupted).collect()
    assert(dec.length === 3)
    dec.foreach { r =>
      val ok = r.getAs[Boolean]("decode_ok")
      if (r.getAs[Long]("doc_id") % 3 === 2) {
        assert(ok, "intact payload must decode")
        assert(r.getAs[Long]("px_sum") > 0L)
      } else {
        assert(!ok, "corrupt/null payload must be flagged, not crash the task")
        assert(r.isNullAt(r.fieldIndex("px_sum")) && r.isNullAt(r.fieldIndex("dec_w")))
      }
    }
  }

  test("audio codec: s16le round-trip reproduces the waveform features exactly") {
    import spark.implicits._
    val meta = Tables.documents(spark, sfDir).limit(20)
      .select($"doc_id", md5($"text").as("md5hex"),
        (lit(64) + $"n_chars" % 64).cast("int").as("n_samples"))
      .withColumn("ameta", struct($"n_samples", lit(16000).as("sample_rate")))
    val dec = Multimodal.decodePcm(Multimodal.encodePcm(meta)).collect()
    assert(dec.length === 20)
    dec.foreach { r =>
      assert(r.getAs[Boolean]("a_decode_ok"), s"doc ${r.getAs[Long]("doc_id")} failed decode")
      val n = r.getAs[Int]("n_samples")
      val d1 = r.getAs[String]("md5hex").map(Character.digit(_, 16)).sum
      val wave = (0 until n).map(t => (d1 * 31 + 7 * t * t + 11 * t) % 65536 - 32768)
      assert(r.getAs[Long]("a_sum_sq") === wave.map(s => s.toLong * s).sum)
      assert(r.getAs[Int]("a_peak") === wave.map(math.abs).max)
      assert(r.getAs[Int]("a_zero_cross") ===
        wave.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
      assert(r.getAs[Long]("a_max_win_energy") ===
        wave.grouped(16).map(_.map(s => s.toLong * s).sum).max)
    }
  }

  test("audio codec: corrupt payloads take the error side-channel, good rows unaffected") {
    import spark.implicits._
    val meta = Tables.documents(spark, sfDir).filter($"doc_id" < 3)
      .select($"doc_id", md5($"text").as("md5hex"),
        (lit(64) + $"n_chars" % 64).cast("int").as("n_samples"))
      .withColumn("ameta", struct($"n_samples", lit(16000).as("sample_rate")))
    val corrupted = Multimodal.encodePcm(meta)
      // truncate one payload (also odd length), null another, keep the third
      .withColumn("pcm",
        when($"doc_id" % 3 === 0, expr("substring(pcm, 1, 5)"))
          .when($"doc_id" % 3 === 1, lit(null).cast("binary"))
          .otherwise($"pcm"))
    val dec = Multimodal.decodePcm(corrupted).collect()
    assert(dec.length === 3)
    dec.foreach { r =>
      val ok = r.getAs[Boolean]("a_decode_ok")
      if (r.getAs[Long]("doc_id") % 3 === 2) {
        assert(ok, "intact payload must decode")
        assert(r.getAs[Long]("a_sum_sq") > 0L)
      } else {
        assert(!ok, "corrupt/null payload must be flagged, not crash the task")
        assert(r.isNullAt(r.fieldIndex("a_sum_sq")) && r.isNullAt(r.fieldIndex("a_peak")))
      }
    }
  }

  test("frame sampler: sampled slices match the formula; truncated container flagged") {
    import spark.implicits._
    val meta = Tables.documents(spark, sfDir).filter($"doc_id" < 4)
      .select($"doc_id", md5($"text").as("md5hex"),
        (lit(3) + $"n_chars" % 6).cast("int").as("n_frames"),
        (lit(4) + $"n_chars" % 5).cast("int").as("w"),
        (lit(4) + ($"n_chars" * 3) % 5).cast("int").as("h"))
      .withColumn("vmeta", struct($"n_frames", $"w", $"h"))
    val sliced = Multimodal.encodeVideos(meta)
      // truncate doc 0's container so its LAST sampled frame comes up short
      .withColumn("video",
        when($"doc_id" === 0, expr("substring(video, 1, vmeta.w * vmeta.h * (vmeta.n_frames - 1) - 1)"))
          .otherwise($"video"))
      .select($"doc_id", $"md5hex", $"vmeta",
        posexplode(sequence(lit(0), $"vmeta.n_frames" - 1, lit(2))).as(Seq("pos", "fidx")),
        $"video")
      .select($"doc_id", $"md5hex", $"vmeta", $"fidx",
        expr("substring(video, fidx * vmeta.w * vmeta.h + 1, vmeta.w * vmeta.h)").as("frame"))
    val dec = Multimodal.decodeRawFrames(sliced).collect()
    assert(dec.nonEmpty)
    dec.foreach { r =>
      val m = r.getStruct(r.fieldIndex("vmeta"))
      val (nf, w, h) = (m.getInt(0), m.getInt(1), m.getInt(2))
      val fidx = r.getAs[Int]("fidx")
      val doc = r.getAs[Long]("doc_id")
      // the cut lands one byte INSIDE frame nf−2, so that frame and
      // everything after it slice short; earlier frames stay complete
      val truncated = doc == 0 && fidx >= nf - 2
      assert(r.getAs[Boolean]("f_len_ok") === !truncated,
        s"doc $doc frame $fidx: unexpected len_ok")
      if (!truncated) {
        val d1 = r.getAs[String]("md5hex").map(Character.digit(_, 16)).sum
        val expected = (for { y <- 0 until h; x <- 0 until w }
          yield ((d1 + 5 * fidx + 7 * x + 13 * y) % 256).toLong).sum
        assert(r.getAs[Long]("f_px_sum") === expected, s"doc $doc frame $fidx sum")
      }
    }
  }

  test("leak-safe split: no near-dup pair straddles a split boundary") {
    import spark.implicits._
    val assign = graft.llm.Curation.leakSafeAssignments(spark, sfDir).cache()
    try {
      // every document assigned exactly once
      assert(assign.count() === Tables.documents(spark, sfDir).count())
      // one split per cluster — the operator's defining property
      val straddling = assign.groupBy($"cluster_id")
        .agg(countDistinct($"split").as("ns")).filter($"ns" > 1)
      assert(straddling.isEmpty, straddling.collect().mkString(","))
      // the property is binding at this SF: the pair graph is non-empty
      // and the DOC-keyed C1 bucketing WOULD have split at least one
      // cluster (i.e. this operator differs from cur_split for a reason)
      val pairs = TextDedup.minhashLsh(spark, sfDir)
        .select($"doc_a", $"doc_b").collect()
      assert(pairs.nonEmpty)
      val docSplit = Tables.documents(spark, sfDir)
        .withColumn("bucket", expr(graft.ops.ScalarFuncs.splitBucketExpr))
        .withColumn("dsplit",
          when($"bucket" < 80, "train").when($"bucket" < 90, "val").otherwise("test"))
        .select($"doc_id", $"dsplit")
      val wouldStraddle = assign.join(docSplit, Seq("doc_id"))
        .groupBy($"cluster_id").agg(countDistinct($"dsplit").as("ns"))
        .filter($"ns" > 1).count()
      assert(wouldStraddle > 0,
        "fixture too clean: doc-keyed split never straddles, property untestable")
    } finally { assign.unpersist(false); () }
  }
}
