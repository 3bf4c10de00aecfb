package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.ops.Relational

/** Physical-plan shape assertions: the ".explain and iterate until it's
  * the plan you'd want" requirement, made executable so regressions in
  * broadcast scope / pushdown / top-k lowering fail the build.
  */
class PlanSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan
    val unwrapped: SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    // initial (pre-AQE-execution) plan string still names the join
    // strategies and scans we assert on
    unwrapped.toString + "\n" + df.queryExecution.executedPlan.toString
  }

  test("O1 top-k lowers to TakeOrderedAndProject (no global sort)") {
    val plan = planString(Relational.o1TopK(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("GlobalSort"), "top-k must not global-sort")
  }

  test("J1 star join broadcasts the fixed-size nation+region dim") {
    val df = Relational.j1StarJoin(spark, sfDir)
    df.count() // let AQE finalize
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("P4 filter reaches the parquet scan as a pushed filter") {
    val df = Relational.p457FilterDistinct(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan.take(2000))
    assert(scan.contains("l_shipdate"), "date filter should be pushed to the scan")
  }

  test("scan prunes columns: q1 reads only the needed lineitem columns") {
    val df = Relational.q1Agg(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment"), "unused wide column must be pruned")
  }

  test("whole-stage codegen covers the q1 aggregate pipeline") {
    // AQE wraps stages lazily and hides the codegen markers from the plan
    // walker; turn it off for the assertion — codegen behavior is the same.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Relational.q1Agg(spark, sfDir).queryExecution.executedPlan.toString
      // codegen stages print as "*(n) HashAggregate..." markers
      assert(plan.contains("*(1)"), plan.take(2000))
      assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("HashAggregate")),
        "the aggregate must sit inside a codegen stage")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("S5 incremental anti-join broadcasts the loaded-files side") {
    import spark.implicits._
    val inc = Seq("f1", "f2").toDF("file_path")
    val ld = Seq("f1").toDF("file_path")
    val df = weather.Staging.incrementalNew(inc, ld)
    df.count()
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan.take(2000))
  }

  test("cosine top-k partially aggregates map-side; no window in the plan") {
    val df = llm.Embeddings.cosineTopK(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(plan.toLowerCase.contains("partial_topkaggregator"),
      "the TopKAggregator must run as a partial (map-side) aggregate:\n" + plan.take(1500))
    assert(!plan.contains("WindowExec"), "no window shuffle in the top-k path")
  }

  test("as-of join plans a single exchange, no broadcast-nested-loop") {
    val df = Relational.j5AsOf(spark, sfDir)
    val plan = planString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "as-of must use union+window, not a non-equi BNLJ")
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("J7 multiway keeps part/supplier off the pinned-broadcast side") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
    val df = Relational.j7Multiway(spark, sfDir)
    // only nation carries an explicit broadcast hint; part/supplier are
    // free for AQE (shuffle at scale, broadcast at toy SF)
    val hinted = df.queryExecution.analyzed.collect {
      case ResolvedHint(child, hints) if hints.strategy.isDefined => child
    }
    assert(hinted.size == 1, s"exactly one pinned broadcast expected, got ${hinted.size}")
    assert(hinted.head.toString.contains("n_nationkey"),
      "the pinned broadcast must be the fixed-size nation dim")
    assert(df.queryExecution.analyzed.collect { case j: Join => j }.size == 3)
  }

  test("media pipeline crosses exactly one batch (mapPartitions) boundary, before the shuffle") {
    val plan = llm.Multimodal.mediaPipeline(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      "the decode stub must run behind a real mapPartitions boundary\n" + plan.take(1200))
    // binaries never shuffle: the exchange sits ABOVE the decode boundary
    val mapIdx = plan.indexOf("MapPartitions")
    val exIdx = plan.indexOf("Exchange")
    assert(exIdx >= 0 && exIdx < mapIdx,
      "the only exchange must be the post-feature aggregate (printed above the map boundary)")
  }

  test("decontamination semi-joins with a broadcast probe-gram build side") {
    val df = llm.Curation.decontaminate(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "probe grams are benchmark-sized: the semi join must broadcast them\n" + plan.take(1500))
  }

  test("pivot with literal values plans no extra distinct job") {
    // values passed explicitly → single aggregate, no value-discovery scan
    val df = Relational.a5Pivot(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    val scans = "Relation.*parquet".r.findAllIn(plan).length +
      "FileScan".r.findAllIn(plan).length
    assert(scans <= 1, s"pivot should scan orders exactly once:\n${plan.take(1500)}")
  }

  test("bucketed join runs with no shuffle on either side") {
    // at toy SF Catalyst rightly broadcasts the small side; the co-located
    // layout matters when NEITHER side fits in memory — pin that scenario
    // by disabling auto-broadcast (what a 100 TB join faces anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = sources.Formats.bucketedJoin(spark, sfDir)
      df.count()
      // single plan string (AQE is off) — planString concatenates two
      // copies, which would false-positive the below-the-join scan
      val plan = df.queryExecution.executedPlan.toString
      // both sides are bucketBy(8, key): the SMJ consumes the bucket layout
      // directly — any hashpartitioning exchange BELOW the join would mean
      // the co-located layout was not used (the post-join aggregate may
      // still exchange; it is above SortMergeJoin in the printed tree)
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, "expected a sort-merge join over bucketed scans\n" + plan.take(1500))
      val below = plan.substring(joinIdx)
      assert(!below.contains("Exchange hashpartitioning"),
        "bucketed sides must not re-shuffle:\n" + below.take(1500))
      assert(plan.contains("SelectedBucketsCount"),
        "scans must report bucket pruning metadata:\n" + plan.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("TPC-H Q3 via SQL text lowers top-10 to TakeOrderedAndProject") {
    val df = ops.SqlSurface.sqlTpchQ3(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("IVF inverted file bucketed by cell: a 2-cell probe reads 2 of 8 buckets") {
    import spark.implicits._
    // the emb_ivf_topk scale path (Embeddings.scala scaladoc): the cell
    // assignment IS the storage layout — write the inverted file bucketed
    // by cell, and a probe of nprobe cells scans only those buckets
    sources.Formats.resetTable(spark, "g_ivf_file")
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label".as("cell"), $"embedding")
      .repartition(8, $"cell")
      .write.bucketBy(8, "cell").sortBy("cell")
      .mode("overwrite").saveAsTable("g_ivf_file")
    // autoBucketedScan turns bucketed reading off for filter-only queries
    // (no shuffle to avoid), which also discards the pruning metadata we
    // assert on — at scale a probe scan keeps it for the IO win
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val plan =
      try {
        val probe = spark.table("g_ivf_file").filter($"cell".isin(0, 1))
        probe.count()
        // read the plan while the conf is still in effect (executedPlan is
        // lazily materialized against the session conf at call time)
        probe.queryExecution.executedPlan.toString
      } finally
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    assert(sel.isDefined, "bucketed scan must report bucket pruning:\n" + plan.take(1500))
    assert(sel.get.group(1).toInt <= 2,
      s"2-cell probe must read at most 2 buckets, read ${sel.get.group(1)}")
  }

  test("partitioned layout prunes to the selected partition directory") {
    val df = sources.Formats.partitionPrune(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(1500))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_orderstatus"), "status filter must prune partitions, not scan+filter:\n" + pf)
    // the data filters must NOT contain the partition column — pruning
    // happened at the directory level, before any row was read (the scan
    // prints on ONE line, so extract the PushedFilters bracket itself)
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(!pushed.contains("o_orderstatus"),
      "partition-key filter must not degrade to a row-level pushed filter: " + pushed)
  }

  test("dynamic partition pruning: a filtered dim prunes the partitioned fact at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => fcount, lit => flit}
    // fact partitioned on the join key; the partition filter arrives only
    // through the JOIN (dim filtered on an attribute), so static pruning
    // can't apply — DPP injects the dim's key set into the fact scan
    val root = "/tmp/graft_dpp_fact"
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity", $"l_returnflag")
      .repartition($"l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(root)
    // the dim must be a FILE relation: a LocalRelation's filter constant-
    // folds into the literal rows at plan time, leaving no selective
    // predicate for the partition-pruning rule to latch onto
    val dimRoot = "/tmp/graft_dpp_dim"
    Seq(("A", "returned"), ("N", "kept"), ("R", "refunded")).toDF("flag", "label")
      .write.mode("overwrite").parquet(dimRoot)
    val dim = spark.read.parquet(dimRoot)
    val q = spark.read.parquet(root)
      .join(dim, $"l_returnflag" === $"flag")
      .filter($"label" === "refunded")
      .groupBy($"label").agg(fcount(flit(1)).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      "the fact scan must carry a dynamic pruning predicate:\n" + plan.take(2000))
  }

  test("nested-schema pruning: reading one struct field prunes the rest of the struct") {
    import spark.implicits._
    import org.apache.spark.sql.functions.struct
    // the multimodal record shape: wide struct on disk, narrow read —
    // at 100 TB reading meta.source must NOT drag text/vec along
    val root = "/tmp/graft_nested_doc"
    Tables.documents(spark, sfDir)
      .select($"doc_id", struct($"lang", $"source", $"n_chars").as("meta"), $"text")
      .write.mode("overwrite").parquet(root)
    val q = spark.read.parquet(root).select($"meta.source").groupBy($"source").count()
    val scan = q.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse(scan)
    assert(readSchema.contains("source"), readSchema)
    assert(!readSchema.contains("text") && !readSchema.contains("lang"),
      "unread struct fields and columns must be pruned from the scan: " + readSchema)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{when, lpad, lit, count, max, length}
    // one hot key holding ~95% of the large side — the shape salting (X3)
    // and AQE skew-split both target; here we prove the AQE path works
    // with our session settings, thresholds scaled to toy data sizes
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val large = spark.range(200000)
        .select(when($"id" < 190000, 0L).otherwise($"id").as("k"),
          // payload must stay referenced downstream or column pruning
          // shrinks the hot partition under the skew threshold
          lpad($"id".cast("string"), 64, "x").as("payload"))
      val small = spark.range(64).select($"id".as("k"), lit("dim").as("d"))
      val joined = large.join(small, Seq("k"))
        .groupBy($"d").agg(count(lit(1)).as("n"), max(length($"payload")).as("max_len"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE must mark the hot partition's join as skew-handled:\n" + plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ranking battery shares one window sort (single Window over one Exchange)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Relational.w3Ranking(spark, sfDir)
        .queryExecution.executedPlan.toString
      val nWindows = plan.linesIterator.count(_.trim.startsWith("Window"))
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nWindows <= 2, s"expected a fused window stage, got $nWindows:\n${plan.take(1500)}")
      assert(nExchanges == 1, s"all eight functions must share one shuffle, got $nExchanges")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("chunking stays map-side: the only exchange is the output sort") {
    spark.catalog.clearCache() // other suites cache these exact plans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.llm.Curation.chunk(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "chunk generation must not shuffle:\n" + plan.take(1500))
      val nRange = "Exchange rangepartitioning".r.findAllIn(plan).length
      assert(nRange == 1, s"expected exactly the output-sort exchange, got $nRange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("gap-fill: both fill directions share one user_id shuffle") {
    spark.catalog.clearCache() // other suites cache these exact plans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.ops.EventWindows.gapfill(spark, sfDir)
        .queryExecution.executedPlan.toString
      val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nHash == 1,
        s"ffill+bfill windows must reuse one partitioning, got $nHash:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("w8 streak: lag window, island sum and both group-bys share one custkey shuffle") {
    spark.catalog.clearCache() // other suites cache these exact plans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.ops.EventWindows.streak(spark, sfDir)
        .queryExecution.executedPlan.toString
      val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nHash == 1,
        s"the whole gaps-and-islands chain must reuse one partitioning, got $nHash:\n${plan.take(1500)}")
      assert(plan.contains("TakeOrderedAndProject"),
        "top-25 must be a bounded TakeOrderedAndProject, not a global sort")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("w10 interpolation: both neighbor windows share one user_id shuffle") {
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.ops.EventWindows.interpolate(spark, sfDir)
        .queryExecution.executedPlan.toString
      val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nHash == 1,
        s"past+future neighbor windows must reuse one partitioning, got $nHash:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("a16 spearman: all four rank windows and the final aggregate share one shuffle") {
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Relational.a16Spearman(spark, sfDir)
        .queryExecution.executedPlan.toString
      // hashpartitioning(segment) satisfies the (segment, value) tie-count
      // windows too (coarser partitioning ⊇ finer clustering), so the
      // join shuffle aside, the whole rank pipeline rides one exchange
      val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nHash <= 3,
        s"expected join + at most one window/agg shuffle, got $nHash:\n${plan.take(2000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("a9 battery is one partial+final hash aggregate over one shuffle") {
    spark.catalog.clearCache() // other suites cache these exact plans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Relational.a9AggBattery(spark, sfDir)
        .queryExecution.executedPlan.toString
      val nAgg = plan.linesIterator.count(_.trim.matches("[+:\\-\\s]*(Sort|Object|)HashAggregate.*"))
      val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
      // median forces a sort/object aggregate path but still exactly one
      // partial+final pair — no extra pass for the 9 other aggregates
      assert(nAgg == 2, s"expected partial+final only, got $nAgg:\n${plan.take(1500)}")
      assert(nHash == 1, s"expected one aggregate shuffle, got $nHash")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("merge scan reads the evolved column and the partition column") {
    val df = graft.sources.Formats.mergeScan(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("l_discount"), "merged schema must expose the evolved column")
    assert(df.schema.fieldNames.contains("batch"), "partition discovery must add batch")
  }

  test("z-order layout bounds BOTH dimensions per file; x-sort bounds only one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = "/tmp/graft_zorder_test"
    val src = Tables.orders(spark, sfDir)
      .withColumn("x", $"o_custkey" % 256L)
      .withColumn("y", date_format($"o_orderdate", "yyyyMMdd").cast("long") % 256L)
      .withColumn("z", graft.sources.Formats.zorderKey($"x", $"y"))
    src.repartitionByRange(16, $"z").sortWithinPartitions($"z")
      .write.mode("overwrite").parquet(root)
    def spans(path: String) = spark.read.parquet(path)
      .groupBy(col("_metadata.file_path"))
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .agg(avg($"xs"), avg($"ys")).head()
    val zb = spans(root)
    // a contiguous z-range constrains the high bits of BOTH dims: with 16
    // range partitions each file's x- and y-span sits far below the 0-255
    // global span (≤128 with aligned boundaries; avg well under that)
    assert(zb.getDouble(0) < 140.0 && zb.getDouble(1) < 140.0,
      s"z-order should bound both dims per file, got $zb")
    // contrast: sorting on x alone leaves y unclustered (span ≈ full 255)
    src.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(root + "_x")
    val xb = spans(root + "_x")
    assert(xb.getDouble(0) < 32.0, "x-sort clusters x tightly")
    assert(xb.getDouble(1) > 200.0, "x-sort leaves y unclustered")
  }

  test("runtime bloom filter from a selective dim filter reaches the fact scan") {
    import spark.implicits._
    // X19: Spark injects a bloom filter built from the FILTERED creation
    // side (orders with a selective non-key predicate) and applies it to
    // the fact side BEFORE the join shuffle — at 100 TB this drops most of
    // the shuffle write for free. Thresholds are scaled to toy sizes
    // (app-side scan threshold default is 10GB) like the AQE skew test.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = Tables.lineitem(spark, sfDir)
        .join(
          Tables.orders(spark, sfDir).filter($"o_orderpriority" === "1-URGENT"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").count()
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom runtime filter on the fact side:\n${plan.take(1800)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a20 KMV builds its sketch without a ranking window") {
    // the bounded BottomKLongsAggregator partial-aggregates map-side; a
    // Window here would mean every distinct hash value shuffles onto the
    // group partitions before the k-trim
    val plan = planString(graft.ops.ApproxAggs.a20Kmv(spark, sfDir))
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      s"KMV sketch must not rank through a window:\n${plan.take(1500)}")
  }

  test("mm_frame_sample: container binaries never cross an exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.BinaryType
    // AQE wraps exchanges in lazy query stages that hide them from the
    // plan walker (the codegen-test precedent); shapes are identical
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.llm.Multimodal.frameSample(spark, sfDir)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "expected at least the aggregation exchange")
      exchanges.foreach { e =>
        assert(!e.output.exists(_.dataType == BinaryType),
          s"binary column shuffles through ${e.nodeName}: ${e.output.map(_.name)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("AQE coalesces a tiny shuffle to fewer partitions at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit}
    // X20: the runtime partner of static shuffle.partitions tuning — a
    // 5-group aggregate writes a near-empty 32-partition shuffle; AQE's
    // coalescer merges those at execution into as few reducers as the
    // data needs, which at 100 TB is the difference between 20k tasks
    // and 200 on the final skinny stages of a deep plan.
    val df = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    df.collect() // execute THROUGH this QueryExecution so AQE finalizes it
                 // (count() plans its own execution and leaves this one initial)
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") && finalPlan.contains("coalesced"),
      s"expected a runtime-coalesced shuffle read:\n${finalPlan.take(1500)}")
  }

  test("ev8 markov: the row-total join broadcasts; one user_id window shuffle") {
    val df = graft.ops.EventWindows.markov(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"5-row total table must broadcast:\n${plan.take(1500)}")
  }
}
