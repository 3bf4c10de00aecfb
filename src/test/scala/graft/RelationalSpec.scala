package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventWindows, Relational}

/** Engine-capability operators (§2.6/§2.7) checked against independent
  * recomputations on sf0.001.
  */
class RelationalSpec extends SparkSpec {

  test("J5 as-of join matches the brute-force non-equi definition") {
    import spark.implicits._
    val got = Relational.j5AsOf(spark, sfDir)
    // brute force: max orderdate <= ts per user, then max orderkey there
    val ev = Tables.events(spark, sfDir)
    val od = Tables.orders(spark, sfDir)
      .groupBy($"o_custkey", $"o_orderdate").agg(max($"o_orderkey").as("o_orderkey"))
    val brute = ev.as("e").join(od.as("o"),
        $"e.user_id" === $"o.o_custkey" && $"o.o_orderdate" <= $"e.ts", "left")
      .groupBy($"e.event_id", $"e.user_id")
      .agg(max_by(struct($"o.o_orderdate", $"o.o_orderkey"), $"o.o_orderdate").getField("o_orderkey").as("matched_orderkey"))
      .select($"event_id", $"user_id", $"matched_orderkey")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("J3 semi + anti partition the customer set") {
    import spark.implicits._
    val res = Relational.j3SemiAnti(spark, sfDir)
      .agg(sum($"with_orders" + $"without_orders")).head.getLong(0)
    assert(res === Tables.customer(spark, sfDir).count())
  }

  test("SO1 set-op counts satisfy inclusion-exclusion") {
    import spark.implicits._
    val m = Relational.so1SetOps(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sfDir)
    val buyers = ev.filter($"event_type" === "purchase").select("user_id").distinct().count()
    val clickers = ev.filter($"event_type" === "click").select("user_id").distinct().count()
    assert(m("except") === buyers - m("intersect"))
    assert(m("union") === buyers + clickers - m("intersect"))
  }

  test("O1 top-k is ordered and bounded") {
    val rows = Relational.o1TopK(spark, sfDir).collect()
    assert(rows.length === 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("tumbling windows tile the event stream; sliding double-covers it") {
    import spark.implicits._
    val total = Tables.events(spark, sfDir).count()
    val tumbled = EventWindows.tumbling(spark, sfDir).agg(sum($"n_events")).head.getLong(0)
    val slid = EventWindows.sliding(spark, sfDir).agg(sum($"n_events")).head.getLong(0)
    assert(tumbled === total)
    assert(slid === 2 * total)
  }

  test("session windows cover every event with no user crossing sessions") {
    import spark.implicits._
    val total = Tables.events(spark, sfDir).count()
    val sess = EventWindows.session(spark, sfDir)
    assert(sess.agg(sum($"n_events")).head.getLong(0) === total)
    // session starts are strictly increasing per user by >= gap from the
    // previous session's last event — starts must at least be distinct
    val dupStarts = sess.groupBy($"user_id", $"session_start").count().filter($"count" > 1)
    assert(dupStarts.isEmpty)
  }

  test("salted join and salted aggregation equal their plain counterparts") {
    import spark.implicits._
    // decimal money values: sums must be exact so plain vs salted grouping
    // order cannot produce last-ulp differences
    val o = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_totalprice".cast("decimal(12,2)").as("o_totalprice"))
    val c = Tables.customer(spark, sfDir).select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plainJ = o.join(c, Seq("o_custkey"))
    val saltedJ = graft.ops.Skew.saltedJoin(o, c, "o_custkey", buckets = 8)
    assert(saltedJ.count() === plainJ.count())
    assert(saltedJ.exceptAll(plainJ).isEmpty && plainJ.exceptAll(saltedJ).isEmpty)
    val plainA = o.groupBy($"o_custkey")
      .agg(sum($"o_totalprice").as("sum_value"), count(lit(1)).as("n_rows"))
    val saltedA = graft.ops.Skew.saltedSumCount(o, "o_custkey", "o_totalprice", buckets = 8)
    assert(saltedA.exceptAll(plainA).isEmpty && plainA.exceptAll(saltedA).isEmpty)
  }

  test("bucketed co-located join plans no shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.orders(spark, sfDir).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_bkt")
      Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_bkt")
      val j = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), $"l_orderkey" === $"o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed-by-join-key tables must co-locate without a shuffle:\n" + plan.take(1500))
      assert(j.count() === Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("sketch aggregates track exact answers within tolerance (HLL, quantiles)") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val exact = ev.select(countDistinct($"user_id")).head.getLong(0)
    val approx = ev.select(approx_count_distinct($"user_id", rsd = 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
    val Array(p50, p95) = ev.select(percentile_approx($"value",
      array(lit(0.5), lit(0.95)), lit(10000))).head.getSeq[Double](0).toArray
    val n = ev.count()
    val below50 = ev.filter($"value" <= p50).count().toDouble / n
    val below95 = ev.filter($"value" <= p95).count().toDouble / n
    assert(math.abs(below50 - 0.5) < 0.02, s"p50=$p50 covers $below50")
    assert(math.abs(below95 - 0.95) < 0.02, s"p95=$p95 covers $below95")
  }

  test("A3 cube emits all four grouping combinations consistently") {
    import spark.implicits._
    val cube = Relational.a3Cube(spark, sfDir).cache()
    val grand = cube.filter($"g_status" === 1 && $"g_prio" === 1)
    assert(grand.count() === 1)
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(grand.head.getAs[Long]("n_orders") === nOrders)
    // each grouping level sums to the grand total
    for ((gs, gp) <- Seq((0, 0), (0, 1), (1, 0))) {
      val lvl = cube.filter($"g_status" === gs && $"g_prio" === gp)
        .agg(sum($"n_orders")).head.getLong(0)
      assert(lvl === nOrders, s"level ($gs,$gp)")
    }
    cube.unpersist()
  }

  test("A4 percentiles are ordered and bracketed by min/max") {
    import spark.implicits._
    val p = Relational.a4Percentiles(spark, sfDir)
    assert(p.filter($"p25" > $"p50" || $"p50" > $"p95").isEmpty)
    val bounds = Tables.orders(spark, sfDir)
      .agg(min($"o_totalprice").as("lo"), max($"o_totalprice").as("hi")).head()
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    assert(p.filter($"p25" < lo - 0.01 || $"p95" > hi + 0.01).isEmpty)
  }

  test("A5 pivot cells sum back to the order count") {
    import spark.implicits._
    val wide = Relational.a5Pivot(spark, sfDir)
    val total = wide.agg(sum($"n_f" + $"n_o" + $"n_p")).head.getLong(0)
    assert(total === Tables.orders(spark, sfDir).count())
  }

  test("A6 histogram covers every doc; bucket ranges are consistent") {
    import spark.implicits._
    val h = Relational.a6Histogram(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(h.agg(sum($"n_docs")).head.getLong(0) === total)
    // min/max inside each non-overflow bucket stay inside its range
    val bad = h.filter($"bucket" < 11)
      .filter($"min_chars" < $"bucket" * 50 || $"max_chars" >= ($"bucket" + 1) * 50)
    assert(bad.isEmpty)
    h.unpersist()
  }

  test("A7 stats: variances non-negative, correlation in [-1,1]") {
    import spark.implicits._
    val s = Relational.a7Stats(spark, sfDir)
    assert(s.filter($"sd_chars" < 0 || $"var_tok" < 0).isEmpty)
    assert(s.filter($"corr_chars_tok" < -1 || $"corr_chars_tok" > 1).isEmpty)
  }

  test("F12 nulls: count(col) + nullsafe-null count = count(*)") {
    import spark.implicits._
    val n = Relational.fNullFuncs(spark, sfDir)
    assert(n.filter($"n_nonnull_rf" + $"n_nullsafe_null" =!= $"n_rows").isEmpty)
  }

  test("F13 map: per-status flag cells sum to the lineitem count") {
    import spark.implicits._
    val m = Relational.fMapFuncs(spark, sfDir)
    val total = m.agg(sum($"n_a" + $"n_n" + $"n_r")).head.getLong(0)
    assert(total === Tables.lineitem(spark, sfDir).count())
  }

  test("W6 SCD2: intervals cover every event, exactly one current row per user") {
    import spark.implicits._
    val scd = Relational.w6Scd2(spark, sfDir).cache()
    // every event lands in exactly one run
    assert(scd.agg(sum($"n_events")).head.getLong(0)
      === Tables.events(spark, sfDir).count())
    // one open (current) interval per user
    val bad = scd.groupBy($"user_id")
      .agg(sum(when($"is_current", 1L).otherwise(0L)).as("n_open"))
      .filter($"n_open" =!= 1L)
    assert(bad.isEmpty)
    // half-open chaining: the next validity never starts before this one
    assert(scd.filter($"valid_to".isNotNull && $"valid_to" < $"valid_from").isEmpty)
    assert(scd.filter($"last_seen" < $"valid_from").isEmpty)
    scd.unpersist()
  }

  test("A11 closed-form OLS matches Spark's regr_* on the same cents") {
    import spark.implicits._
    val got = Relational.a11Regression(spark, sfDir)
      .select($"l_returnflag", $"slope", $"intercept_dollars", $"r2")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag",
        "CAST(round(l_quantity * 100) AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .groupBy($"l_returnflag")
      .agg(expr("regr_slope(y, x)").as("m"),
        expr("regr_intercept(y, x)").as("b"),
        expr("regr_r2(y, x)").as("r2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (m, b, r2)) =>
      val (rm, rb, rr2) = ref(k)
      assert(math.abs(m - rm) <= 1e-4 * math.max(1.0, math.abs(rm)), s"slope($k)")
      assert(math.abs(b - rb / 100.0) <= 1e-4 * math.max(1.0, math.abs(rb / 100.0)), s"intercept($k)")
      assert(math.abs(r2 - rr2) <= 1e-4, s"r2($k)")
    }
  }

  test("W3 ranking: rank bounds, quartiles 1..4, percent_rank in [0,1]") {
    import spark.implicits._
    val r = Relational.w3Ranking(spark, sfDir).cache()
    assert(r.filter($"rnk" < 1 || $"drnk" > $"rnk").isEmpty)
    assert(r.filter($"quartile" < 1 || $"quartile" > 4).isEmpty)
    assert(r.filter($"pct_rank" < 0 || $"pct_rank" > 1).isEmpty)
    assert(r.filter($"cume" <= 0 || $"cume" > 1).isEmpty)
    // the per-nation top row carries its own balance as top_bal
    assert(r.filter($"rnk" === 1).filter($"delta_prev".isNotNull).isEmpty)
    r.unpersist()
  }
}
