package graft

import org.apache.spark.sql.functions._

/** Approximate/sketch operators: a8_approx's registered form is a
  * boolean-verdict query (exact answers + within-tolerance booleans,
  * oracle-checked by DuckDB); THIS spec pins the tighter raw contracts —
  * 5-sigma HLL rsd and percentile rank error against exact answers — plus
  * the count-min / Bloom sketches from DataFrameStatFunctions.
  */
class SketchSpec extends SparkSpec {

  test("a8 verdict form: every within-tolerance boolean is true") {
    import spark.implicits._
    val rows = ops.ApproxAggs.a8Approx(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("parts_within_10pct", "supps_within_10pct", "p50_within_5pct", "p95_within_5pct")
        .foreach(c => assert(r.getAs[Boolean](c), s"$c false for ${r.getAs[String]("l_returnflag")}"))
    }
  }

  test("approx_count_distinct is within the declared 2% rsd of exact") {
    import spark.implicits._
    val apx = ops.ApproxAggs.a8Raw(spark, sfDir)
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("x_parts"), countDistinct($"l_suppkey").as("x_supps"))
    val joined = apx.join(exact, Seq("l_returnflag")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ap, xp) = (r.getAs[Long]("apx_parts").toDouble, r.getAs[Long]("x_parts").toDouble)
      val (as_, xs) = (r.getAs[Long]("apx_supps").toDouble, r.getAs[Long]("x_supps").toDouble)
      // HLL++ rsd 0.02 → allow 5 sigma
      assert(math.abs(ap - xp) <= math.max(5 * 0.02 * xp, 1.0), s"parts: $ap vs $xp")
      assert(math.abs(as_ - xs) <= math.max(5 * 0.02 * xs, 1.0), s"supps: $as_ vs $xs")
    }
  }

  test("approx_percentile brackets the exact percentile rank") {
    import spark.implicits._
    val apx = ops.ApproxAggs.a8Raw(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> (r.getAs[Double]("apx_p50"), r.getAs[Long]("n_rows"))).toMap
    apx.foreach { case (flag, (p50, n)) =>
      // the reported value's true rank must be within accuracy-bound
      // distance of the 0.5 rank (contract of percentile_approx(acc=10000))
      val below = Tables.lineitem(spark, sfDir)
        .filter($"l_returnflag" === flag && $"l_extendedprice" <= p50).count()
      val rank = below.toDouble / n
      assert(math.abs(rank - 0.5) <= 0.01, s"$flag: p50=$p50 has rank $rank")
    }
  }

  test("count-min sketch overestimates by at most eps*n; never underestimates") {
    import spark.implicits._
    val df = Tables.lineitem(spark, sfDir).select($"l_returnflag")
    val n = df.count()
    val cms = df.stat.countMinSketch("l_returnflag", eps = 0.001, confidence = 0.99, seed = 42)
    val exact = df.groupBy($"l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, x) =>
      val est = cms.estimateCount(k)
      assert(est >= x, s"CMS must never underestimate: $k $est < $x")
      assert(est <= x + (0.001 * n).toLong + 1, s"CMS overestimate bound blown: $k $est vs $x")
    }
  }

  test("bloom filter: no false negatives, fpp near the configured rate") {
    import spark.implicits._
    val keys = Tables.orders(spark, sfDir).select($"o_orderkey")
    val bf = keys.stat.bloomFilter("o_orderkey", expectedNumItems = 20000, fpp = 0.01)
    // every present key hits
    val misses = keys.collect().count(r => !bf.mightContain(r.getLong(0)))
    assert(misses == 0, s"bloom filter false negatives: $misses")
    // absent keys mostly miss (allow generous 5x the configured fpp)
    val absentHits = (1 to 10000).count(i => bf.mightContain(-i.toLong))
    assert(absentHits <= 10000 * 0.05, s"fpp too high: $absentHits/10000")
  }

  test("HLL re-aggregability: union of fine sketches == direct coarse sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // HLL register state is a per-bucket max — associative and
    // order-insensitive — so merging the per-status sketches must give the
    // SAME estimate as sketching each priority's keys directly. This is
    // the law a10_hll_merge's 5%-of-exact oracle rides on.
    val viaMerge = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
      .groupBy($"o_orderpriority")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val direct = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))").as("est_direct"))
    val joined = viaMerge.join(direct, "o_orderpriority")
    assert(joined.filter($"est" =!= $"est_direct").isEmpty,
      "merged-sketch estimate must equal the direct sketch estimate")
  }

  test("Misra-Gries: containment + error bound on a Zipf stream with vocab >> m") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    // Zipf-ish synthetic stream: term k appears ~50000/k times, vocabulary
    // 2000 >> m=16, so the sketch MUST decrement (unlike the toy corpus).
    // Docs are 100-token groups so reduce() sees per-doc count rows.
    val m = 16
    val stream = spark.range(2000).select($"id".cast("int").as("k"))
      .select($"k", explode(sequence(lit(1),
        greatest((lit(50000) / ($"k" + 1)).cast("int"), lit(1)))).as("rep"))
      .select(concat(lit("t"), lpad($"k".cast("string"), 4, "0")).as("term"),
        monotonically_increasing_id().as("seq"))
    val docs = stream.withColumn("doc", pmod(hash($"seq"), lit(500)))
      .groupBy($"doc", $"term").agg(count(lit(1)).cast("int").as("n"))
      .groupBy($"doc")
      .agg(collect_list(struct($"term", $"n")).as("tcs"))
    val mg = udaf(new graft.functions.MisraGriesAggregator(m),
      ExpressionEncoder[Seq[graft.functions.TermCount]]())
    val est = docs.agg(mg($"tcs").as("cs"))
      .select(explode($"cs").as("c")).select($"c.term", $"c.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= m, s"sketch exceeded capacity: ${est.size} > $m")
    val truth = stream.groupBy($"term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val bound = n / (m + 1.0)
    // containment: every term above the N/(m+1) frequency bound survives
    truth.filter(_._2 > bound).foreach { case (t, c) =>
      assert(est.contains(t), s"heavy term $t (cnt=$c > bound=$bound) evicted")
    }
    // estimates are lower bounds within N/(m+1) of truth
    est.foreach { case (t, e) =>
      val c = truth(t)
      assert(e <= c, s"estimate for $t overshoots: $e > $c")
      assert(c - e <= bound + 1, s"estimate for $t off by ${c - e} > $bound")
    }
  }
}
