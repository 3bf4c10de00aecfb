package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Approximate/sketch aggregates — the operators that replace their exact
  * forms first when data hits 100 TB: HyperLogLog++ distinct counts
  * (approx_count_distinct), t-digest-style quantiles (approx_percentile),
  * and (in SketchSpec) count-min frequency and Bloom membership via
  * DataFrameStatFunctions.
  *
  * a8_approx's oracle is a boolean VERDICT (same pattern as a10_hll_merge):
  * sketch values are implementation-defined, so the query outputs the exact
  * answers (cross-engine comparable) plus "estimate within tolerance"
  * booleans that DuckDB asserts are TRUE — if a sketch drifts out of its
  * declared bound the hash compare fails. SketchSpec additionally pins the
  * tighter rank-based contract on the raw estimates.
  *
  * 100 TB: both sketches are fixed-size partial states merged
  * associatively — one pass, map-side partials, no per-group row
  * materialization; exactly why they displace exact distinct/percentile
  * at scale.
  */
object ApproxAggs {

  /** Raw sketch estimates — engine-defined values. Consumed by a8Approx's
    * verdict wrapper below and bound-checked against exact answers in
    * SketchSpec (5-sigma HLL rsd, percentile rank error ≤ 1/accuracy). */
  def a8Raw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct($"l_partkey", 0.02).as("apx_parts"),
        approx_count_distinct($"l_suppkey", 0.02).as("apx_supps"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("apx_p50"),
        percentile_approx($"l_extendedprice", lit(0.95), lit(10000)).as("apx_p95"))
      .orderBy($"l_returnflag")
  }

  /** Verdict form (the registered query): exact distinct counts — which
    * DuckDB reproduces — plus booleans asserting each sketch estimate sits
    * inside its declared error bound. HLL rsd=0.02 → 5σ = 10%; the
    * percentile_approx(acc=10000) value is an actual element within rank
    * 1e-4 of the target, so 5% value tolerance is generous even at the
    * tiny test SF where neighboring order statistics are far apart. */
  def a8Approx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        expr("percentile(l_extendedprice, 0.5)").as("x_p50"),
        expr("percentile(l_extendedprice, 0.95)").as("x_p95"))
    a8Raw(spark, dir).join(exact, Seq("l_returnflag"))
      .select($"l_returnflag", $"n_rows", $"n_parts", $"n_supps",
        (abs($"apx_parts" - $"n_parts") / $"n_parts" < 0.10).as("parts_within_10pct"),
        (abs($"apx_supps" - $"n_supps") / $"n_supps" < 0.10).as("supps_within_10pct"),
        (abs($"apx_p50" - $"x_p50") / $"x_p50" < 0.05).as("p50_within_5pct"),
        (abs($"apx_p95" - $"x_p95") / $"x_p95" < 0.05).as("p95_within_5pct"))
      .orderBy($"l_returnflag")
  }

  val a8ApproxSql: String =
    """SELECT l_returnflag,
      |  COUNT(*) AS n_rows,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  TRUE AS parts_within_10pct,
      |  TRUE AS supps_within_10pct,
      |  TRUE AS p50_within_5pct,
      |  TRUE AS p95_within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** A10 mergeable HLL sketches (DataSketches HllSketch): distinct
    * customers are sketched at FINE grain (priority × status), the binary
    * sketches are then hll_union_agg'd up to priority grain — no rescan of
    * the base data. This re-aggregability is the entire point at 100 TB:
    * a daily sketch table rolls up to month/year/anything in sketch-space,
    * while exact countDistinct must re-shuffle raw keys for every grain.
    *
    * Oracle trick (same as emb_quantize's fidelity check): sketch VALUES
    * are engine-defined, so the query outputs the exact count plus a
    * BOOLEAN "merged estimate within 5% of exact" verdict — DuckDB asserts
    * the exact count and `TRUE`. If the merged sketch ever drifts out of
    * tolerance the hash compare fails.
    */
  def a10HllMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fine = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sketch"))
    val merged = fine
      .groupBy($"o_orderpriority")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("est"))
    val exact = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_exact"))
    merged.join(exact, Seq("o_orderpriority"))
      .select($"o_orderpriority", $"n_exact",
        (abs($"est" - $"n_exact") / $"n_exact" < 0.05).as("within_5pct"))
      .orderBy($"o_orderpriority")
  }

  val a10HllMergeSql: String =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_exact,
      |  TRUE AS within_5pct
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** CMS bucket for (seed, key): top-8 hex chars of md5("seed|key") mod w.
    * Pure md5 arithmetic — DuckDB replays the identical sketch. */
  private def cmsBucket(seedCol: String, keyCol: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(col(seedCol).cast("string"), lit("|"),
      col(keyCol).cast("string"))), 1, 8), 16, 10).cast("long") % 64

  /** A19 Count-Min sketch, relationally: d=4 hash rows × w=64 buckets over
    * o_custkey. The sketch build is one pass — each row lands in d cells,
    * cells partial-agg map-side, and the WHOLE sketch is d×w=256 int64s
    * regardless of data size (the reason CMS displaces exact frequency
    * maps at 100 TB; it also merges across partitions/days by cell-wise
    * addition). Probes (custkey < 20) read back est = min over the d
    * cells — CMS guarantees est >= exact, surfaced as `overcount`.
    *
    * Unlike a8/a10 the oracle needs NO boolean verdict: the hash mixer is
    * md5, so DuckDB rebuilds the byte-identical sketch and the driver
    * hash-compares estimates directly.
    */
  def a19Cms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.orders(spark, dir)
      .select(explode(sequence(lit(0), lit(3))).as("seed"), $"o_custkey")
      .withColumn("bucket", cmsBucket("seed", "o_custkey"))
      .groupBy($"seed", $"bucket").agg(count(lit(1)).as("c"))
    val probes = Tables.orders(spark, dir).filter($"o_custkey" < 20)
      .groupBy($"o_custkey").agg(count(lit(1)).as("exact_cnt"))
      .select($"o_custkey", $"exact_cnt", explode(sequence(lit(0), lit(3))).as("seed"))
      .withColumn("bucket", cmsBucket("seed", "o_custkey"))
    probes.join(cells, Seq("seed", "bucket"))
      .groupBy($"o_custkey", $"exact_cnt")
      .agg(min($"c").as("cms_est"))
      .select($"o_custkey", $"exact_cnt", $"cms_est",
        ($"cms_est" - $"exact_cnt").as("overcount"))
      .orderBy($"o_custkey")
  }

  val a19CmsSql: String = {
    val bucket = (seed: String, key: String) =>
      s"""CAST(list_sum(list_transform([1,2,3,4,5,6,7,8], i ->
         |    CAST(strpos('0123456789abcdef', substr(md5(CAST($seed AS VARCHAR) || '|' || CAST($key AS VARCHAR)), i, 1)) - 1 AS BIGINT)
         |      * CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT) % 64""".stripMargin
    s"""WITH cells AS (
       |  SELECT s.seed, ${bucket("s.seed", "o_custkey")} AS bucket, COUNT(*) AS c
       |  FROM orders CROSS JOIN generate_series(0, 3) s(seed)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT o_custkey, COUNT(*) AS exact_cnt
       |  FROM orders WHERE o_custkey < 20 GROUP BY 1),
       |pb AS (
       |  SELECT p.o_custkey, p.exact_cnt, s.seed,
       |    ${bucket("s.seed", "p.o_custkey")} AS bucket
       |  FROM probes p CROSS JOIN generate_series(0, 3) s(seed))
       |SELECT pb.o_custkey, pb.exact_cnt,
       |  MIN(c.c) AS cms_est, MIN(c.c) - pb.exact_cnt AS overcount
       |FROM pb JOIN cells c ON c.seed = pb.seed AND c.bucket = pb.bucket
       |GROUP BY 1, 2
       |ORDER BY pb.o_custkey""".stripMargin
  }

  /** KMV hash value for a customer key: top-8 hex chars of md5 → uniform
    * 32-bit integer. Pure md5 arithmetic (the a19 CMS discipline) —
    * DuckDB replays the identical sketch, so estimates hash-match exactly
    * with NO boolean-verdict oracle. */
  private def kmvHash(keyCol: String): org.apache.spark.sql.Column =
    conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")

  /** A20 KMV (k-minimum-values / bottom-k) distinct sketch, k=256, over
    * customers per order priority — the mergeable distinct sketch that,
    * unlike HLL (A10), ALSO supports set intersection: keep the k
    * smallest hash values per group; est = (k−1)·2³² div max(sketch)
    * (exact when a group has < k values). Sketches merge by "union the
    * values, keep the k smallest" — the per-group sketches roll up to the
    * ALL row exactly as partition sketches roll up across executors.
    * The intersection row estimates |URGENT ∩ HIGH| as
    * cnt_both · est(union) div |union sketch| (the KMV inclusion
    * estimator: the union's k minima are a uniform sample of A ∪ B;
    * cnt_both of them lie in both sketches).
    *
    * Determinism: everything up to the estimates is distinct/min/max/count
    * over int64 hash values; the estimates are integer `div` — both
    * engines produce byte-identical rows.
    * 100 TB: a sketch is k int64s per group regardless of data size;
    * min-k partially aggregates map-side (each partition keeps its own
    * bottom-k before the tiny merge), and the group-wise sketches are the
    * unit of reuse — daily sketches union into monthly rollups without
    * touching raw data.
    */
  def a20Kmv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 256
    // estimate over columns named (nsk, hk); the literal is (k−1)·2³²
    val est =
      expr(s"CASE WHEN nsk < $k THEN nsk ELSE CAST(${(k - 1).toLong * 4294967296L}L div hk AS BIGINT) END")
    val pc = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("g"), $"o_custkey".as("ck")).distinct()
    val hv = graft.ops.ScopedCache.untilConsumed(
      pc.withColumn("hv", kmvHash("ck")))
    // bottom-k via the bounded aggregator (X2 family), NOT a ranking
    // window: each partition reduces to ≤ k longs map-side and partials
    // merge associatively — a window would shuffle every distinct hash
    // value onto the group partitions first
    val bottomK = udaf(new graft.functions.BottomKLongsAggregator(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val gsk = graft.ops.ScopedCache.untilConsumed(
      hv.groupBy($"g").agg(bottomK($"hv").as("sk"))
        .select($"g", explode($"sk").as("hv")))
    val gRows = gsk.groupBy($"g").agg(count(lit(1)).as("nsk"), max($"hv").as("hk"))
      .join(hv.groupBy($"g").agg(countDistinct($"ck").as("n_exact")), Seq("g"))
      .select($"g".as("scope"), $"n_exact", est.as("kmv_est"))
    val uRow = gsk.select($"hv").distinct().orderBy($"hv").limit(k)
      .agg(count(lit(1)).as("nsk"), max($"hv").as("hk"))
      .crossJoin(broadcast(hv.agg(countDistinct($"ck").as("n_exact"))))
      .select(lit("ALL|union").as("scope"), $"n_exact", est.as("kmv_est"))
    val ask = gsk.filter($"g" === "1-URGENT").select($"hv")
    val bsk = gsk.filter($"g" === "2-HIGH").select($"hv")
    val abStats = ask.unionByName(bsk).distinct().orderBy($"hv").limit(k)
      .join(ask.withColumn("ina", lit(1)).dropDuplicates("hv"), Seq("hv"), "left")
      .join(bsk.withColumn("inb", lit(1)).dropDuplicates("hv"), Seq("hv"), "left")
      .agg(count(lit(1)).as("nsk"), max($"hv").as("hk"),
        sum(when($"ina" === 1 && $"inb" === 1, 1L).otherwise(0L)).as("cnt_both"))
    val abExact = hv.filter($"g" === "1-URGENT").select($"ck")
      .join(hv.filter($"g" === "2-HIGH").select($"ck"), Seq("ck"), "left_semi")
      .agg(countDistinct($"ck").as("n_exact"))
    val abRow = abStats.crossJoin(broadcast(abExact))
      .select(lit("1-URGENT&2-HIGH").as("scope"), $"n_exact",
        expr("CAST((cnt_both * " +
          s"(CASE WHEN nsk < $k THEN nsk ELSE CAST(${(k - 1).toLong * 4294967296L}L div hk AS BIGINT) END)) div nsk AS BIGINT)")
          .as("kmv_est"))
    gRows.unionByName(uRow).unionByName(abRow).orderBy($"scope")
  }

  val a20KmvSql: String = {
    val hvExpr = (key: String) =>
      s"""CAST(list_sum(list_transform([1,2,3,4,5,6,7,8], i ->
         |    CAST(strpos('0123456789abcdef', substr(md5(CAST($key AS VARCHAR)), i, 1)) - 1 AS BIGINT)
         |      * CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT)""".stripMargin
    val k = 256
    val kc = (k - 1).toLong * 4294967296L
    val estExpr = (nsk: String, hk: String) =>
      s"CASE WHEN $nsk < $k THEN $nsk ELSE CAST($kc AS BIGINT) // $hk END"
    s"""WITH pc AS (SELECT DISTINCT o_orderpriority AS g, o_custkey AS ck FROM orders),
       |hv AS (SELECT g, ck, ${hvExpr("ck")} AS hv FROM pc),
       |gsk AS (
       |  SELECT g, hv FROM (
       |    SELECT g, hv, ROW_NUMBER() OVER (PARTITION BY g ORDER BY hv) AS rn
       |    FROM (SELECT DISTINCT g, hv FROM hv)) WHERE rn <= $k),
       |gest AS (SELECT g, COUNT(*) AS nsk, MAX(hv) AS hk FROM gsk GROUP BY g),
       |gexact AS (SELECT g, COUNT(DISTINCT ck) AS n_exact FROM hv GROUP BY g),
       |grows AS (
       |  SELECT g AS scope, n_exact, ${estExpr("nsk", "hk")} AS kmv_est
       |  FROM gest JOIN gexact USING (g)),
       |usk AS (SELECT DISTINCT hv FROM gsk ORDER BY hv LIMIT $k),
       |uest AS (SELECT COUNT(*) AS nsk, MAX(hv) AS hk FROM usk),
       |urow AS (
       |  SELECT 'ALL|union' AS scope,
       |    (SELECT COUNT(DISTINCT ck) FROM hv) AS n_exact,
       |    ${estExpr("nsk", "hk")} AS kmv_est
       |  FROM uest),
       |ask AS (SELECT hv FROM gsk WHERE g = '1-URGENT'),
       |bsk AS (SELECT hv FROM gsk WHERE g = '2-HIGH'),
       |absk AS (
       |  SELECT DISTINCT hv FROM (SELECT hv FROM ask UNION ALL SELECT hv FROM bsk)
       |  ORDER BY hv LIMIT $k),
       |abstats AS (
       |  SELECT COUNT(*) AS nsk, MAX(hv) AS hk,
       |    CAST(SUM(CASE WHEN hv IN (SELECT hv FROM ask)
       |                   AND hv IN (SELECT hv FROM bsk) THEN 1 ELSE 0 END) AS BIGINT) AS cnt_both
       |  FROM absk),
       |abexact AS (
       |  SELECT COUNT(DISTINCT a.ck) AS n_exact
       |  FROM (SELECT ck FROM hv WHERE g = '1-URGENT') a
       |  JOIN (SELECT ck FROM hv WHERE g = '2-HIGH') b ON b.ck = a.ck),
       |abrow AS (
       |  SELECT '1-URGENT&2-HIGH' AS scope, abexact.n_exact,
       |    CAST((cnt_both * (${estExpr("nsk", "hk")})) // nsk AS BIGINT) AS kmv_est
       |  FROM abstats CROSS JOIN abexact)
       |SELECT scope, n_exact, kmv_est FROM grows
       |UNION ALL SELECT scope, n_exact, kmv_est FROM urow
       |UNION ALL SELECT scope, n_exact, kmv_est FROM abrow
       |ORDER BY scope""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a8_approx"     -> (a8Approx _),
    "a10_hll_merge" -> (a10HllMerge _),
    "a19_cms"       -> (a19Cms _),
    "a20_kmv"       -> (a20Kmv _))

  /** a8/a10 use boolean-verdict oracles (sketch values are engine-
    * defined); a19's md5-built CMS is replayed exactly — full hash match. */
  val oracles: Map[String, String] = Map(
    "a8_approx"     -> a8ApproxSql,
    "a10_hll_merge" -> a10HllMergeSql,
    "a19_cms"       -> a19CmsSql,
    "a20_kmv"       -> a20KmvSql)
}
