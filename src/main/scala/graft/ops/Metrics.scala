package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pipeline observability via `Dataset.observe`: named data-quality
  * counters that ride the NEXT action's job — no second scan, no separate
  * validation query. This is the production form of the reference's dbt
  * schema tests (V4, `models/marts/schema.yml:9-11`): instead of
  * re-querying the table for `unique`/`not_null` after materialization,
  * the counters accumulate while the table is being written.
  *
  * Uses the Observation API (listener-backed) rather than reading
  * `queryExecution.observedMetrics` directly — the latter only reflects
  * actions executed through that exact QueryExecution, so e.g. `count()`
  * (which plans its own execution) would silently report nothing.
  *
  * At 100 TB the difference is one full table scan per check; observe
  * metrics are accumulator-backed (constant size per executor, merged on
  * the driver).
  */
object Metrics {

  /** Attach row/null-key/null-value/distinct-key counters. Run any action
    * on the returned frame (in production: the table write), then read
    * `observation.get`.
    */
  def withQualityMetrics(df: DataFrame, observation: Observation,
      keyCol: String, valueCol: String): DataFrame =
    df.observe(observation,
      count(lit(1)).as("n_rows"),
      sum(col(keyCol).isNull.cast("long")).as("n_null_keys"),
      sum(col(valueCol).isNull.cast("long")).as("n_null_values"),
      approx_count_distinct(col(keyCol)).as("apx_distinct_keys"))

  /** V6 column profiler (the deequ/dbt-docs "profile this table" surface):
    * per-column row/null/distinct counts and string-space min/max, from
    * ONE scan — columns stack into (col_name, value-as-string) rows via an
    * exploded struct array, so adding a column adds zero passes. Values
    * profile in their CAST-to-string form (min/max are string order —
    * documented, deterministic, engine-identical); timestamps and doubles
    * render identically in both engines on this data.
    * 100 TB: one scan × one shuffle on the column name (cardinality =
    * #columns); per-column distinct is the only heavy aggregate and swaps
    * to approx_count_distinct at scale (the A8 path).
    */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_shipdate")
    Tables.lineitem(spark, dir)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select($"e.col_name".as("col_name"), $"e.v".as("v"))
      .groupBy($"col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"v".isNull.cast("long")).as("n_null"),
        countDistinct($"v").as("n_distinct"),
        min($"v").as("min_str"),
        max($"v").as("max_str"))
      .orderBy($"col_name")
  }

  val profileSql: String = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_shipdate")
    val stacked = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH s AS (
       |  $stacked)
       |SELECT col_name, COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  COUNT(DISTINCT v) AS n_distinct,
       |  MIN(v) AS min_str, MAX(v) AS max_str
       |FROM s GROUP BY col_name ORDER BY col_name""".stripMargin
  }

  /** V7 declarative data-quality checks as a QUERY (the dbt `schema.yml`
    * tests the reference runs after every model build — V4 — promoted
    * from test-suite assertions to a first-class result set a pipeline
    * can sink/alert on): uniqueness, not-null, referential integrity,
    * accepted values, and a range check, each one row with its violation
    * count and verdict.
    * 100 TB: each check is one aggregate (the uniqueness check one
    * groupBy on the key, the FK check one anti-join); they share nothing
    * by design so a scheduler can run the cheap ones first and the scan
    * union stays embarrassingly parallel.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    def row(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"),
        col("n").cast("long").as("n_violations"), (col("n") === 0).as("passed"))
    val unique = row("orders.o_orderkey unique",
      orders.groupBy($"o_orderkey").agg(count(lit(1)).as("c"))
        .filter($"c" > 1).agg(count(lit(1)).as("n")))
    val notNull = row("orders.o_custkey not_null",
      orders.filter($"o_custkey".isNull).agg(count(lit(1)).as("n")))
    val fk = row("lineitem.l_orderkey references orders",
      li.join(orders.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("n")))
    val accepted = row("lineitem.l_returnflag accepted_values",
      li.filter(!$"l_returnflag".isin("R", "A", "N")).agg(count(lit(1)).as("n")))
    val range = row("lineitem.l_quantity in [1,50]",
      li.filter($"l_quantity" < 1 || $"l_quantity" > 50).agg(count(lit(1)).as("n")))
    unique.unionByName(notNull).unionByName(fk).unionByName(accepted).unionByName(range)
      .orderBy($"check_name")
  }

  val dqChecksSql: String =
    """WITH r AS (
      |  SELECT 'orders.o_orderkey unique' AS check_name,
      |    CAST((SELECT COUNT(*) FROM (
      |      SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS BIGINT)
      |      AS n_violations
      |  UNION ALL
      |  SELECT 'orders.o_custkey not_null',
      |    CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey references orders',
      |    CAST((SELECT COUNT(*) FROM lineitem
      |          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS BIGINT)
      |  UNION ALL
      |  SELECT 'lineitem.l_returnflag accepted_values',
      |    CAST((SELECT COUNT(*) FROM lineitem
      |          WHERE l_returnflag NOT IN ('R', 'A', 'N')) AS BIGINT)
      |  UNION ALL
      |  SELECT 'lineitem.l_quantity in [1,50]',
      |    CAST((SELECT COUNT(*) FROM lineitem
      |          WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT))
      |SELECT check_name, n_violations, n_violations = 0 AS passed
      |FROM r ORDER BY check_name""".stripMargin

  // ---------------------------------------------------------------------
  // V8 population stability index (PSI): the standard train/serve drift
  // check, here between the C1 split's train (md5-bucket < 80) and
  // held-out populations over the n_chars distribution. 8 equi-depth
  // bins are learned from the REFERENCE population (ntile over the
  // (value, doc_id) total order — the tie-safe A18 discipline), both
  // populations are assigned by value-vs-boundary thresholds, and each
  // bin contributes (p−q)·ln(p/q) with add-half smoothing so empty bins
  // stay finite. PSI > 0.2 is the conventional "investigate" line; the
  // per-bin terms are emitted so the alert can point at WHERE the
  // distribution moved.
  // 100 TB: boundaries are 7 longs of driver state (swap the exact ntile
  // for approx_percentile at scale — the A8/A18 path); assignment is
  // map-side threshold math; counts are one 8-group partial agg. The
  // 8-row windowed total is bin-cardinality work, never data-sized.
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucketed = Tables.documents(spark, dir)
      .withColumn("bucket", expr(ScalarFuncs.splitBucketExpr))
      .select($"doc_id", $"n_chars", ($"bucket" < 80).as("is_ref"))
    val wNt = org.apache.spark.sql.expressions.Window.orderBy($"n_chars", $"doc_id")
    val bs: Seq[Long] = bucketed.filter($"is_ref")
      .withColumn("nt", ntile(8).over(wNt))
      .groupBy($"nt").agg(max($"n_chars").as("b"))
      .filter($"nt" <= 7)
      .orderBy($"nt").select($"b").as[Long].collect().toSeq
    val assigned = bucketed.withColumn("bin",
      bs.map(v => when($"n_chars" > v, 1).otherwise(0)).reduce(_ + _) + lit(1))
    val counts = assigned.groupBy($"bin").agg(
      sum(when($"is_ref", 1L).otherwise(0L)).as("ref_cnt"),
      sum(when(!$"is_ref", 1L).otherwise(0L)).as("cur_cnt"))
    val bins = spark.range(1, 9).select($"id".cast("int").as("bin"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    bins.join(counts, Seq("bin"), "left")
      .na.fill(0, Seq("ref_cnt", "cur_cnt"))
      .withColumn("p", ($"ref_cnt" + lit(0.5)) / (sum($"ref_cnt").over(wAll) + lit(4.0)))
      .withColumn("q", ($"cur_cnt" + lit(0.5)) / (sum($"cur_cnt").over(wAll) + lit(4.0)))
      .select($"bin", $"ref_cnt", $"cur_cnt",
        round(($"p" - $"q") * log($"p" / $"q"), 6).as("psi_term"))
      .orderBy($"bin")
  }

  val psiDriftSql: String =
    s"""WITH b AS (
      |  SELECT doc_id, n_chars,
      |    ${ScalarFuncs.splitBucketSql} < 80 AS is_ref
      |  FROM documents),
      |r AS (
      |  SELECT n_chars, NTILE(8) OVER (ORDER BY n_chars, doc_id) AS nt
      |  FROM b WHERE is_ref),
      |bounds AS (SELECT nt, MAX(n_chars) AS bv FROM r WHERE nt <= 7 GROUP BY nt),
      |assigned AS (
      |  SELECT b.is_ref,
      |    1 + (SELECT CAST(COUNT(*) AS INT) FROM bounds WHERE b.n_chars > bv) AS bin
      |  FROM b),
      |cnts AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
      |    CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cur_cnt
      |  FROM assigned GROUP BY bin),
      |j AS (
      |  SELECT CAST(bins.bin AS INT) AS bin,
      |    COALESCE(ref_cnt, 0) AS ref_cnt, COALESCE(cur_cnt, 0) AS cur_cnt
      |  FROM (SELECT unnest(range(1, 9)) AS bin) bins
      |  LEFT JOIN cnts ON cnts.bin = bins.bin),
      |tot AS (SELECT SUM(ref_cnt) AS nr, SUM(cur_cnt) AS nc FROM j)
      |SELECT bin, ref_cnt, cur_cnt,
      |  round(((ref_cnt + 0.5) / (nr + 4.0) - (cur_cnt + 0.5) / (nc + 4.0))
      |    * ln(((ref_cnt + 0.5) / (nr + 4.0)) / ((cur_cnt + 0.5) / (nc + 4.0))), 6) AS psi_term
      |FROM j, tot ORDER BY bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v6_profile"   -> (profile _),
    "v7_dq_checks" -> (dqChecks _),
    "v8_psi"       -> (psiDrift _))

  val oracles: Map[String, String] = Map(
    "v6_profile"   -> profileSql,
    "v7_dq_checks" -> dqChecksSql,
    "v8_psi"       -> psiDriftSql)
}
