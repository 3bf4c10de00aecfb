package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A13 incremental aggregate maintenance (materialized-view upkeep).
  *
  * The reference's pipeline recomputes its marts from staging on every
  * daily run (the SQL models under `dags/dbt/meteomatics/models/marts/`
  * are all full `table` materializations). At 100 TB a daily full recompute is the
  * single biggest avoidable cost in the whole system, so the engine
  * carries the incremental form as a first-class operator: keep a
  * MERGEABLE partial-state table (n, sum, min, max per group key) on
  * disk, fold each new batch into it with a state-sized merge, and
  * finalize (avg = sum/n etc.) only at read time.
  *
  * The demonstration processes `events` as two disjoint batches (split
  * on event_id parity — deterministic and scale-free), writes state v1,
  * merges batch 2 into state v2, and finalizes v2. The oracle is the
  * DIRECT full aggregation — passing rows+hash proves the maintained
  * state is indistinguishable from a recompute.
  *
  * 100 TB design: each batch's partial aggregation shuffles only that
  * batch (the whole point); the state merge shuffles state-sized data
  * (|groups| rows, not |events|); all four statistics are associative
  * and commutative, so merge order never matters. Statistics that do
  * NOT merge (exact median, distinct counts) are exactly the ones the
  * sketch family (A8/A10: HLL, approx percentile) exists for — their
  * mergeable partials slot into the same state-table shape.
  * Money flows as exact integer cents (Relational.scala determinism
  * rules) so state v2 equals the one-shot sums bit-for-bit.
  */
object Incremental {

  val stateRoot = "/tmp/graft_inc_state"

  private def partial(batch: DataFrame): DataFrame =
    batch.groupBy(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xc")).as("s"),
        min(col("xc")).as("mn"),
        max(col("xc")).as("mx"))

  def incAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"event_type", to_date($"ts").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("xc"))
    // batch 1 → state v1 on disk
    partial(ev.filter(pmod($"event_id", lit(2)) === 0))
      .write.mode("overwrite").parquet(s"$stateRoot/v1")
    // batch 2 folds into v1 → state v2: a state-sized merge, the batch
    // never meets historical EVENTS, only historical STATE
    spark.read.parquet(s"$stateRoot/v1")
      .unionByName(partial(ev.filter(pmod($"event_id", lit(2)) === 1)))
      .groupBy($"event_type", $"day")
      .agg(sum($"n").as("n"), sum($"s").as("s"), min($"mn").as("mn"), max($"mx").as("mx"))
      .write.mode("overwrite").parquet(s"$stateRoot/v2")
    // finalize at read time
    spark.read.parquet(s"$stateRoot/v2")
      .select($"event_type", $"day", $"n",
        round($"s" / $"n" / 100.0, 6).as("avg_value"),
        ($"mn" / 100.0).as("min_value"),
        ($"mx" / 100.0).as("max_value"))
      .orderBy($"event_type", $"day")
  }

  val incAggSql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |  round(SUM(CAST(round(value * 100) AS BIGINT)) / COUNT(*) / 100.0, 6) AS avg_value,
      |  MIN(CAST(round(value * 100) AS BIGINT)) / 100.0 AS min_value,
      |  MAX(CAST(round(value * 100) AS BIGINT)) / 100.0 AS max_value
      |FROM events
      |GROUP BY event_type, CAST(ts AS DATE)
      |ORDER BY event_type, day""".stripMargin

  /** A15 incremental JOIN maintenance (delta-join view upkeep): the join
    * view V = orders ⋈ customer is kept on disk and advanced by the
    * classic delta rule — with ΔR the new orders and ΔS the new
    * customers,
    *   V₂ = V₁ ∪ (ΔR ⋈ S_full) ∪ (R_old ⋈ ΔS)
    * (the first delta term covers ΔR⋈ΔS, the terms are disjoint because
    * R_old ∩ ΔR = ∅, so nothing double-counts). The demonstration splits
    * both sides deterministically on key parity, maintains v1 → v2, and
    * the registered query aggregates the maintained view; the oracle is
    * the direct join + aggregate, so rows+hash passing proves maintained
    * == recomputed.
    *
    * 100 TB: ΔR ⋈ S_full is the cheap direction — the fact delta is one
    * batch and the dim broadcasts. R_old ⋈ ΔS is the EXPENSIVE direction
    * (a full fact scan per dim delta — ΔS broadcasts, but the scan is
    * corpus-sized); that asymmetry is why production pipelines version
    * dims as slowly-changing rows (the SCD2 operator) instead of
    * rejoining history, and the operator keeps the term explicit rather
    * than hiding the cost. The view advance itself shuffles only
    * delta-sized data plus an append to stored state.
    */
  def incJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
    val r1 = ord.filter(pmod($"o_orderkey", lit(2)) === 0)
    val r2 = ord.filter(pmod($"o_orderkey", lit(2)) === 1)
    val s1 = cust.filter(pmod($"c_custkey", lit(2)) === 0)
    val s2 = cust.filter(pmod($"c_custkey", lit(2)) === 1)
    val cols = Seq($"o_orderkey", $"o_orderstatus", $"cents", $"c_mktsegment")
    // step 1: initial view
    r1.join(broadcast(s1), $"o_custkey" === $"c_custkey")
      .select(cols: _*)
      .write.mode("overwrite").parquet(s"$stateRoot/vj1")
    // step 2: delta advance — new facts meet the FULL dim, old facts meet
    // only the dim DELTA; the stored view is appended, never rejoined
    val delta = r2.join(broadcast(s1.unionByName(s2)), $"o_custkey" === $"c_custkey")
      .select(cols: _*)
      .unionByName(r1.join(broadcast(s2), $"o_custkey" === $"c_custkey").select(cols: _*))
    spark.read.parquet(s"$stateRoot/vj1")
      .unionByName(delta)
      .write.mode("overwrite").parquet(s"$stateRoot/vj2")
    // read the maintained view
    spark.read.parquet(s"$stateRoot/vj2")
      .groupBy($"c_mktsegment", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sc"))
      .select($"c_mktsegment", $"o_orderstatus", $"n",
        ($"sc" / 100.0).as("total_value"),
        round($"sc" / $"n" / 100.0, 6).as("avg_value"))
      .orderBy($"c_mktsegment", $"o_orderstatus")
  }

  val incJoinSql: String =
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
      |  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_value,
      |  round(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / COUNT(*) / 100.0, 6) AS avg_value
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  /** A22 CDC MERGE apply: fold an insert/update/delete changefeed into a
    * base snapshot with last-writer-wins semantics — the relational core
    * of Snowflake `MERGE` (the reference's whole incremental model,
    * `dags/dbt/meteomatics/models/staging/stg_weather_raw.sql:3-7`, is
    * this operation delegated to the warehouse) and of every Debezium/
    * Delta-CDF "apply changes" step. A13/A15 maintain AGGREGATE and JOIN
    * views; this maintains the base TABLE itself.
    *
    * Semantics certified (every branch is exercised by the Round13Spec
    * hand corpus; the derived feed below exercises all but I-on-present,
    * which its key scheme cannot produce):
    *   - per key, only the LATEST change (max seq) applies — earlier
    *     changes in the same apply window are superseded, never stacked;
    *   - D removes the key (including keys updated earlier in the window);
    *   - U carries the full new row image and UPSERTS: present key →
    *     new image TAKEN VERBATIM (a NULL image field nulls the base
    *     field out — never coalesced against stale base values), absent
    *     key → insert (a later U resurrects a key the same window
    *     deleted — the last-writer rule, not an error);
    *   - I inserts; on a present key it degrades to the same upsert rule
    *     (CDC feeds routinely replay I on existing keys after snapshots);
    *   - keys the feed never mentions pass through untouched;
    *   - D on an absent key is a no-op, not an error.
    * `action` labels each surviving row (keep/update/insert) so the
    * oracle checks the decision, not just the final image.
    *
    * The changefeed here is DERIVED deterministically from `orders` (base
    * = keys not divisible by 3; two change batches with overlapping key
    * sets — see the CASE tables, identical in both engines), so the query
    * is self-contained and scale-free.
    *
    * 100 TB: the latest-change reduction is ONE partial aggregation over
    * the changefeed (feed-sized, max_by merges associatively — never a
    * window over the base); the apply is ONE full-outer join on the key —
    * with the base in the S7b bucketed layout the base side shuffles
    * nothing, and under the S6v snapshot-pointer publish the merged
    * result becomes the next snapshot version (writers swap the pointer,
    * readers never see a half-applied feed). The base is never scanned
    * twice and no driver state exists.
    */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("status"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val base = ord.filter($"k" % 3 =!= 0)
    // batch 1: deletes on k%5=0, full-image updates on k%5=1
    val ch1 = ord.select($"k", lit(1L).as("seq"),
        when($"k" % 5 === 0, lit("D")).when($"k" % 5 === 1, lit("U")).as("op"),
        $"status".as("c_status"), ($"cents" + 1000L).as("c_cents"))
      .filter($"op".isNotNull)
    // batch 2 (later, same apply window): deletes that supersede batch-1
    // updates (k%10=1 ⊂ k%5=1), updates that resurrect batch-1 deletes
    // (k%15=0 ⊂ k%5=0) and upsert-insert absent keys (k%15=0 → k%3=0),
    // and inserts of keys outside the base (k%15=3 → k%3=0)
    val ch2 = ord.select($"k", lit(2L).as("seq"),
        when($"k" % 10 === 1, lit("D"))
          .when($"k" % 15 === 0, lit("U"))
          .when($"k" % 15 === 3, lit("I")).as("op"),
        when($"k" % 15 === 0, lit("R")).otherwise(lit("N")).as("c_status"),
        when($"k" % 15 === 0, $"cents" + 5000L).otherwise(lit(7777L)).as("c_cents"))
      .filter($"op".isNotNull)
    applyChanges(base, ch1.unionByName(ch2))
      .select($"k", $"status", ($"cents" / 100.0).as("price"), $"action")
      .orderBy($"k")
  }

  /** The MERGE kernel: base(k, status, cents) + feed(k, seq, op,
    * c_status, c_cents) → merged(k, status, cents, action). Exposed so
    * Round13Spec can drive EVERY semantic branch (including I-on-present,
    * which [[cdcMerge]]'s derived feed cannot produce) with hand-built
    * frames. seq must be unique per key (CDC log position).
    */
  private[graft] def applyChanges(base: DataFrame, ch: DataFrame): DataFrame = {
    import base.sparkSession.implicits._
    // latest change per key: seq is unique per key by contract, so
    // max(struct(seq, …)) is a deterministic argmax and partially
    // aggregates map-side — the feed never meets a ranking window.
    // Tie-break contract: if the seq-unique contract were ever violated,
    // the struct max falls through lexicographically to (op, c_status,
    // c_cents) DESC — the oracle's ROW_NUMBER window orders by the SAME
    // key chain, so both engines resolve a duplicate seq identically
    // instead of diverging silently on an engine-internal row order
    val latest = ch
      .groupBy($"k")
      .agg(max(struct($"seq", $"op", $"c_status", $"c_cents")).as("c"))
      .select($"k", $"c.op".as("op"), $"c.c_status".as("c_status"),
        $"c.c_cents".as("c_cents"))
    // presence markers, NOT value nullability: a base row may carry a
    // legitimately NULL field, and a change image may carry NULL to null
    // a field OUT — "full new row image" means the image is taken
    // verbatim when a change applies, never coalesced field-by-field
    // against the stale base values
    base.withColumn("__base", lit(1))
      .join(latest, Seq("k"), "full_outer")
      .filter($"op".isNull || $"op" =!= "D")
      .select($"k",
        when($"op".isNotNull, $"c_status").otherwise($"status").as("status"),
        when($"op".isNotNull, $"c_cents").otherwise($"cents").as("cents"),
        when($"op".isNull, lit("keep"))
          .when($"__base".isNull, lit("insert"))
          .otherwise(lit("update")).as("action"))
  }

  val cdcMergeSql: String =
    """WITH ord AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS status,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |base AS (SELECT * FROM ord WHERE k % 3 <> 0),
      |ch AS (
      |  SELECT k, 1 AS seq,
      |    CASE WHEN k % 5 = 0 THEN 'D' WHEN k % 5 = 1 THEN 'U' END AS op,
      |    status AS c_status, cents + 1000 AS c_cents
      |  FROM ord WHERE k % 5 IN (0, 1)
      |  UNION ALL
      |  SELECT k, 2 AS seq,
      |    CASE WHEN k % 10 = 1 THEN 'D'
      |         WHEN k % 15 = 0 THEN 'U'
      |         WHEN k % 15 = 3 THEN 'I' END AS op,
      |    CASE WHEN k % 15 = 0 THEN 'R' ELSE 'N' END AS c_status,
      |    CASE WHEN k % 15 = 0 THEN cents + 5000 ELSE 7777 END AS c_cents
      |  FROM ord WHERE k % 10 = 1 OR k % 15 IN (0, 3)),
      |latest AS (
      |  SELECT k, op, c_status, c_cents FROM (
      |    SELECT k, op, c_status, c_cents,
      |      ROW_NUMBER() OVER (PARTITION BY k
      |        ORDER BY seq DESC, op DESC, c_status DESC, c_cents DESC) AS rn
      |    FROM ch) r
      |  WHERE rn = 1)
      |SELECT COALESCE(b.k, l.k) AS k,
      |  CASE WHEN l.op IS NULL THEN b.status ELSE l.c_status END AS status,
      |  CASE WHEN l.op IS NULL THEN b.cents ELSE l.c_cents END / 100.0 AS price,
      |  CASE WHEN l.op IS NULL THEN 'keep'
      |       WHEN b.k IS NULL THEN 'insert'
      |       ELSE 'update' END AS action
      |FROM base b FULL OUTER JOIN latest l ON l.k = b.k
      |WHERE l.op IS NULL OR l.op <> 'D'
      |ORDER BY k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a13_inc_agg"  -> (incAgg _),
    "a15_inc_join" -> (incJoin _),
    "a22_cdc_merge" -> (cdcMerge _))

  val oracles: Map[String, String] = Map(
    "a13_inc_agg"  -> incAggSql,
    "a15_inc_join" -> incJoinSql,
    "a22_cdc_merge" -> cdcMergeSql)
}
