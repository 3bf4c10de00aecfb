package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Source/sink format surface beyond parquet+JSON (SURVEY.md §2.1): a CSV
  * sink/scan round trip, and the bucketed-table write path (S7 clustered
  * write taken to its 100 TB conclusion: both join sides pre-hashed into
  * the SAME bucket layout on the join key, so the join runs with NO
  * exchange — the co-located join every large warehouse relies on;
  * PlanSpec asserts the absence of the shuffle).
  */
object Formats {

  /** csvRoot is a FIXED path because the DuckDB oracle SQL is a static
    * string (SparkEntry contract) and must name the same files this query
    * wrote. Consequence: one Verify→oracle-compare cycle at a time —
    * interleaving runs at different SFs between the dump and the compare
    * would cross-contaminate (the driver runs them sequentially; local
    * workflows should too).
    *
    * Every OTHER side-file root below carries a per-process nonce (the
    * backbone-MV path discipline): those queries' oracles recompute from
    * the base tables, so nothing external ever needs the path — and the
    * nonce means a bench and a verify running concurrently (or a crashed
    * run's stale /tmp leftovers) can never overwrite a directory out from
    * under another process's scan mid-query. All nonce'd roots are
    * deleted by a shutdown hook; they live exactly as long as the process
    * that can read them.
    */
  val csvRoot = "/tmp/graft_csv_orders"

  private def sideRoot(tag: String): String =
    graft.ops.ArtifactRoots.register(s"graft_$tag")

  /** CSV round trip: typed write (DECIMAL money column — exact text, no
    * float-formatting drift between engines), schema'd read back (no
    * inference — FIXTURES.md rule), aggregate. The oracle reads the very
    * files this query wrote.
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".cast(DecimalType(12, 2)).as("o_totalprice"))
      .repartition(4)
      .write.mode("overwrite").option("header", "true").csv(csvRoot)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DecimalType(12, 2))))
    spark.read.schema(schema).option("header", "true").csv(csvRoot)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice").cast(DoubleType).as("sum_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus")
  }

  val csvRoundtripSql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(o_totalprice) AS DOUBLE) AS sum_price,
      |  MIN(o_orderkey) AS min_key,
      |  MAX(o_orderkey) AS max_key
      |FROM read_csv('$csvRoot/*.csv', header=true,
      |  columns={'o_orderkey': 'BIGINT', 'o_orderstatus': 'VARCHAR', 'o_totalprice': 'DECIMAL(12,2)'})
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** S7 co-located join: lineitem and orders both written `bucketBy(8,
    * key)` + sorted within buckets, pre-repartitioned so each bucket is
    * ONE file (repartition's Murmur3 hash is the bucketing hash, so task i
    * holds exactly bucket i). Reading the two tables back and joining on
    * the bucket key produces a sort-merge join with NO shuffle on either
    * side — at 100 TB this is the difference between a join that moves
    * 100 TB over the network and one that moves nothing.
    */
  /** The in-memory catalog dies with the JVM but the warehouse directory
    * survives, so a fresh session's saveAsTable hits LOCATION_ALREADY_EXISTS
    * on the previous run's files — drop the entry AND the location.
    */
  def resetTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(wh), name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resetTable(spark, "g_lineitem_bucketed")
    resetTable(spark, "g_orders_bucketed")
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .repartition(8, $"l_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("g_lineitem_bucketed")
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus")
      .repartition(8, $"o_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("g_orders_bucketed")
    spark.table("g_lineitem_bucketed")
      .join(spark.table("g_orders_bucketed"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_lines"),
        sum($"l_quantity".cast(DecimalType(12, 2))).cast(DoubleType).as("sum_qty"))
      .orderBy($"o_orderstatus")
  }

  val bucketedJoinSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  lazy val orcRoot: String = sideRoot("orc_lineitem")

  /** ORC round trip: columnar sink+scan in Spark's second native columnar
    * format. DuckDB cannot read ORC, so the oracle computes the SAME
    * aggregate from the source parquet — value equality proves the round
    * trip was lossless (timestamps, doubles-as-decimal, strings).
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate",
        $"l_quantity".cast(DecimalType(12, 2)).as("qty"))
      .repartition(4)
      .write.mode("overwrite").orc(orcRoot)
    spark.read.orc(orcRoot)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"qty").cast(DoubleType).as("sum_qty"),
        min($"l_shipdate").as("min_ship"),
        max($"l_orderkey").as("max_key"))
      .orderBy($"l_returnflag")
  }

  val orcRoundtripSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  MIN(l_shipdate) AS min_ship,
      |  MAX(l_orderkey) AS max_key
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  lazy val xmlRoot: String = sideRoot("xml_lineitem")

  /** S13 XML round trip: Spark 4's built-in XML source (rowTag records) as
    * sink+scan. Text-format discipline mirrors the CSV rule: money goes
    * through as DECIMAL (exact text), the date as DATE, and the read side
    * is explicitly schema'd (no inference scan — at 100 TB a schema
    * inference pass is a full extra read of the corpus). DuckDB cannot
    * read XML, so (like ORC) the oracle computes the SAME aggregate from
    * the source parquet — value equality proves the round trip lossless.
    */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_returnflag",
        $"l_quantity".cast(DecimalType(12, 2)).as("qty"),
        $"l_shipdate".cast(DateType).as("ship_date"))
      .repartition(4)
      .write.mode("overwrite").format("xml").option("rowTag", "line").save(xmlRoot)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_returnflag", StringType),
      StructField("qty", DecimalType(12, 2)),
      StructField("ship_date", DateType)))
    spark.read.format("xml").option("rowTag", "line").schema(schema).load(xmlRoot)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"qty").cast(DoubleType).as("sum_qty"),
        min($"ship_date").as("min_ship"),
        max($"l_orderkey").as("max_key"))
      .orderBy($"l_returnflag")
  }

  val xmlRoundtripSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  MIN(CAST(l_shipdate AS DATE)) AS min_ship,
      |  MAX(l_orderkey) AS max_key
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** S14 Z-order (Morton) clustering: interleave the low 8 bits of two
    * dimensions into one 16-bit curve key, then range-partition + sort the
    * layout on it. A single-dim sort bounds ONE column's min/max per file;
    * the Morton key bounds BOTH (a contiguous z-range of 2^2k values spans
    * ≤ 2^k per dimension), so file-level min/max stats can skip on either
    * predicate — the multi-dimensional data-skipping layout (Delta/Iceberg
    * OPTIMIZE ZORDER) for a 100 TB fact queried by two independent keys.
    * The registered query audits the curve math per z-bucket (both dims
    * provably bounded); FormatsSpec writes the actual layout and asserts
    * the per-file span bound on BOTH dimensions.
    */
  def zorderKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }

  def zorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("x", $"o_custkey" % 256L)
      .withColumn("y", date_format($"o_orderdate", "yyyyMMdd").cast(LongType) % 256L)
      .withColumn("z", zorderKey($"x", $"y"))
      .withColumn("zbucket", shiftright($"z", 12))
      .groupBy($"zbucket")
      .agg(
        count(lit(1)).as("n"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy($"zbucket")
  }

  /** The 16-term Morton interleave written out literally — identical bit
    * arithmetic in DuckDB. */
  private val zExprSql: String = (0 until 8).map { i =>
    s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
  }.mkString(" + ")

  val zorderSql: String =
    s"""WITH o AS (
      |  SELECT o_custkey % 256 AS x,
      |         CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) % 256 AS y
      |  FROM orders),
      |z AS (SELECT x, y, $zExprSql AS z FROM o)
      |SELECT z >> 12 AS zbucket, COUNT(*) AS n,
      |  MIN(x) AS min_x, MAX(x) AS max_x,
      |  MIN(y) AS min_y, MAX(y) AS max_y
      |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin

  lazy val partRoot: String = sideRoot("part_orders")

  /** S7 partitioned layout + partition pruning: orders written
    * partitionBy(o_orderstatus), then read back with a partition-key
    * filter — the scan must touch ONLY the selected directory (PlanSpec
    * asserts the PartitionFilters entry and partition count). This is the
    * reference's country/city S3 key layout (meteomatics_get_data.py:116)
    * as a measurable pruning win.
    */
  def partitionPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        $"o_totalprice".cast(DecimalType(12, 2)).as("price"), $"o_orderstatus")
      .repartition($"o_orderstatus")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(partRoot)
    spark.read.parquet(partRoot)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"price").cast(DoubleType).as("sum_price"),
        countDistinct($"o_custkey").as("n_custs"))
      .orderBy($"o_orderstatus")
  }

  val partitionPruneSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  COUNT(DISTINCT o_custkey) AS n_custs
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** S11 schema-evolution scan: two parquet batches written with DIFFERENT
    * schemas into one dataset root (batch 2 gained l_discount), read back
    * with mergeSchema=true — the data-lake reality where producers add
    * columns over time and old files must keep reading as NULL. The
    * aggregate proves column-presence semantics (count(col) counts only
    * batch-2 rows). The oracle derives the same result from the source
    * table with the batch predicate inlined.
    * 100 TB: mergeSchema=true footer-merges at planning time — cost scales
    * with file COUNT, not data; pin the merged schema in a table catalog
    * for production reads and the per-file footers aren't touched at all.
    */
  lazy val mergeRoot: String = sideRoot("merge_lineitem")

  def mergeScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    li.filter($"l_linenumber" === 1)
      .select($"l_orderkey", $"l_quantity")
      .write.mode("overwrite").parquet(s"$mergeRoot/batch=1")
    li.filter($"l_linenumber" === 2)
      .select($"l_orderkey", $"l_quantity", $"l_discount")
      .write.mode("overwrite").parquet(s"$mergeRoot/batch=2")
    spark.read.option("mergeSchema", "true").parquet(mergeRoot)
      .groupBy($"batch")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"l_discount").as("n_with_discount"),
        sum($"l_quantity".cast(DecimalType(12, 2))).cast(DoubleType).as("sum_qty"),
        sum($"l_discount".cast(DecimalType(12, 2))).cast(DoubleType).as("sum_disc"))
      .orderBy($"batch")
  }

  val mergeScanSql: String =
    """SELECT CAST(l_linenumber AS INT) AS batch, COUNT(*) AS n_rows,
      |  COUNT(CASE WHEN l_linenumber = 2 THEN l_discount END) AS n_with_discount,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CASE WHEN l_linenumber = 2 THEN CAST(l_discount AS DECIMAL(12,2)) END) AS DOUBLE) AS sum_disc
      |FROM lineitem WHERE l_linenumber IN (1, 2)
      |GROUP BY batch ORDER BY batch""".stripMargin

  /** S12 small-file compaction: the table-maintenance op every streaming
    * or per-batch ingest needs — a 64-small-file dataset rewritten into 4
    * right-sized files with one shuffle (repartition, not coalesce:
    * coalesce would skip the shuffle but chain upstream parallelism to 4
    * and can't split input files; for maintenance jobs the shuffle IS the
    * point, it rebalances). The aggregate read back from the compacted
    * layout proves content preservation; the file-count assertions live in
    * Round6Spec. 100 TB: file count → listing time, footer count, task
    * count — compaction is what keeps a 1000-batch-a-day table scannable;
    * target size via repartition(n) or spark.sql.files.maxRecordsPerFile.
    */
  lazy val compactRoot: String = sideRoot("compact_events")

  def compaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id", $"event_type", $"value")
      .repartition(64)
      .write.mode("overwrite").parquet(s"$compactRoot/small")
    spark.read.parquet(s"$compactRoot/small")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$compactRoot/compacted")
    spark.read.parquet(s"$compactRoot/compacted")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"),
        min($"event_id").as("min_id"),
        max($"event_id").as("max_id"))
      .orderBy($"event_type")
  }

  val compactionSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  MIN(event_id) AS min_id,
      |  MAX(event_id) AS max_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // FIXED like csvRoot — the S15 oracle SQL reads these very files with
  // read_parquet(union_by_name), and the DuckDB compare runs AFTER this
  // JVM exits, so the path can be neither nonce'd-and-cleaned nor
  // process-scoped (same one-Verify-cycle-at-a-time constraint)
  val evoRoot = "/tmp/graft_schema_evo"

  /** S15 schema evolution: a long-lived 100 TB table is written by MANY
    * producer versions — columns get added and retired mid-stream, and
    * the reader must see ONE coherent schema without rewriting history
    * (the reason Delta/Iceberg carry schema-evolution rules; plain
    * parquet gets the additive subset via mergeSchema). Demonstrated the
    * way it actually happens: batch 1 is the v1 producer (o_orderkey,
    * status, cents), batch 2 the v2 producer that ADDED `priority` and
    * RETIRED `status` — written to the same root, read back with
    * mergeSchema=true, so each side's missing column surfaces as NULL in
    * the unified schema. The query then does what every consumer of an
    * evolved table must: normalize the nulls explicitly (absent status →
    * 'NA', absent priority → 'NONE') and aggregate — the COALESCE
    * boundary is the operator, not an accident. The oracle reads the
    * same files with union_by_name, certifying both engines agree on the
    * unified schema AND the null semantics of absent columns.
    * 100 TB: mergeSchema costs one footer read per FILE GROUP at plan
    * time (Spark samples footers; a production table pins the merged
    * schema in a catalog instead — this operator is the no-catalog
    * fallback and the semantics are identical); the scan itself stays
    * one pass, pushdown still reaches both file generations (columns
    * absent from a file prune trivially — parquet returns nulls without
    * IO). Round13Spec pins the null-fill matrix per generation.
    */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("status"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        $"o_orderpriority".as("priority"))
    // two producer generations, one table root
    ord.filter($"k" % 2 === 0).select($"k", $"status", $"cents")
      .write.mode("overwrite").parquet(s"$evoRoot/gen=1")
    ord.filter($"k" % 2 === 1).select($"k", $"cents", $"priority")
      .write.mode("overwrite").parquet(s"$evoRoot/gen=2")
    spark.read.option("mergeSchema", "true").parquet(evoRoot)
      .select($"gen".cast("long").as("gen"),
        coalesce($"status", lit("NA")).as("status"),
        coalesce($"priority", lit("NONE")).as("priority"),
        $"cents")
      .groupBy($"gen", $"status", $"priority")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
      .orderBy($"gen", $"status", $"priority")
  }

  val schemaEvolutionSql: String =
    s"""SELECT CAST(CASE WHEN filename LIKE '%gen=1%' THEN 1 ELSE 2 END AS BIGINT) AS gen,
      |  COALESCE(status, 'NA') AS status,
      |  COALESCE(priority, 'NONE') AS priority,
      |  COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM read_parquet('$evoRoot/*/*.parquet', union_by_name=true, filename=true)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s15_schema_evolution" -> (schemaEvolution _),
    "s12_compaction"   -> (compaction _),
    "s11_merge_scan"   -> (mergeScan _),
    "csv_roundtrip"    -> (csvRoundtrip _),
    "orc_roundtrip"    -> (orcRoundtrip _),
    "xml_roundtrip"    -> (xmlRoundtrip _),
    "s14_zorder"       -> (zorder _),
    "s7_partition_prune" -> (partitionPrune _),
    "s7_bucketed_join" -> (bucketedJoin _))

  val oracles: Map[String, String] = Map(
    "s15_schema_evolution" -> schemaEvolutionSql,
    "s12_compaction"   -> compactionSql,
    "s11_merge_scan"   -> mergeScanSql,
    "csv_roundtrip"    -> csvRoundtripSql,
    "orc_roundtrip"    -> orcRoundtripSql,
    "xml_roundtrip"    -> xmlRoundtripSql,
    "s14_zorder"       -> zorderSql,
    "s7_partition_prune" -> partitionPruneSql,
    "s7_bucketed_join" -> bucketedJoinSql)
}
