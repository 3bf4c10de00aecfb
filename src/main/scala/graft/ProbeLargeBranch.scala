package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 measurement of graft.ops.Tuning's LARGE-input branch (VERDICT
  * r16 item 7: "the ≥1 GiB branch has never been measured"). Synthesizes a
  * ≥1 GiB dataset by replicating the sf0.1 tables REP× with key shifts
  * that preserve join integrity (every foreign key shifts by the same
  * replica offset, so join cardinalities scale linearly — document text
  * gets a per-replica suffix token so dedup-family band joins cannot go
  * quadratic on exact clones), then runs a representative heavy subset
  * under:
  *   A. the AUTO config Tuning derives for that size (AQE ON,
  *      partitions = max(2·cpus, bytes/64 MiB), 128m advisory), vs
  *   B. the sandbox small-input values FORCED at that size (AQE OFF,
  *      9 partitions)
  * — same JVM, sessions recreated per config, warm-up + best-of-2, noop
  * sink (guide §1.4). If A beats B at this scale the production branch is
  * evidence-backed, not a guess.
  *
  * Usage: sbt 'runMain graft.ProbeLargeBranch [rep]'
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_LARGE_DIR
  *      (default /tmp/graft_large — reused if already synthesized).
  */
object ProbeLargeBranch {
  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 80
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_LARGE_DIR", "/tmp/graft_large")
    val src = "/root/testdata/sf0.1"

    def session(parts: Int, aqe: Boolean, parallelismFirst: Boolean = false): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", parallelismFirst.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      graft.GraftExtensions.ensure(s)
      s
    }

    // ---- phase 1: synthesize (idempotent via marker file) ----
    val marker = new java.io.File(s"$dir/_SYNTH_OK_$rep")
    if (!marker.exists()) {
      val sb = session(2 * cpus.toInt, aqe = true)
      try {
        val r = sb.range(0, rep).select(col("id").as("r"))
        def rep8(t: DataFrame, keys: Seq[String]): DataFrame =
          keys.foldLeft(t.crossJoin(r)) { (d, k) =>
            d.withColumn(k, col(k) + col("r") * Shift)
          }.drop("r")
        def w(df: DataFrame, name: String): Unit =
          df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
        w(rep8(Tables.lineitem(sb, src), Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
        w(rep8(Tables.orders(sb, src), Seq("o_orderkey", "o_custkey")), "orders")
        w(rep8(Tables.customer(sb, src), Seq("c_custkey")), "customer")
        w(rep8(Tables.part(sb, src), Seq("p_partkey")), "part")
        w(rep8(Tables.supplier(sb, src), Seq("s_suppkey")), "supplier")
        w(rep8(Tables.documents(sb, src), Seq("doc_id"))
          .withColumn("text", concat(col("text"), lit(" zz"), col("doc_id") % Shift)),
          "documents")
        // events: plain parquet copy of the normalized frame (micros ts);
        // per-user sessions replicate cleanly under the user_id shift
        w(rep8(Tables.events(sb, src), Seq("event_id", "user_id")), "events")
        w(Tables.nation(sb, src), "nation")
        w(Tables.region(sb, src), "region")
        w(Tables.embeddings(sb, src), "embeddings")
        marker.createNewFile(): Unit
      } finally sb.stop()
    }
    val bytes = graft.ops.Tuning.inputBytes(dir)
    val autoParts = graft.ops.Tuning.shufflePartitions(bytes, cpus.toInt)
    val autoAqe = graft.ops.Tuning.adaptiveEnabled(bytes)
    println(f"[large] dir=$dir bytes=${bytes / (1 << 20)}%d MiB -> auto parts=$autoParts aqe=$autoAqe")

    val queries = Seq("sql_tpch_q3", "sql_tpch_q18", "sql_tpch_q21",
      "w1_latest_per_key", "ev_session", "ta_tfidf")

    def run(label: String, parts: Int, aqe: Boolean, parallelismFirst: Boolean = false): Unit = {
      val s = session(parts, aqe, parallelismFirst)
      try {
        println(f"[config $label] partitions=$parts aqe=$aqe")
        queries.foreach { name =>
          val fn = SparkEntry.queries(name)
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(s, dir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          try {
            once() // warm-up
            s.catalog.clearCache()
            val a = once(); s.catalog.clearCache()
            val b = once(); s.catalog.clearCache()
            println(f"[config $label] $name%-20s best=${math.min(a, b)}%7.2f s  (passes $a%.2f / $b%.2f)")
          } catch { case e: Throwable =>
            println(s"[config $label] $name FAILED: ${e.getMessage}")
          }
        }
      } finally s.stop()
    }

    // selectable config list, e.g. SPARK_GRAFT_LARGE_CONFIGS=A2 to add a
    // single variant to an already-measured window
    val configs: Map[String, () => Unit] = Map(
      "A" -> (() => run("A-auto-large", autoParts, autoAqe)),
      // A with Spark's DEFAULT parallelismFirst=true: AQE coalescing never
      // drops below the session parallelism — the window-1 probe showed
      // parallelismFirst=false coalescing ev_session's ~0.5 GB window
      // shuffle to a handful of 128m partitions, starving 32 cores 3×
      "A2" -> (() => run("A2-auto-large-pfTrue", autoParts, autoAqe, parallelismFirst = true)),
      "B" -> (() => run("B-forced-sandbox", 9, aqe = false)))
    sys.env.getOrElse("SPARK_GRAFT_LARGE_CONFIGS", "A,A2,B").split(",").map(_.trim)
      .foreach(c => configs(c)())
  }
}
