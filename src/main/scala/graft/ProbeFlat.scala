package graft

import org.apache.spark.sql.SparkSession

/** Long-session flatness probe: run each query N CONSECUTIVE passes in
  * ONE JVM (construct + count + clearCache per pass, the Bench pass
  * protocol) and print every pass time plus the leaked-block count.
  * This is the deployment shape the round-12 verdict flagged — a
  * long-running service executing the same queries repeatedly — where
  * accumulated localCheckpoint blocks made passes monotonically slower
  * (emb_rproj_topk 1.75 → 6.41 → 10.09 s). The Ckpt release discipline
  * is the fix; this probe is its measurement.
  *
  * Usage: sbt 'runMain graft.ProbeFlat emb_rproj_topk,emb_knn_graph [passes]'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeFlat {
  def main(args: Array[String]): Unit = {
    val queries = (if (args.nonEmpty) args(0)
      else "emb_rproj_topk,emb_knn_graph,emb_nsw_topk,g1_pagerank").split(",").map(_.trim)
    val passes = if (args.length > 1) args(1).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warm-up so JIT/IO ramp is not billed to pass 1
    queries.foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    for (q <- queries) {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      // listener delivery is async — give releases a moment to land
      Thread.sleep(2000)
      val leaked = (spark.sparkContext.getPersistentRDDs.keySet -- baseline).size
      println(f"PROBEFLAT $q passes=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"p1=${ts.head}%.2f pN=${ts.last}%.2f ratio=${ts.last / ts.head}%.2f leakedBlocks=$leaked")
    }
    spark.stop()
  }
}
