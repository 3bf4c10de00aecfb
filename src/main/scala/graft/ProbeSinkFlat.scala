package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-sink flatness probe (round-16 verdict item 6): the
  * foreachBatch ingest sinks are the deployment shape — a stream running
  * FOREVER — so per-micro-batch cost must be flat and the sinks'
  * checkpoint-and-free discipline must hold over many batches, not the
  * 3–5 a spec drives. Runs N (default 24) micro-batches through
  * `ivfIngestSink` and `pairGraphIngestSink` against a freshly built
  * resident artifact in ONE JVM, timing each processAllAvailable round
  * trip (batch rows are pre-materialized on the driver, so the timed
  * region is exactly the sink: dedup + bloom-first resident filter +
  * delta publish), then reports every per-batch time plus the
  * leaked-block count (getPersistentRDDs delta after the async listener
  * drains). Each batch carries FRESH ids/text (the steady-state CDC
  * case), so with the IdBloom sidecars the resident filter never scans
  * the growing index — a upward per-batch trend here means either that
  * contract or the checkpoint release regressed.
  *
  * Usage: sbt 'runMain graft.ProbeSinkFlat [ivf|pg|ivf,pg] [nBatches] [compactAfterDeltas]'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeSinkFlat {
  def main(args: Array[String]): Unit = {
    val families = (if (args.nonEmpty) args(0) else "ivf,pg").split(",").map(_.trim).toSeq
    val nBatches = if (args.length > 1) args(1).toInt else 24
    val compactAfter = if (args.length > 2) args(2).toInt else 0
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
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def report(family: String, ts: Seq[Double], before: Set[Int], chain: Int): Unit = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      println(f"PROBESINKFLAT family=$family batches=${ts.size} chainLen=$chain " +
        f"t=${ts.map(x => f"$x%.2f").mkString(",")} p1=${ts.head}%.2f pN=${ts.last}%.2f " +
        f"ratio=${ts.last / ts.head}%.2f leakedBlocks=${leaked.size}")
    }

    if (families.contains("ivf")) {
      val emb = Tables.embeddings(spark, sfDir)
      val off = emb.agg(max($"vec_id")).head().getLong(0) + 1
      val scratch = java.nio.file.Files.createTempDirectory("graft_psf_ivf").toString
      try {
        emb.write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
        val root = llm.Embeddings.buildIvfIndex(spark, scratch, "psf", identity)
        val slice = emb.filter($"vec_id" % 20 === 12)
          .select($"vec_id", $"embedding").collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
        // pre-materialize every batch's rows: the timed region is the sink
        val batches = (1 to nBatches).map(j => slice.map { case (id, v) => (id + j * off, v) })
        val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
        val ckpt = java.nio.file.Files.createTempDirectory("graft_psf_ivf_ck").toString
        val q = graft.streaming.EventStreams
          .ivfIngestSink(input.toDF.toDF("vec_id", "v"), root, ckpt, compactAfter)
          .start()
        try {
          // warm-up batch: JIT/codegen ramp is not the trend signal
          input.addData(batches.head: _*); q.processAllAvailable()
          val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
          val ts = batches.tail.map { b =>
            val t0 = System.nanoTime()
            input.addData(b: _*)
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e9
          }
          report("ivf", ts, before, graft.weather.Staging.chainVersions(spark, root).size)
        } finally q.stop()
      } finally {
        graft.ops.ArtifactRoots.delete(llm.Embeddings.ivfRoot(scratch, "psf"))
        graft.ops.ArtifactRoots.delete(scratch)
      }
    }

    if (families.contains("pg")) {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val off = docs.agg(max($"doc_id")).head().getLong(0) + 1
      val scratch = java.nio.file.Files.createTempDirectory("graft_psf_pg").toString
      try {
        docs.write.mode("overwrite").parquet(s"$scratch/documents.parquet")
        val root = llm.TextDedup.refreshPairGraphMv(spark, scratch)
        val slice = docs.filter($"doc_id" % 20 === 12)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        val batches = (1 to nBatches).map(j =>
          slice.map { case (id, txt) => (id + j * off, s"$txt batch$j") })
        val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
        val ckpt = java.nio.file.Files.createTempDirectory("graft_psf_pg_ck").toString
        val q = graft.streaming.EventStreams
          .pairGraphIngestSink(input.toDF.toDF("doc_id", "text"), scratch, ckpt, compactAfter)
          .start()
        try {
          input.addData(batches.head: _*); q.processAllAvailable()
          val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
          val ts = batches.tail.map { b =>
            val t0 = System.nanoTime()
            input.addData(b: _*)
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e9
          }
          report("pg", ts, before, graft.weather.Staging.chainVersions(spark, root).size)
        } finally q.stop()
      } finally {
        graft.ops.ArtifactRoots.delete(llm.TextDedup.pairGraphRoot(scratch))
        graft.ops.ArtifactRoots.delete(scratch)
      }
    }
    spark.stop()
  }
}
