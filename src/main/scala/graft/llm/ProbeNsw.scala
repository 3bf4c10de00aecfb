package graft.llm

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the E18/E20 split: isolates the NSW graph-build
  * cost from the beam-search-from-artifact cost, so the E20 amortization
  * claim is a measurement, not an estimate. Not part of the driver
  * contract.
  */
object ProbeNsw {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // register the probe root for shutdown-hook deletion UP FRONT (not a
    // normal-exit rm at the end — a thrown query would leak the nonce'd
    // dir forever, a fresh one per crashed run)
    val root = graft.ops.ArtifactRoots.register("graft_ivf_mv_nswprobe", Some(sfDir))
    try {
      // warm up JVM/IO once
      Embeddings.nswTopK(spark, sfDir).count()
      spark.catalog.clearCache()
      for (_ <- 1 to 3) {
        time("e18_build_and_query") { Embeddings.nswTopK(spark, sfDir).count() }
        spark.catalog.clearCache()
      }
      // E20 split: build+persist once, then query batches from the artifact
      val (e, q) = time("e20_corpus_frames") { Embeddings.nswFrames(spark, sfDir) }
      time("e20_build_persist_adjacency") {
        Embeddings.nswAdjacency(e)
          .repartition(4, $"src").sortWithinPartitions($"src", $"dst")
          .write.mode("overwrite").parquet(s"$root/adj")
      }
      val adj = spark.read.parquet(s"$root/adj").localCheckpoint()
      for (_ <- 1 to 3) {
        time("e20_query_from_artifact") {
          Embeddings.nswBeamSearch(e, q, adj).count()
        }
      }
    } finally {
      spark.stop()
      graft.ops.ArtifactRoots.delete(root)
    }
  }
}
