package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest-guard cost probe (round-16 verdict item 1's "done" gate): is the
  * append dup-guard O(batch) as the RESIDENT index grows? The resident IVF
  * index is built over the sf corpus replicated k ∈ {1,2,4} times (distinct
  * ids), then a FIXED fresh batch (one 5% corpus slice, far-offset ids) is
  * appended twice per k:
  *
  *  - `bloomAppend`: the shipped path — the guard probes the chain's
  *    per-version IdBloom sidecars map-side; nothing is flagged, so the
  *    exact resident-id column is never scanned. Expected FLAT in k.
  *  - `exactAppend`: the same append after stripping every version's
  *    sidecar (simulating a chain written by other code) — the guard falls
  *    back to the exact resident-id scan. Expected to GROW with k; the
  *    gap between the two columns is precisely the cost the sidecars
  *    delete from the steady-state ingest bill.
  *
  * Both timings include the identical frozen-quantizer assignment + delta
  * publish, so the difference isolates the guard.
  *
  * Usage: sbt 'runMain graft.ProbeGuardScale'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeGuardScale {
  def main(args: Array[String]): Unit = {
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

    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val emb = Tables.embeddings(spark, sfDir)
    val off = emb.agg(max($"vec_id")).head().getLong(0) + 1
    for (k <- Seq(1, 2, 4)) {
      val scratch = java.nio.file.Files.createTempDirectory(s"graft_pgs_$k").toString
      try {
        (0 until k).map(j => emb.select(($"vec_id" + j * off).as("vec_id"), $"embedding"))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
        val root = llm.Embeddings.buildIvfIndex(spark, scratch, "pgs", identity)
        val nResident = graft.weather.Staging.readChain(spark, root, "cells").count()
        // the fixed fresh batch — identical content at every k, ids far
        // outside every resident range
        def batch(tagOff: Long) = emb.filter($"vec_id" % 20 === 12)
          .select(($"vec_id" + tagOff).as("vec_id"), $"embedding".as("v"))
          .withColumn("nrm", llm.Embeddings.norm($"v"))
        val nBatch = batch(100L * off).count()
        val (_, tBloom) = t(llm.Embeddings.appendIvfIndex(spark, root, batch(100L * off)))
        // strip every sidecar: the guard must fall back to the exact
        // resident-id scan (absence degrades cost, never correctness)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        for (d <- graft.weather.Staging.chainDirs(spark, root))
          fs.delete(new org.apache.hadoop.fs.Path(s"$d/idbloom"), true)
        val (_, tExact) = t(llm.Embeddings.appendIvfIndex(spark, root, batch(200L * off)))
        println(f"PROBEGUARDSCALE k=$k residentVecs=$nResident batchVecs=$nBatch " +
          f"bloomAppend=$tBloom%.2fs exactAppend=$tExact%.2fs")
      } finally {
        graft.ops.ArtifactRoots.delete(llm.Embeddings.ivfRoot(scratch, "pgs"))
        graft.ops.ArtifactRoots.delete(scratch)
      }
    }
    spark.stop()
  }
}
