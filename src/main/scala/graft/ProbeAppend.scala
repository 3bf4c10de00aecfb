package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Chain-append scaling probe: does the pair-graph MV's per-batch append
  * cost stay BATCH-sized as committed delta versions accumulate — the
  * 100 TB daily-crawl claim (per-day cost ∝ batch, full refresh is a
  * periodic compaction), measured rather than asserted. Splits the
  * corpus into a 60% resident set + 8 equal batches, refreshes the MV on
  * the resident set, then times each append plus two reader shapes after
  * it: the rewrite-shaped labels read (one dir — should stay flat) and
  * the append-shaped sigs chain read (union over 1 + N delta dirs —
  * grows by one small scan per append; the number quantifies when
  * compaction pays).
  *
  * Usage: sbt 'runMain graft.ProbeAppend'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeAppend {
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

    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val scratch = java.nio.file.Files.createTempDirectory("graft_probe_append").toString
    try {
      docs.filter($"doc_id" % 20 < 12).write.mode("overwrite")
        .parquet(s"$scratch/documents.parquet")
      val (root, tRefresh) = t(llm.TextDedup.refreshPairGraphMv(spark, scratch))
      println(f"PROBEAPPEND refresh=$tRefresh%.2fs residentDocs=${docs.filter($"doc_id" % 20 < 12).count()}")
      for (i <- 0 to 7) {
        val batch = docs.filter($"doc_id" % 20 === (12 + i))
        val n = batch.count()
        val (_, tAppend) = t(llm.TextDedup.appendPairGraphMv(spark, scratch, batch))
        val (nLabels, tLabels) = t(llm.TextDedup.componentLabels(spark, scratch).count())
        val (nSigs, tSigs) = t(
          graft.weather.Staging.readChain(spark, root, "sigs").count())
        val versions = graft.weather.Staging.chainVersions(spark, root).size
        println(f"PROBEAPPEND batch=$i docs=$n append=$tAppend%.2fs " +
          f"labelsRead=$tLabels%.2fs (n=$nLabels) sigsChainRead=$tSigs%.2fs (n=$nSigs) " +
          f"chainDirs=$versions")
      }
      // compaction: the maintenance op the slope above prices — a pure
      // artifact rewrite (no re-derivation) that resets the chain to one
      // dir; contrast tCompact with tRefresh and the post-compaction
      // sigs read with the 9-dir one
      val (_, tCompact) = t(llm.TextDedup.compactPairGraphMv(spark, scratch))
      val (nSigsC, tSigsC) = t(
        graft.weather.Staging.readChain(spark, root, "sigs").count())
      val versionsC = graft.weather.Staging.chainVersions(spark, root).size
      println(f"PROBEAPPEND compact=$tCompact%.2fs (refresh was $tRefresh%.2fs) " +
        f"sigsChainRead=$tSigsC%.2fs (n=$nSigsC) chainDirs=$versionsC")
    } finally graft.ops.ArtifactRoots.delete(scratch)
    spark.stop()
  }
}
