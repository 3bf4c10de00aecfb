package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Append-path density probe (round-15 verdict item): is the per-batch
  * cost of the two non-trivial chain appends — appendPairGraphMv (LSH
  * probe + verify + relabel) and appendNswIndex (insert beam + batch
  * self-kNN) — BATCH-sized rather than corpus- or candidate²-sized when
  * duplicate density grows? Each batch is a fixed 5% slice of the sf0.1
  * corpus replicated k ∈ {1,2,4} times (fresh ids; text/vectors are
  * near-dups of resident rows AND of each other, the worst case: every
  * replica collides in the same LSH bands / SRP buckets, so candidate
  * density grows ~quadratically in k while batch size grows linearly).
  * A batch-sized append shows time ~linear in k; a candidate² blow-up
  * shows ~k². The resident artifact is rebuilt per k in its own scratch
  * dir so every measurement starts from an identical one-version chain.
  *
  * Usage: sbt 'runMain graft.ProbeAppendScale [pg|nsw|pg,nsw]'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeAppendScale {
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

    val families =
      if (args.nonEmpty) args(0).split(",").toSeq else Seq("pg", "nsw")

    if (families.contains("pg")) {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val idOff = docs.agg(max($"doc_id")).head().getLong(0) + 1
      val slice = docs.filter($"doc_id" % 20 === 12)
      for (k <- Seq(1, 2, 4)) {
        val scratch = java.nio.file.Files.createTempDirectory(s"graft_pas_pg_$k").toString
        try {
          docs.write.mode("overwrite").parquet(s"$scratch/documents.parquet")
          val (root, tRefresh) = t(llm.TextDedup.refreshPairGraphMv(spark, scratch))
          val batch = (1 to k).map { j =>
            slice.select(($"doc_id" + j * idOff).as("doc_id"),
              concat($"text", lit(s" rep$j")).as("text"))
          }.reduce(_ unionByName _)
          val n = batch.count()
          val (_, tAppend) = t(llm.TextDedup.appendPairGraphMv(spark, scratch, batch))
          val nPairs = graft.weather.Staging
            .readChainIn(spark,
              Seq(graft.weather.Staging.chainDirs(spark, root).last), "pairs").count()
          println(f"PROBEAPPENDSCALE family=pg k=$k batchDocs=$n append=$tAppend%.2fs " +
            f"deltaPairs=$nPairs refresh=$tRefresh%.2fs")
        } finally {
          // the MV root is a separate /tmp tree (registered for the
          // shutdown hook, but 6 corpus-scale artifacts accumulating for
          // the probe's lifetime is real disk pressure at larger SF)
          graft.ops.ArtifactRoots.delete(llm.TextDedup.pairGraphRoot(scratch))
          graft.ops.ArtifactRoots.delete(scratch)
        }
      }
    }

    if (families.contains("nsw")) {
      val emb = Tables.embeddings(spark, sfDir)
      val idOff = emb.agg(max($"vec_id")).head().getLong(0) + 1
      for (k <- Seq(1, 2, 4)) {
        val scratch = java.nio.file.Files.createTempDirectory(s"graft_pas_nsw_$k").toString
        try {
          emb.write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
          val (root, tBuild) = t(llm.Embeddings.buildNswIndex(spark, scratch))
          val batch = (1 to k).map { j =>
            emb.filter($"vec_id" % 20 === 12)
              .select(($"vec_id" + j * idOff).as("vec_id"), $"embedding".as("v"))
          }.reduce(_ unionByName _)
            // the ONE shared stored-norm expression — hand-rolling it
            // here could silently diverge from what the index stores
            .withColumn("nrm", llm.Embeddings.norm($"v"))
          val n = batch.count()
          val (_, tAppend) = t(llm.Embeddings.appendNswIndex(spark, scratch, batch))
          val nEdges = graft.weather.Staging
            .readChainIn(spark,
              Seq(graft.weather.Staging.chainDirs(spark, root).last), "adj").count()
          println(f"PROBEAPPENDSCALE family=nsw k=$k batchVecs=$n append=$tAppend%.2fs " +
            f"deltaEdges=$nEdges build=$tBuild%.2fs")
        } finally {
          graft.ops.ArtifactRoots.delete(llm.Embeddings.nswRoot(scratch))
          graft.ops.ArtifactRoots.delete(scratch)
        }
      }
    }
    spark.stop()
  }
}
