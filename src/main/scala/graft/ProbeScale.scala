package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY §6.1 scaling probe: measures the dedup family on 1×/2×/4×
  * replicas of the sf0.1 `documents` table. Each extra replica appends a
  * distinguishing token, so cross-replica docs are NEAR-dups by
  * construction and dup density grows quadratically in k — the worst
  * case for a dedup pipeline. Replica dirs land under java.io.tmpdir and
  * are rebuilt on every run (cheap next to the measurements).
  *
  * Usage: sbt 'runMain graft.ProbeScale [query,query,...]'
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tmp = System.getProperty("java.io.tmpdir", "/tmp").stripSuffix("/")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // replica id offset past the real id range, so replicas can never
    // collide with base doc_ids on any corpus
    val idOff = base.agg(max($"doc_id")).head().getLong(0) + 1
    for (k <- Seq(1, 2, 4)) {
      val reps = (0 until k).map { i =>
        if (i == 0) base
        else base
          .withColumn("doc_id", $"doc_id" + lit(i * idOff))
          .withColumn("text", concat($"text", lit(s" rep$i")))
      }
      reps.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$tmp/graft_scale_${k}x/documents.parquet")
    }

    val defaults = Seq("llm_ngram_jaccard", "llm_containment",
      "llm_simhash", "llm_simhash_clusters", "llm_incr_dedup")
    val names = if (args.nonEmpty) args(0).split(",").toSeq else defaults
    for (name <- names; k <- Seq(1, 2, 4)) {
      val dir = s"$tmp/graft_scale_${k}x"
      val fn = SparkEntry.queries(name)
      // report-shaped queries (funnel retention rows, AUC, confusion
      // matrices) must be consumed via collect: count() lets Catalyst
      // prune the aggregate values themselves (the SURVEY 6.1 lesson),
      // under-billing exactly the work being measured. Their outputs are
      // bounded (<= a few hundred rows), so collect is safe; the dedup
      // defaults keep count() because their outputs are corpus-sized.
      val collectMode = sys.env.get("SPARK_GRAFT_SCALE_COLLECT").contains("1")
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = if (collectMode) fn(spark, dir).collect().length.toLong
          else fn(spark, dir).count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warm
      val (t1, n) = once(); val (t2, _) = once()
      println(f"SCALE $name ${k}x time=${math.min(t1, t2)}%.1f s rows=$n%d")
    }
    spark.stop()
  }
}
