package graft.llm

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Scratch profiler for emb_ivf_topk: isolates Lloyd training cost from
  * the probe/search phase. Not part of the driver contract.
  */
object ProbeIvf {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm up the JVM/IO once
    Embeddings.ivfTopK(spark, sfDir).count()
    spark.catalog.clearCache()
    for (_ <- 1 to 3) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val e = Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding".as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val cents = time("lloyd") { Embeddings.lloydCentroids(e, 10, 5) }
      time("full_query") { Embeddings.ivfTopK(spark, sfDir).count() }
      spark.catalog.clearCache()
      val _ = cents
    }
    // E16 amortization: the persisted index pays the build once; each
    // subsequent query batch is router-collect + pruned-cells scan only.
    // Built WITHOUT the % 10 === 7 slice so the E17 step below appends a
    // genuinely new batch — the ingest guard rejects resident vec_ids.
    val root = time("e16_build_index") {
      import spark.implicits._
      Embeddings.buildIvfIndex(spark, sfDir, "probe", _.filter($"vec_id" % 10 =!= 7))
    }
    for (_ <- 1 to 3) {
      time("e16_query_from_index") {
        Embeddings.ivfQueryFromIndex(spark, sfDir, root).count()
      }
    }
    // E17 routing cost for a 10% batch against the frozen quantizer
    {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val batch = Tables.embeddings(spark, sfDir).filter($"vec_id" % 10 === 7)
        .select($"vec_id", $"embedding".as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      time("e17_append_batch") { Embeddings.appendIvfIndex(spark, root, batch) }
    }
    spark.stop()
  }
}
