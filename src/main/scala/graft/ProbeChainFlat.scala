package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 diagnosis probe for the Round15Spec chained-artifact flatness
  * failure (driver r16 run: ivf_chain_read passes 0.37, 0.40, 0.42, 1.13,
  * 1.58 s — monotone growth past the 2.5×-min bound, the block-leak
  * signature). Reproduces the test's EXACT environment (local[4], 4
  * shuffle partitions, sf0.001, same 5-dir IVF/NSW chains) but runs many
  * more passes and records, per pass: wall seconds, persistent-RDD block
  * count, cumulative JVM GC ms, used heap, and the total job count — so a
  * real leak (monotone block/heap growth driving the slope) separates
  * from environment noise (flat blocks, isolated spikes co-located with
  * GC pauses).
  *
  * Usage: sbt 'runMain graft.ProbeChainFlat [passes]'
  */
object ProbeChainFlat {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 15
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.ensure(spark)

    def emb = Tables.embeddings(spark, sfDir)
    def vecBatch(m: Int) = emb.filter(col("vec_id") % 20 === m)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", llm.Embeddings.norm(col("v")))
    def clones(off: Long) = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + off).as("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", llm.Embeddings.norm(col("v")))

    val predF: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(col("vec_id") % 20 < 12)
    val rootI = llm.Embeddings.buildIvfIndex(spark, sfDir, "r17_flat", predF)
    for (m <- 12 to 15) llm.Embeddings.appendIvfIndex(spark, rootI, vecBatch(m))
    val rootG = llm.Embeddings.buildNswIndex(spark, sfDir, "r17flat")
    for (i <- 1 to 4) llm.Embeddings.appendNswIndex(spark, sfDir, clones(i * 1000000L), "r17flat")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def usedMb: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }

    val runs = Seq[(String, () => Long)](
      ("ivf_chain_read", () => llm.Embeddings.ivfQueryFromIndex(spark, sfDir, rootI).count()),
      ("nsw_chain_read", () => llm.Embeddings.nswQueryFromIndex(spark, sfDir, rootG).count()))
    for ((name, run) <- runs) {
      run(); spark.catalog.clearCache() // warm-up, as in the test
      val before = spark.sparkContext.getPersistentRDDs.keySet
      println(f"$name%-16s ${"pass"}%4s ${"wall_s"}%7s ${"blocks"}%7s ${"dGC_ms"}%7s ${"heap_mb"}%8s ${"jobs"}%5s")
      var lastGc = gcMs
      (1 to passes).foreach { i =>
        jobs.set(0)
        val t0 = System.nanoTime()
        run()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val g = gcMs
        val blocks = (spark.sparkContext.getPersistentRDDs.keySet -- before).size
        println(f"$name%-16s $i%4d $dt%7.3f $blocks%7d ${g - lastGc}%7d $usedMb%8d ${jobs.get}%5d")
        lastGc = g
      }
    }
    spark.stop()
  }
}
