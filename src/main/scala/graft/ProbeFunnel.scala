package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level diagnostic for the text-signal operators (round 11): times
  * each query under a stage listener so single-task hot stages are visible
  * (wall seconds alone hide WHERE the time goes — the documents scan is
  * one task at test SFs, so a per-row-quadratic expression shows up as one
  * multi-second 1-task stage).
  *
  * This is the probe that caught the transform-lambda re-split quadratic:
  * `transform(sequence(...), i -> ...split(text,' ')...)` re-evaluates the
  * split per element (lambda bodies are not CSE'd), so dup_frac cost was
  * O(tokens²)/doc — 3.8 s for one sf0.1 pass — and the C6/C19 8-gram
  * fingerprint had the same hazard. Both now use the native
  * graft_shingles expression (0.1–0.3 s); this probe re-measures them.
  */
object ProbeFunnel {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder.master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.add((i.stageId, dur, i.numTasks))
      }
    })
    def time(tag: String)(f: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime; f
      val wall = (System.nanoTime - t0) / 1e9
      // listener events arrive on an async bus: without a drain the
      // job's LAST stage (often the hottest one, the thing this probe
      // exists to expose) can be missing from the snapshot and later be
      // misattributed to the next tag
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      println(f"FUNNEL $tag wall=$wall%.2f s stages=${ss.size} " +
        s"top=${ss.sortBy(-_._2).take(4).map(t => s"${t._2}ms/${t._3}t").mkString(",")}")
    }
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    time("warmup")(graft.llm.Curation.curationPipeline(spark, warmDir).collect())
    // full-output consumption (collect), NOT count(): count() lets Catalyst
    // prune aggregate values, under-billing exactly the per-row signal
    // expressions this probe exists to measure
    time("cur_filter")(graft.llm.Curation.filterCorpus(spark, dir).collect())
    time("ta_repetition")(graft.llm.TextAnalysis.repetition(spark, dir).collect())
    time("cur_decontam")(graft.llm.Curation.decontaminate(spark, dir).collect())
    time("cur_pipeline")(graft.llm.Curation.curationPipeline(spark, dir).collect())
    time("cur_pipeline_2")(graft.llm.Curation.curationPipeline(spark, dir).collect())
    // the raw signal expressions, forced via sums so nothing is pruned
    val docs = Tables.documents(spark, dir).filter($"source" =!= "src0")
    time("dupfrac_scan")(docs.withColumn("d", graft.llm.TextAnalysis.dupFracCol)
      .agg(sum($"d")).collect())
    time("grams8_scan")(docs.select(explode(graft.llm.Curation.grams8Col).as("g"))
      .agg(count($"g"), countDistinct($"g")).collect())
    spark.stop()
  }
}
