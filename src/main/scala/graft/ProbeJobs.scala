package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query job/stage/task accounting (round-16 optimization round):
  * runs each named query once warm then once measured, with a listener
  * counting jobs, stages, tasks and summed task time. At sf0.1 the data
  * is tiny (2000 vectors / 5000 docs), so a heavy query's wall time is
  * mostly scheduling + per-job fixed cost, not compute — this probe
  * localizes WHICH of the two a query pays (wall ≫ task-time ⇒ job-count
  * bound; wall ≈ task-time/cores ⇒ compute bound) and how many actions
  * (jobs) each query path really launches, guiding job-count reduction
  * per guide §1 (measure first).
  *
  * Usage: sbt 'runMain graft.ProbeJobs q1,q2,...'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else Seq("emb_nsw_append")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Tuning.configure(
        SparkSession.builder().master(s"local[$cpus]"), sfDir, cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val verbose = sys.env.get("SPARK_GRAFT_PROBEJOBS_VERBOSE").contains("1")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobT0.put(j.jobId, (System.nanoTime(), cs))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (verbose) {
        Option(jobT0.remove(j.jobId)).foreach { case (t0, cs) =>
          println(f"  [job ${j.jobId}%4d] ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $cs")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    }
    spark.sparkContext.addSparkListener(listener)

    println(f"${"query"}%-26s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%8s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up (JIT, FS caches) — not counted
      try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$name warmup FAIL: $e") }
      spark.catalog.clearCache()
      Thread.sleep(300) // let the async listener bus drain the warm-up's events
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300)
      println(f"$name%-26s $wall%8.2f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${taskMs.get / 1000.0}%8.2f")
    }
    spark.stop()
  }
}
