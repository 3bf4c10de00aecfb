package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files (round-16
  * optimization evidence: plans/r16/<query>_{before,after}.txt). For
  * queries with side-effectful build stages (MV refreshes, appends) the
  * dump is the FINAL result frame's physical plan — the artifact-read +
  * report shape; the build stages' plans are reasoned about in
  * OPTIMIZATION_r16.md next to their code.
  *
  * Usage: sbt 'runMain graft.ProbePlan <outdir> <suffix> q1,q2,...'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Tuning.configure(
        SparkSession.builder().master(s"local[$cpus]"), sfDir, cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plan] $name -> $outDir/${name}_$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plan] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
