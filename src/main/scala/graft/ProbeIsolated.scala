package graft

/** Isolated-JVM same-commit A/B bench: runs `graft.Bench` on a query
  * subset in N FRESH JVM processes (default 2) and reports per-query
  * spread. The per-query numbers inside one suite run carry a measured
  * ±2× noise band on iterative/multi-job queries (JIT state, GC phase,
  * cache pressure from neighboring queries) — every perf claim in
  * SURVEY §6.1 is supposed to come from THIS protocol, not from
  * eyeballing two rounds' suite JSONs. Each child JVM runs the full
  * Bench methodology (warm-up pass + best-of-3) with nothing else on
  * the box, so a ratio far above the residual band (~1.3×) across
  * isolated runs is a real plan/code difference, not noise.
  *
  * Usage:
  *   sbt 'runMain graft.ProbeIsolated llm_ngram_jaccard,llm_containment [runs]'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeIsolated {
  def main(args: Array[String]): Unit = {
    val queries = if (args.nonEmpty) args(0)
      else "llm_ngram_jaccard,llm_containment,llm_simhash,emb_pq_topk"
    val runs = if (args.length > 1) args(1).toInt else 2
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    // Spark 4 on JDK 17 outside spark-submit — same list as build.sbt
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val tmp = System.getProperty("java.io.tmpdir", "/tmp").stripSuffix("/")

    def runOnce(tag: String): Map[String, Double] = {
      val out = s"$tmp/graft_probe_iso_$tag.json"
      val log = new java.io.File(s"$tmp/graft_probe_iso_$tag.log")
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", queries)
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", out)
      pb.environment().putIfAbsent("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      pb.environment().putIfAbsent("SPARK_GRAFT_CPUS", "32")
      pb.redirectOutput(log); pb.redirectErrorStream(true)
      val p = pb.start()
      val exit = p.waitFor()
      require(exit == 0, s"isolated Bench run $tag exited $exit — see $log")
      val line = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
      val body = line.substring(line.indexOf("\"queries\":{") + 11)
      val qjson = body.substring(0, body.indexOf('}'))
      """"([A-Za-z0-9_]+)":([0-9.Ee+-]+)""".r.findAllMatchIn(qjson)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }

    val results = (1 to runs).map(i => runOnce(s"r$i"))
    val names = results.head.keys.toSeq.sorted
    var worst = 1.0
    for (q <- names) {
      val ts = results.map(_.getOrElse(q, Double.NaN))
      val ratio = ts.max / ts.min
      worst = math.max(worst, ratio)
      println(f"ISO $q%-28s ${ts.map(t => f"$t%.2f").mkString(" / ")}  ratio=${ratio}%.2f")
    }
    println(f"ISO-SUMMARY runs=$runs queries=${names.size} worst_ratio=$worst%.2f")
  }
}
