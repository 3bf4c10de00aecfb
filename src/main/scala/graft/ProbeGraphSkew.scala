package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY §6.1 hot-key probe for the graph family's bipartite projection:
  * injects ONE hub customer with 2k/4k/8k synthetic suppliers into the
  * base orders/lineitem tables and times the weighted backbone
  * derivation capped (degree cap 1024) vs uncapped. Uncapped, the hub
  * alone contributes deg²/2 projection rows (32M at 8k) — the quadratic
  * stage the round-10 verdict flagged; capped, its contribution is flat
  * at cap²/2 regardless of hub degree. Replica dirs land under
  * java.io.tmpdir and are rebuilt per run.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.ProbeGraphSkew'
  */
object ProbeGraphSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = System.getProperty("java.io.tmpdir", "/tmp").stripSuffix("/")
    val orders = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val lineitem = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey")
    val Seq(maxOrd, maxCust) = orders.agg(max($"o_orderkey"), max($"o_custkey"))
      .head().toSeq.map(_.asInstanceOf[Long])
    val maxSupp = lineitem.agg(max($"l_suppkey")).head().getLong(0)

    for (h <- Seq(2000, 4000, 8000)) {
      val dir = s"$tmp/graft_gskew_$h"
      val hubOrder = Seq((maxOrd + 1, maxCust + 1)).toDF("o_orderkey", "o_custkey")
      orders.unionByName(hubOrder)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val hubItems = spark.range(h)
        .select(lit(maxOrd + 1).as("l_orderkey"), ($"id" + maxSupp + 1).as("l_suppkey"))
      lineitem.unionByName(hubItems)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

      for ((label, cap) <- Seq(("capped1024", 1024), ("uncapped", Int.MaxValue))) {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = graft.ops.Graph.deriveBackboneWeighted(spark, dir, cap).count()
          spark.catalog.clearCache()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        once() // warm
        val (t1, n) = once(); val (t2, _) = once()
        println(f"GSKEW hub=$h%d $label time=${math.min(t1, t2)}%.1f s backbone_edges=$n%d")
      }
    }
    spark.stop()
  }
}
