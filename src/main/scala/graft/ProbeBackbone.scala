package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the co-purchase backbone derivation — the shared
  * fixed cost every derive-mode graph kernel pays (~3–4 s of each g1–g8
  * run at sf0.1). Splits the derivation into its stages and prints the
  * physical plan of the bipartite pair join so broadcast decisions are a
  * fact, not an assumption. Not part of the driver contract.
  */
object ProbeBackbone {
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
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val pairs = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("s"))
    println("=== bipartite pair join plan ===")
    pairs.explain("formatted")
    // warm IO/JIT
    graft.ops.Graph.backboneEdges(spark, sfDir).count()
    for (_ <- 1 to 3) {
      time("bipartite_pairs_count") { pairs.count() }
      val w = time("wedge_agg_count") {
        val wp = graft.ops.Graph.wedgePairs(pairs, graft.ops.Graph.DefaultDegreeCap)
          .groupBy($"u", $"v").agg(count(lit(1)).as("shared"))
        wp.count()
      }
      time("full_backbone_derive") {
        graft.ops.Graph.backboneEdges(spark, sfDir).count()
      }
      println(s"PROBE wedge_rows $w")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
