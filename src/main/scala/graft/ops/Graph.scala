package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** G1 PageRank over the customer↔supplier trade graph — the iterative
  * graph-analytics member of the operator family (dupClusters covers
  * connected components; this covers value-propagation ranking, the
  * web-quality signal large corpus pipelines weight documents by).
  *
  * Graph: distinct (customer, supplier) trade pairs from
  * orders ⋈ lineitem, symmetrized (both directions), nodes = endpoints.
  * Three fixed damped rounds of pr(v) = 0.15/N + 0.85·Σ pr(u)/outdeg(u)
  * — symmetric edges mean no dangling nodes, and a FIXED round count
  * (no convergence test) keeps both engines on the same trajectory.
  *
  * Determinism (the w9/ta_lm_xent discipline): each edge's contribution
  * pr(u)/outdeg(u) is a deterministic IEEE division, but the per-node
  * SUM of contributions is order-dependent in float — so contributions
  * are scaled to integer nano-units with floor(+0.5) and summed as
  * exact int64; the damping update is then a fixed-order double
  * expression both engines share. Output is the top 25 by
  * (rank desc, node asc) — a total order.
  *
  * 100 TB: the edge build is one orders ⋈ lineitem shuffle + distinct;
  * each round is edges ⋈ pr (shuffle on src) + one partial-agg shuffle
  * on dst — rank state is node-sized, never driver-sized, and a longer
  * run would localCheckpoint every few rounds to cut lineage (the
  * dupClusters lesson; three unrolled rounds stay under that threshold).
  */
object Graph {

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c|"), $"o_custkey".cast("string")).as("c"),
        concat(lit("s|"), $"l_suppkey".cast("string")).as("s"))
      .distinct()
    // plain cache for the eager phase: the node-count action below would
    // CONSUME an action-scoped cache and leave the three rounds
    // recomputing the edge build; the scoped listener is attached after,
    // so the caller's single action still releases the blocks
    val edgesPlain = pairs.select($"c".as("src"), $"s".as("dst"))
      .unionByName(pairs.select($"s".as("src"), $"c".as("dst")))
      .cache()
    val out = edgesPlain.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val n = out.count() // node count: a scalar, the tfidf N precedent
    val edges = graft.ops.ScopedCache.untilConsumed(edgesPlain)
    // rank state here is dimension-sized (customers + suppliers), so it
    // BROADCASTS into each round's edge join — one partial-agg shuffle on
    // dst per round. On a graph whose node set outgrows a broadcast, drop
    // the hints: the same plan runs as a shuffle join on src.
    var pr = out.select($"src".as("node"), $"outdeg",
      (lit(1.0) / lit(n)).as("pr"))
    for (_ <- 1 to 3) {
      val contrib = edges.join(broadcast(pr), $"src" === $"node")
        .select($"dst",
          floor(($"pr" / $"outdeg") * lit(1e9) + lit(0.5)).cast("long").as("share_e9"))
        .groupBy($"dst").agg(sum($"share_e9").as("in_e9"))
      pr = contrib
        .select($"dst".as("node"),
          (lit(0.15) / lit(n) + lit(0.85) * ($"in_e9".cast("double") / lit(1e9))).as("pr"))
        .join(broadcast(out.select($"src".as("node"), $"outdeg")), Seq("node"))
        .select($"node", $"outdeg", $"pr")
    }
    pr.select($"node", $"outdeg", round($"pr", 6).as("pagerank"))
      .orderBy($"pagerank".desc, $"node".asc)
      .limit(25)
  }

  val pagerankSql: String = {
    def round_(t: Int) =
      s"""c$t AS (
         |  SELECT e.dst,
         |    SUM(CAST(floor((p.pr / p.outdeg) * 1000000000.0 + 0.5) AS BIGINT)) AS in_e9
         |  FROM edges e JOIN pr${t - 1} p ON e.src = p.node
         |  GROUP BY e.dst),
         |pr$t AS (
         |  SELECT c.dst AS node, o.outdeg,
         |    0.15 / (SELECT n FROM n) + 0.85 * (CAST(c.in_e9 AS DOUBLE) / 1000000000.0) AS pr
         |  FROM c$t c JOIN outd o ON o.src = c.dst)""".stripMargin
    """WITH pairs AS (
      |  SELECT DISTINCT 'c|' || CAST(o_custkey AS VARCHAR) AS c,
      |                  's|' || CAST(l_suppkey AS VARCHAR) AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (
      |  SELECT c AS src, s AS dst FROM pairs
      |  UNION ALL
      |  SELECT s AS src, c AS dst FROM pairs),
      |outd AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
      |n AS (SELECT COUNT(*) AS n FROM outd),
      |pr0 AS (SELECT src AS node, outdeg, 1.0 / (SELECT n FROM n) AS pr FROM outd),
      |""".stripMargin +
      (1 to 3).map(round_).mkString(",\n") + """
      |SELECT node, outdeg, round(pr, 6) AS pagerank
      |FROM pr3
      |ORDER BY pagerank DESC, node ASC
      |LIMIT 25""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> (pagerank _))

  val oracles: Map[String, String] = Map(
    "g1_pagerank" -> pagerankSql)
}
