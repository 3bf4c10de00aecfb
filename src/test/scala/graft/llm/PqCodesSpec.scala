package graft.llm

import org.apache.spark.sql.functions._

/** The native PQ encoder ([[graft.functions.PqCodes]]) against an
  * INDEPENDENT implementation of the same argmin — the higher-order-
  * function formulation it replaced, kept here as the executable spec:
  * per subspace, max by (round(dot(slice) − 0.5·|c|², 6), −cell). Every
  * corpus vector at sf0.001 must encode identically under both, for the
  * SEED codebooks (what the round-1 training encode sees) and the fully
  * trained ones — two different tie/rounding neighborhoods.
  */
class PqCodesSpec extends graft.SparkSpec {

  private val lambdaCodes: String =
    """transform(sequence(0, 7), s ->
       |  CAST(-array_max(transform(filter(cs, c -> c.s = s),
       |    c -> struct(round(graft_dot(slice(v, s * 8 + 1, 8), c.cv) - 0.5d * c.cn * c.cn, 6) AS csim,
       |                -c.cell AS negcell))).negcell AS INT))""".stripMargin

  test("native codes equal the lambda-spec codes on every corpus vector") {
    graft.GraftExtensions.ensure(spark)
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      .cache()
    try {
      // iters = 0 gives the SEED codebooks — the round-1 training encode
      // runs against exactly these, so a divergence there would silently
      // drift the trained books; both neighborhoods are pinned
      for (iters <- Seq(0, 2)) {
        val cents = Embeddings.pqCodebookSeq(e, iters)
        val books = spark.createDataset(cents).toDF("s", "cell", "cv", "cn")
        val cs = broadcast(books.agg(collect_list(struct($"s", $"cell", $"cv", $"cn")).as("cs")))
        val mismatches = e.join(cs)
          .withColumn("lambda", expr(lambdaCodes))
          .withColumn("native", Embeddings.codesCol($"v", cents))
          .filter(not($"lambda" <=> $"native"))
          .count()
        assert(mismatches === 0L, s"iters=$iters")
      }
      val cents = Embeddings.pqCodebookSeq(e)
      // and the encode plan carries NO join: the codebooks are expression
      // state, so a native encode is a bare projection over the scan
      val plan = e.withColumn("native", Embeddings.codesCol($"v", cents))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), plan.take(600))
    } finally { e.unpersist(); () }
  }
}
