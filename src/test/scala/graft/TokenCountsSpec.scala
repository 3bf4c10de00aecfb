package graft

import org.apache.spark.sql.functions._

/** Native graft_token_counts expression: equivalence with the relational
  * explode+groupBy formulation, tokenization edge cases, codegen path.
  */
class TokenCountsSpec extends SparkSpec {

  test("counts match explode(split) → groupBy for every (doc, term)") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    val df = Tables.documents(spark, sfDir).limit(100)
    val native = df
      .select($"doc_id", explode(call_function("graft_token_counts", $"text")).as("t"))
      .select($"doc_id", $"t.term".as("term"), $"t.n".cast("long").as("c"))
    val relational = df
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
    assert(native.except(relational).isEmpty && relational.except(native).isEmpty)
  }

  test("empty tokens from doubled separators are kept, matching split semantics") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    // "a  b " splits to [a, '', b, ''] — the '' tokens must be counted
    val rows = Seq("a  b ").toDF("text")
      .select(explode(call_function("graft_token_counts", $"text")).as("t"))
      .select($"t.term", $"t.n").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows === Map("a" -> 1, "" -> 2, "b" -> 1))
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(call_function("graft_token_counts", $"text")).head
    assert(nullRow.isNullAt(0))
  }

  test("codegen path compiles — no silent interpreted fallback") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val n = Seq("x y x").toDF("text")
        .select(size(call_function("graft_token_counts", $"text"))).head.getInt(0)
      assert(n === 2)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
