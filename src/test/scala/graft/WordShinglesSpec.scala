package graft

import org.apache.spark.sql.functions._

/** Native graft_shingles expression: equivalence with the built-in
  * transform+concat_ws+array_distinct formulation, edges, codegen path.
  */
class WordShinglesSpec extends SparkSpec {

  test("shingles match the built-in formulation 1:1 including distinct order") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    val df = Tables.documents(spark, sfDir).limit(100)
      .filter(size(split($"text", " ")) >= 3)
    val native = df.select($"doc_id",
      call_function("graft_shingles", $"text", lit(3)).as("sh"))
    val builtin = df.select($"doc_id",
      array_distinct(transform(
        sequence(lit(1), size(split($"text", " ")) - 2), i =>
          concat_ws(" ",
            element_at(split($"text", " "), i),
            element_at(split($"text", " "), i + 1),
            element_at(split($"text", " "), i + 2)))).as("sh"))
    // arrays compared element-wise: first-occurrence order must also agree
    assert(native.except(builtin).isEmpty && builtin.except(native).isEmpty)
  }

  test("short, empty-token and null inputs") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    val rows = Seq(Some("a b"), Some("a  b c"), None).toDF("text")
      .select(call_function("graft_shingles", $"text", lit(3)).as("sh")).collect()
    assert(rows(0).getSeq[String](0).isEmpty)              // 2 tokens < k
    assert(rows(1).getSeq[String](0) === Seq("a  b", " b c")) // empty token kept
    assert(rows(2).isNullAt(0))
  }

  test("codegen path compiles — no silent interpreted fallback") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val sh = Seq("x y z x y z x y").toDF("text")
        .select(call_function("graft_shingles", $"text", lit(3))).head.getSeq[String](0)
      assert(sh === Seq("x y z", "y z x", "z x y"))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
