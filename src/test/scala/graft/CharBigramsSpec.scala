package graft

import org.apache.spark.sql.functions._

/** Native graft_char_bigrams expression: equivalence with the built-in
  * substr formulation (values AND sort order), edge cases, codegen path.
  */
class CharBigramsSpec extends SparkSpec {

  test("packed bigrams match the substr formulation 1:1 including sort order") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    val df = Seq("the cat sat", "abba", "zz yy xx").toDF("text")
    // decode the packed long back to the 2-char string; sets must agree
    val native = df.select(explode(call_function("graft_char_bigrams", $"text")).as("bg"))
      .select(concat(
        expr("char(CAST(shiftright(bg, 21) AS INT))"),
        expr("char(CAST(bg & 2097151 AS INT))")).as("s"))
    val builtin = df.select(explode(
      expr("transform(sequence(1, length(text) - 1), i -> substr(text, i, 2))")).as("s"))
    assert(native.groupBy($"s").count().except(builtin.groupBy($"s").count()).isEmpty)
    // long order == string order (tiebreak compatibility with the oracle)
    val longOrder = df.select(explode(call_function("graft_char_bigrams", $"text")).as("bg"))
      .distinct().orderBy($"bg").select(concat(
        expr("char(CAST(shiftright(bg, 21) AS INT))"),
        expr("char(CAST(bg & 2097151 AS INT))")).as("s"))
      .as[String].collect().toSeq
    val strOrder = builtin.select($"s").distinct().orderBy($"s").as[String].collect().toSeq
    assert(longOrder === strOrder)
  }

  test("short strings, empty string and null input") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    val df = Seq(Some("a"), Some(""), None).toDF("text")
      .select($"text", call_function("graft_char_bigrams", $"text").as("bg"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](1).isEmpty) // 1 char → no bigram
    assert(rows(1).getSeq[Long](1).isEmpty)
    assert(rows(2).isNullAt(1))
  }

  test("non-BMP code points: surrogate pairs stay whole, packing stays ordered") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.CharBigrams
    // "a😀b" = 3 code points (😀 = U+1F600 is a surrogate PAIR in UTF-16);
    // char-array iteration would split it into two bogus bigram halves
    val s = "a😀b"
    val got = CharBigrams.bigrams(UTF8String.fromString(s))
    val cps = Array('a'.toInt, 0x1F600, 'b'.toInt)
    assert(got.numElements() === 2)
    assert(got.getLong(0) === ((cps(0).toLong << 21) | cps(1).toLong))
    assert(got.getLong(1) === ((cps(1).toLong << 21) | cps(2).toLong))
    // order preservation across the BMP boundary: the packed longs sort in
    // code-point order (= UTF-8 byte order, what the DuckDB oracle compares)
    assert(got.getLong(0) < got.getLong(1))
  }

  test("codegen path compiles — no silent interpreted fallback") {
    import spark.implicits._
    GraftExtensions.ensure(spark)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val v = Seq("ab").toDF("text")
        .select(call_function("graft_char_bigrams", $"text").getItem(0)).head.getLong(0)
      assert(v === (('a'.toLong << 21) | 'b'.toLong))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
