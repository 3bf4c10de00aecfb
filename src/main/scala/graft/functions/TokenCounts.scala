package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document term counter: `graft_token_counts(text)` returns
  * `array<struct<term: string, n: int>>` — one entry per DISTINCT
  * whitespace token with its occurrence count, built in a single JVM pass
  * (hash map per row).
  *
  * Why a custom Expression (SURVEY.md §7.3 — only when measured): the
  * relational formulation `explode(split(text)) → groupBy(doc, term)`
  * shuffles one row per TOKEN OCCURRENCE of the corpus just to collapse
  * them back to per-doc counts — at sf0.1 a 5M-row explode and a 2M-key
  * exchange that dominated ta_tfidf. This expression emits the collapsed
  * counts map-side; the explode that follows produces the per-(doc, term)
  * relation with NO shuffle, and corpus document frequency becomes a
  * plain `count(*)` per term (each (doc, term) appears exactly once).
  *
  * Tokenization contract: `String.split(" ", -1)` — identical token
  * boundaries (including empty tokens from doubled separators) to Spark's
  * `split(text, ' ')` and DuckDB's `string_split(text, ' ')`, so oracle
  * results are unchanged. Entry order is first-occurrence (deterministic),
  * though no consumer may rely on array order. Null input → null.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenCounts.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_counts requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenCounts.counts(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_token_counts"
}

object TokenCounts {
  val outType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("n", IntegerType, nullable = false))),
    containsNull = false)

  /** One pass: split, count into an insertion-ordered map, emit rows. */
  def counts(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = new java.util.LinkedHashMap[String, Int](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      m.put(t, m.getOrDefault(t, 0) + 1)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
}
