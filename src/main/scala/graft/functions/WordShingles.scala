package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-k-gram shingler: `graft_shingles(text, k)` returns
  * the DISTINCT space-joined k-grams of the whitespace tokens, first-
  * occurrence order, in one JVM pass (single StringBuilder + hash set).
  *
  * Why a custom Expression (SURVEY.md §7.3 — only when measured): the
  * built-in formulation
  * `array_distinct(transform(sequence(1, n-k+1), i -> concat_ws(" ", t[i..i+k-1])))`
  * allocates a token array, an index array, one string per POSITION, and
  * then deduplicates — the dominant map-side cost of the n-gram/minhash
  * dedup family. Semantics are identical (same token boundaries as
  * `split(text, ' ')`, same join separator, same first-occurrence distinct
  * order), so oracle results are unchanged. Fewer than k tokens → empty
  * array; null text → null.
  */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires (string, int) inputs, got ${l.sql} and ${r.sql}")
  }

  override def nullSafeEval(s: Any, k: Any): Any =
    WordShingles.shingles(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.functions.WordShingles.shingles($s, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingles"
}

object WordShingles {
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (k <= 0 || toks.length < k) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
