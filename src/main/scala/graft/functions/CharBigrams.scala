package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst character-bigram extractor: `graft_char_bigrams(text)`
  * returns `array<bigint>` where element i encodes the code-point pair
  * (cp_i, cp_i+1) as `cp_i << 21 | cp_i+1` (21 bits ≥ max code point
  * 0x10FFFF, so the packing is collision-free and the LONG ordering equals
  * the lexicographic order of the 2-char substrings — tiebreaks that sort
  * by bigram stay oracle-compatible).
  *
  * Why a custom Expression (SURVEY.md §7.3 — only when profiling shows
  * need): the built-in formulation
  * `transform(sequence(1, length(text)-1), i -> substr(text, i, 2))`
  * allocates one UTF8String per CHARACTER of corpus plus an int sequence
  * array per row; at sf0.1 that explode dominated ta_langid (~3 s of its
  * 3.3 s). This expression makes one pass over the string and emits a
  * primitive long array (UnsafeArrayData, no boxing); downstream the
  * bigram is an 8-byte join/group key instead of a 2-char string.
  *
  * Null input → null. Strings shorter than 2 code points → empty array.
  */
case class CharBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_bigrams requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CharBigrams.bigrams(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharBigrams.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)

  override def prettyName: String = "graft_char_bigrams"
}

object CharBigrams {
  /** One pass: decode code points, pack adjacent pairs into longs. */
  def bigrams(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = math.max(cps.length - 1, 0)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = (cps(i).toLong << 21) | cps(i + 1).toLong
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
