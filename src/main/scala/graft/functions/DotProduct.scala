package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays (float or double
  * elements, mixed allowed), accumulating in double with a sequential
  * left-to-right sum.
  *
  * Why a custom Expression (SURVEY.md §7.3 "only if profiling shows
  * need"): the built-in formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`
  * allocates an intermediate array per row and evaluates two lambda
  * closures per element; on the embedding queries (64-dim vectors, up to
  * ~500k candidate pairs at sf0.1) that is the dominant cost. This
  * expression is a tight codegen'd loop over the underlying ArrayData —
  * no allocation, no virtual calls — and stays inside whole-stage codegen.
  *
  * Semantics match the built-in formulation exactly: per-element double
  * products, summed left to right (same float→double widening, same
  * order), so DuckDB-oracle results are unchanged. Length mismatch takes
  * the common prefix (zip_with would null-pad; vectors here are fixed
  * 64-dim so the case never arises). Null input → null; null ELEMENTS are
  * not supported (embedding vectors are dense).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float|double> inputs, got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left).contains(FloatType)) "getFloat" else "getDouble"
    val getR = if (elemType(right).contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
