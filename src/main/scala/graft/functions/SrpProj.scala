package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sign-random-projection: the 16 hyperplane projections
  * proj[h] = Σ_d w(h, d+1)·v[d] of a 64-dim embedding, in one map-side
  * pass. Weights are the engine's fixed ±1 SRP planes — w = +1 iff the
  * first hex digit of md5("h|d") is 0–7 (h ∈ 0..15, d ∈ 1..64), the
  * exact rule the DuckDB oracle replays — precomputed once at class
  * init, never shipped as data.
  *
  * Why a custom Expression (the graft_dot precedent): the declarative
  * formulation posexploded every vector into 64 rows, broadcast-joined
  * a 1024-row plane table, and partially-aggregated 16 groups per
  * vector — a 64× row amplification INTO a shuffle, per SRP consumer
  * (E3/E8/E14 and all three NSW builds share the signature step). At
  * 100 TB that shuffle is pure waste: the planes are a 1 KB constant,
  * so the signature is map-side by construction. This expression is a
  * 16×64 FMA loop inside whole-stage codegen; signatures and band
  * chunks derive from its output with zero exchanges before the
  * candidate join.
  *
  * Determinism: products accumulate in double over d ascending — a
  * fixed reassociation of the same 64 addends the old partial
  * aggregation summed in arbitrary order. Both engines already relied
  * on the sign/round(·, 6) barriers to absorb sum-order drift (the
  * rprojExpr scaladoc's contract), and the oracle gate re-certifies
  * every consumer's candidate sets bit-for-bit.
  */
case class SrpProj(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_proj requires an array<float|double> input, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SrpProj.proj(v.asInstanceOf[ArrayData], isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.SrpProj.proj($v, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SrpProj =
    copy(child = newChild)

  override def prettyName: String = "graft_srp_proj"
}

object SrpProj {
  final val Planes = 16
  final val Dims = 64

  /** w(h)(d-1) = ±1 per the md5 rule; ~1 KB, computed once per JVM. */
  private val W: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Planes) { h =>
      Array.tabulate(Dims) { d0 =>
        md.reset()
        val hex = md.digest(s"$h|${d0 + 1}".getBytes(StandardCharsets.UTF_8))
        // first hex digit = high nibble of byte 0; 0–7 → +1, 8–f → −1
        if (((hex(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    }
  }

  def proj(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = math.min(Dims, v.numElements())
    val out = new Array[Any](Planes)
    var h = 0
    while (h < Planes) {
      val w = W(h)
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += w(d) * (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d))
        d += 1
      }
      out(h) = acc
      h += 1
    }
    new GenericArrayData(out)
  }
}
