package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selector: `graft_winnow_fps(text)` returns
  * the distinct selected fingerprints of the Schleimer/Wilkerson/Aiken
  * scheme (k=4 token-grams, window w=4, rightmost-min robust winnowing)
  * in one JVM pass — the T20 per-doc selection as a codegen-friendly
  * scalar (generated code calls [[WinnowFps.fps]] on the row).
  *
  * Why a custom Expression (the §7.3 measured-need rule, PqCodes/X24
  * precedent): the SQL-lambda form pays interpreted HOF machinery per
  * WINDOW — a slice+reverse+array_min+array_position allocation chain
  * per position — and is a re-evaluation hazard besides (the hs-binding
  * lesson in the T20 scaladoc). This loop hashes each 4-gram once and
  * scans each window in place; isolated A/B at sf0.1: `ta_winnow`
  * 6.6 → 1.1 s with the SAME oracle hashes.
  *
  * Bit-compatibility (pinned by Round13Spec native == lambda on every
  * corpus doc, and by the unchanged `ta_winnow` oracle):
  *  - tokens = `split(text, ' ')` semantics (Java regex split, limit −1);
  *  - hash = first 8 hex chars of lowercase md5 of the space-joined
  *    4-gram's UTF-8 bytes, parsed base-16 — i.e. the digest's first 4
  *    bytes as an unsigned big-endian int (what
  *    `conv(substr(md5(g), 1, 8), 16, 10)` computes);
  *  - rightmost minimum per window (a `<=` left-to-right scan lands on
  *    the right of equal minima, exactly the reverse+array_position
  *    form), positions deduped first-occurrence, then VALUES deduped in
  *    that position order;
  *  - fewer than 7 tokens (no full window) → empty array; null → null.
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps requires a string input, got ${t.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    WinnowFps.fps(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WinnowFps.fps($s)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_fps"
}

object WinnowFps {
  // MessageDigest is reusable via reset() but not thread-safe: hold one
  // per executor thread instead of allocating digest+builder per ROW —
  // this expression sits on the per-document hot path it was created to
  // optimize, and per-row allocation is pure GC pressure at corpus scale
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val tlSb = ThreadLocal.withInitial[java.lang.StringBuilder](
    () => new java.lang.StringBuilder)

  def fps(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    if (n < 7) return new GenericArrayData(Array.empty[Any])
    val ng = n - 3
    val hs = new Array[Long](ng)
    val md = tlMd.get()
    val sb = tlSb.get()
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2)).append(' ').append(toks(i + 3))
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // the thread-local builder never shrinks on its own: one
    // pathologically long token run would pin that capacity per executor
    // thread for the JVM lifetime (32 copies in a long-lived local[32]
    // session) — drop the oversized buffer, keep hot-path reuse for
    // typical documents
    if (sb.capacity() > 65536) tlSb.remove()
    // rightmost min per w=4 window; positions deduped in first-occurrence
    // order, then values deduped in that order
    val seenPos = new Array[Boolean](ng)
    val out = new java.util.LinkedHashSet[java.lang.Long]
    var sw = 0
    while (sw + 4 <= ng) {
      var minV = hs(sw); var minJ = sw
      var j = sw + 1
      while (j < sw + 4) {
        if (hs(j) <= minV) { minV = hs(j); minJ = j }
        j += 1
      }
      if (!seenPos(minJ)) {
        seenPos(minJ) = true
        out.add(hs(minJ)): Unit
      }
      sw += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(arr)
  }
}
