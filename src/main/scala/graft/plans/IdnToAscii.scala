package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[IdnToAscii]] — kept as a plain object so the
  * generated code calls it statically (the HmacUtil pattern).
  */
object IdnUtil {
  /** Internationalized host → ACE (punycode) form via the JDK's
    * public IDNA implementation (`java.net.IDN.toASCII`, RFC 3490):
    * each non-ASCII label becomes its `xn--` ACE encoding, ASCII
    * labels pass through; the result lowercases (ACE output is
    * already lowercase; the fold makes mixed-case ASCII labels
    * canonical too, matching the URL canonicalizer's host rule).
    *
    * Contract edges, stated: a host that is pure ASCII short-circuits
    * verbatim (the dominant case — one byte scan, no String
    * round-trip); a host the IDNA profile REJECTS (oversize label,
    * bare `--` in positions 3-4, etc.) rides through unchanged
    * rather than nulling out — a crawl canonicalizer must never turn
    * a weird-but-present host into a silent null (the malformed
    * percent-escape precedent in pctNormalize). ALLOW_UNASSIGNED
    * keeps post-2003 Unicode from rejecting (IDNA2003's unassigned
    * set is frozen; real-web hosts use newer code points).
    */
  def toAsciiHost(host: UTF8String): UTF8String = {
    val n = host.numBytes
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if ((host.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) host
    else {
      val s = host.toString
      try UTF8String.fromString(
        java.net.IDN.toASCII(s, java.net.IDN.ALLOW_UNASSIGNED)
          .toLowerCase(java.util.Locale.ROOT))
      catch { case _: IllegalArgumentException => host }
    }
  }
}

/** IDN host folding as a native codegen'd Catalyst expression — the
  * r13 verdict's last buildable missing item (#5): without it,
  * `münchen.example` and `xn--mnchen-3ya.example` are DISTINCT
  * canonical keys, so URL-level stage-0 dedup misses every re-fetch
  * of an internationalized host that crawlers recorded in the other
  * form. Scalar, null-intolerant, stays inside whole-stage codegen
  * (one static call per row, pure-ASCII fast path byte-scans the
  * UTF8String without materializing a java.lang.String).
  */
case class IdnToAscii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"idn_to_ascii expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_to_ascii"

  override protected def nullSafeEval(host: Any): Any =
    IdnUtil.toAsciiHost(host.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.plans.IdnUtil.toAsciiHost($h)")

  override protected def withNewChildInternal(
      newChild: Expression): IdnToAscii = copy(child = newChild)
}
