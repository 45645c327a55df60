package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[NfkcNormalize]] — a plain object so the
  * generated code calls it statically (the IdnUtil/HmacUtil pattern).
  */
object NfkcUtil {
  /** Unicode NFKC normalization via the JDK's public implementation
    * (`java.text.Normalizer`, the Unicode standard annex #15
    * compatibility-composition form): full-width letters fold to
    * ASCII, ligatures decompose (`ﬁ` → `fi`), super/subscripts fold
    * to digits, combining sequences compose — the text-normalization
    * pass SentencePiece applies BEFORE training/encoding (Kudo &
    * Richardson 2018, §3: NFKC is the default normalizer) and crawl
    * curation runs so that dedup keys and tokenizer inputs don't
    * split on encoding-form accidents.
    *
    * Pure-ASCII fast path byte-scans the UTF8String and returns it
    * verbatim (NFKC is the identity on ASCII — the dominant case
    * never materializes a java.lang.String).
    */
  def nfkc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKC))
  }
}

/** NFKC normalization as a native codegen'd Catalyst expression —
  * scalar, null-intolerant, one static call per row inside
  * whole-stage codegen (the [[IdnToAscii]] discipline; a UDF here
  * would break the codegen span of every projection that uses it).
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfkc_normalize expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfkcUtil.nfkc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NfkcUtil.nfkc($s)")

  override protected def withNewChildInternal(
      newChild: Expression): NfkcNormalize = copy(child = newChild)
}
