package graft.plans

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[HmacSha256Hex]]; kept as a plain object so the
  * generated code can call a static-ish method. Mac instances are not
  * thread-safe, so they are cached per thread.
  */
object HmacUtil {
  private val macs = new ThreadLocal[Mac] {
    override def initialValue(): Mac = Mac.getInstance("HmacSHA256")
  }
  private val HEX = "0123456789ABCDEF".toCharArray

  def hmacHexUtf8(data: UTF8String, key: UTF8String): UTF8String = {
    val mac = macs.get()
    mac.init(new SecretKeySpec(key.getBytes, "HmacSHA256"))
    val raw = mac.doFinal(data.getBytes)
    val out = new Array[Char](raw.length * 2)
    var i = 0
    while (i < raw.length) {
      out(2 * i) = HEX((raw(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(raw(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** HMAC-SHA256 of a UTF-8 string, upper-case hex — the reference's
  * request signature (kinesis-pay.php:422-424:
  * `strtoupper(hash_hmac('SHA256', message, secret))`), as a native
  * codegen'd Catalyst expression (no UDF serialization, stays inside
  * whole-stage codegen).
  */
case class HmacSha256Hex(left: Expression, right: Expression)
    extends BinaryExpression {

  // Type guard via checkInputDataTypes(): `AbstractDataType` (needed
  // for ExpectsInputTypes.inputTypes) is private[sql] in Spark 4.1.2.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hmac_sha256_hex expects (string, string), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StringType
  override def prettyName: String = "hmac_sha256_hex"

  override protected def nullSafeEval(data: Any, key: Any): Any =
    HmacUtil.hmacHexUtf8(data.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, k) =>
      s"graft.plans.HmacUtil.hmacHexUtf8($d, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HmacSha256Hex =
    copy(left = newLeft, right = newRight)
}
