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
  private final class State {
    val mac: Mac = Mac.getInstance("HmacSHA256")
    var lastKey: Array[Byte] = null
  }
  private val states = new ThreadLocal[State] {
    override def initialValue(): State = new State
  }
  private val HEX = "0123456789ABCDEF".toCharArray
  // HMAC pads the key with zeros to the block size, so the empty key
  // (which SecretKeySpec rejects) is equivalent to a zero block —
  // matches PHP hash_hmac('SHA256', ..., '').
  private val EMPTY_KEY = new Array[Byte](64)

  def hmacHexUtf8(data: UTF8String, key: UTF8String): UTF8String = {
    val st = states.get()
    val kb0 = key.getBytes
    val kb = if (kb0.length == 0) EMPTY_KEY else kb0
    // constant-key fast path: skip the per-row key schedule re-init
    if (st.lastKey == null || !java.util.Arrays.equals(st.lastKey, kb)) {
      st.mac.init(new SecretKeySpec(kb, "HmacSHA256"))
      st.lastKey = kb.clone()
    } else {
      st.mac.reset()
    }
    val raw = st.mac.doFinal(data.getBytes)
    // hex is pure ASCII, so the digit bytes ARE the UTF-8 encoding:
    // write them straight into the UTF8String buffer — one allocation,
    // no char[] -> String -> re-encode round trip on the hot path
    val out = new Array[Byte](raw.length * 2)
    var i = 0
    while (i < raw.length) {
      out(2 * i) = HEX((raw(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(raw(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
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
