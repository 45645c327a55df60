package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[DeflateLen]]. Deflater instances hold native
  * zlib state and are not thread-safe → cached per thread and reset
  * between rows (allocation-free hot path; `end()` is deliberately
  * never called — the thread-local lives as long as the executor
  * thread, the same lifetime its native buffers would want anyway).
  */
object DeflateUtil {
  private val LEVEL = 6 // zlib default: the ratio SIGNAL, not max compression
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(LEVEL)
  }
  // scratch output buffer: compressed length is all we keep, so one
  // bounded buffer per thread absorbs every chunk
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  def deflatedLen(data: UTF8String): Long = {
    val d = deflaters.get()
    val buf = buffers.get()
    d.reset()
    d.setInput(data.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** Length in bytes of the zlib-deflated UTF-8 text — the
  * compression-ratio quality signal modern pretraining filters use
  * (highly compressible ⇒ repetitive/templated, incompressible ⇒
  * likely binary junk or high-entropy noise; both tails are cut).
  * A native codegen'd expression (no UDF serialization, stays inside
  * whole-stage codegen); the JDK's zlib means zero new dependencies.
  * Only the LENGTH crosses the row boundary — the compressed bytes
  * themselves die in a per-thread scratch buffer.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(data: Any): Any =
    DeflateUtil.deflatedLen(data.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.plans.DeflateUtil.deflatedLen($d)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
