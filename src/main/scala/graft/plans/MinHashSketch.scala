package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a custom imperative aggregate.
  *
  * Input per row: the two Kirsch-Mitzenmacher base hashes (h1, h2) of
  * one shingle; the buffer keeps, for each of `numHashes` derived
  * functions h_i = (h1 + i*h2) mod p, the minimum seen. Compared to a
  * 64-column `min(...)` aggregate this is ONE buffer update in a
  * tight loop — the wide-agg plan costs ~6 s of one-shot Janino
  * compilation and 64 generated buffer writes per row (measured; see
  * SURVEY §5b) — and it demonstrates the TypedImperativeAggregate
  * extension rung (the same shape an HLL or quantile sketch uses).
  *
  * Merge is element-wise min, so partial (map-side) aggregation works
  * exactly as for built-in min: the shuffle carries one `numHashes`
  * array per (doc, mapper).
  */
case class MinHashSketch(
    h1: Expression, h2: Expression, numHashes: Int = 64,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L // 2^31 - 1; h1 + 63*h2 stays << Long.Max

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    // numHashes <= 0 must fail at ANALYSIS time: a negative value
    // would crash in serialize (ByteBuffer.allocate) at shuffle time
    // with no hint the argument was bad; 0 is a useless empty sketch
    if (numHashes <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sketch expects a positive numHashes, got $numHashes")
    else if (h1.dataType == LongType && h2.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch expects (bigint, bigint), got " +
        s"(${h1.dataType.simpleString}, ${h2.dataType.simpleString})")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      // reduce mod P here so the public SQL function is safe for raw
      // full-range 64-bit hashes, not just pre-reduced callers
      // (unreduced i*y would overflow Long and yield negative mins)
      val x = Math.floorMod(a.asInstanceOf[Long], P)
      val y = Math.floorMod(b.asInstanceOf[Long], P)
      var i = 0
      while (i < numHashes) {
        val v = (x + i * y) % P
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}
