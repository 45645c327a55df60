package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a custom imperative
  * aggregate — the constant-memory heavy-hitters sketch (Misra &
  * Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * State: at most `capacity` (token → counter) pairs. Update: an
  * already-tracked token increments; an untracked token claims a free
  * slot, or, when the summary is full, decrements EVERY counter by
  * one (evicting zeros) — the classic generalization of
  * Boyer-Moore majority voting. Merge: add counters pointwise, then
  * subtract the (capacity+1)-th largest counter from all and evict
  * non-positives, which restores the size bound while preserving the
  * error guarantee across partials.
  *
  * Guarantees (N = stream length, k = capacity): every estimate is an
  * UNDERCOUNT with `true − est ≤ N/(k+1)`, and any token with
  * `true > N/(k+1)` is guaranteed present — so with k above the
  * distinct-token count the summary degenerates to EXACT counts
  * (zero decrements ever happen), which is the regime the DuckDB
  * oracle checks; the sketch regime is property-spec'd against the
  * bound on adversarially small capacities.
  *
  * Why this shape at 100 TB: the exact alternative shuffles the FULL
  * (token, count) vocabulary (q_vocab_topk's groupBy — fine for
  * reports, wrong for a quick head-of-distribution probe over a
  * web-scale tokenizer stream). Here each map task keeps k counters,
  * partial (map-side) aggregation works exactly as for built-in
  * sum, and the shuffle to the single reducer carries one ≤k-entry
  * summary per mapper — constant in the corpus, linear in
  * parallelism.
  *
  * Output: array<struct<token, est_count>> sorted by (est desc,
  * token) — deterministic in the exact regime; in the sketch regime
  * estimates may depend on merge order, which the guarantee above
  * bounds (the spec asserts the bound, never a specific estimate).
  */
/** The Misra-Gries update/merge core, shared by the batch aggregate
  * ([[MisraGriesAgg]]) and the streaming shard step
  * ([[graft.streaming.StreamingOps.mgShardStep]]) — one definition,
  * so the two surfaces cannot drift on the decrement rule.
  */
object MisraGries {
  /** One-token update: tracked increments; untracked claims a free
    * slot or triggers the global decrement (evicting zeros).
    */
  def insert(buf: mutable.HashMap[String, Long], t: String,
      capacity: Int): Unit =
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1)
      case None if buf.size < capacity => buf.update(t, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }

  /** Pointwise-add merge, then subtract the (capacity+1)-th largest
    * counter and evict non-positives (Agarwal et al.'s mergeable rule).
    */
  def merge(buf: mutable.HashMap[String, Long],
      other: collection.Map[String, Long], capacity: Int): Unit = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      val pivot = buf.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - pivot)
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }
  }
}

case class MisraGriesAgg(
    child: Expression, capacity: Int = 256,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mg_summary"

  override def checkInputDataTypes(): TypeCheckResult =
    // a non-positive capacity must fail at ANALYSIS time (a 0-slot
    // summary silently estimates every count as 0)
    if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"mg_summary expects a positive capacity, got $capacity")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_summary expects a string token, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // the decrement path is O(k) but slow-path only — tracked
      // tokens (the heavy hitters, i.e. most of a skewed stream)
      // never enter it
      MisraGries.insert(buf, v.asInstanceOf[UTF8String].toString, capacity)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // error adds across partials but stays within N_total/(k+1)
    MisraGries.merge(buf, other, capacity)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}
