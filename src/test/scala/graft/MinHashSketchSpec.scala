package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MinHashSketch

/** Direct unit tests of the custom aggregate's buffer semantics —
  * the algebra partial aggregation relies on (update order and merge
  * associativity must not change the result).
  */
class MinHashSketchSpec extends AnyFunSuite {

  private val agg = MinHashSketch(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, LongType, nullable = true), numHashes = 8)
  private val P = 2147483647L

  private def bruteMin(rows: Seq[(Long, Long)]): Array[Long] =
    Array.tabulate(8)(i =>
      rows.map { case (a, b) => (a + i * b) % P }.min)

  test("update computes per-function minima; merge is elementwise min") {
    val rows = Seq((5L, 3L), (100L, 7L), (2L, 900L), (50L, 50L))
    // single buffer
    val b1 = rows.foldLeft(agg.createAggregationBuffer()) { (b, r) =>
      agg.update(b, InternalRow(r._1, r._2))
    }
    assert(b1.toSeq == bruteMin(rows).toSeq)
    // split into two partials + merge == same
    val (l, r) = rows.splitAt(2)
    val bl = l.foldLeft(agg.createAggregationBuffer())((b, x) =>
      agg.update(b, InternalRow(x._1, x._2)))
    val br = r.foldLeft(agg.createAggregationBuffer())((b, x) =>
      agg.update(b, InternalRow(x._1, x._2)))
    assert(agg.merge(bl, br).toSeq == bruteMin(rows).toSeq)
  }

  test("serialize/deserialize round-trips the buffer") {
    val b = agg.update(agg.createAggregationBuffer(), InternalRow(11L, 13L))
    assert(agg.deserialize(agg.serialize(b)).toSeq == b.toSeq)
  }

  test("null inputs are skipped") {
    val b = agg.update(agg.createAggregationBuffer(), InternalRow(null, 5L))
    assert(b.forall(_ == Long.MaxValue))
  }

  test("VectorMeanAgg: mean over updates and merged partials; null when empty") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.plans.VectorMeanAgg
    val vm = VectorMeanAgg(
      BoundReference(0, ArrayType(FloatType), nullable = true), dim = 3)
    def row(xs: Float*) = InternalRow(new GenericArrayData(xs.toArray))
    val b1 = vm.update(vm.update(vm.createAggregationBuffer(),
      row(1f, 2f, 3f)), row(3f, 4f, 5f))
    assert(vm.eval(b1).asInstanceOf[GenericArrayData].toDoubleArray().toSeq ==
      Seq(2.0, 3.0, 4.0))
    // merge of partials equals single-pass
    val bl = vm.update(vm.createAggregationBuffer(), row(1f, 2f, 3f))
    val br = vm.update(vm.createAggregationBuffer(), row(3f, 4f, 5f))
    assert(vm.eval(vm.merge(bl, br)).asInstanceOf[GenericArrayData]
      .toDoubleArray().toSeq == Seq(2.0, 3.0, 4.0))
    assert(vm.eval(vm.createAggregationBuffer()) == null)
  }
}
