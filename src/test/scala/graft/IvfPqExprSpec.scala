package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** The r14-opt native IVF/PQ loop kernels (top_cells / pq_codes /
  * pq_lut, graft.plans.IvfPq) must be BIT-IDENTICAL to the unrolled
  * expression forms they replaced — same DotUtil accumulation, same
  * SQLOrderingUtil double ordering (-0.0 == 0.0, NaN largest), same
  * tie directions, same null-embedding propagation. This spec rebuilds
  * the ORIGINAL unrolled forms inline and compares row-for-row over a
  * fixture that includes every degenerate shape the old forms had
  * defined behavior for: null vector, wrong dimension, null element,
  * NaN element, zero vector, exact ties.
  */
class IvfPqExprSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 4
  // centroids deliberately include an exact duplicate (tie on every
  // input) so the tie direction is exercised on every row
  private val cents: IndexedSeq[IndexedSeq[Float]] = IndexedSeq(
    IndexedSeq(1f, 0f, 0f, 0f),
    IndexedSeq(0f, 1f, 0f, 0f),
    IndexedSeq(0f, 1f, 0f, 0f),
    IndexedSeq(0.5f, 0.5f, 0.5f, 0.5f),
    IndexedSeq(-1f, 0f, 0f, 0f))
  // m=2 subspaces of ds=2, kCodes=3, with a duplicated codeword tie
  private val books: IndexedSeq[IndexedSeq[IndexedSeq[Float]]] = IndexedSeq(
    IndexedSeq(IndexedSeq(1f, 0f), IndexedSeq(0f, 1f), IndexedSeq(0f, 1f)),
    IndexedSeq(IndexedSeq(0.3f, -0.7f), IndexedSeq(0.3f, -0.7f),
      IndexedSeq(-2f, 5f)))

  private def fixture = {
    val rows: Seq[(Long, Seq[java.lang.Float])] = Seq(
      1L -> Seq[java.lang.Float](1f, 2f, 3f, 4f),
      2L -> Seq[java.lang.Float](-1f, 0.5f, 0f, 2f),
      3L -> null, // null vector
      4L -> Seq[java.lang.Float](1f, 2f), // wrong dim
      5L -> Seq[java.lang.Float](1f, null, 3f, 4f), // null element
      6L -> Seq[java.lang.Float](Float.NaN, 1f, 1f, 1f), // NaN element
      7L -> Seq[java.lang.Float](0f, 0f, 0f, 0f), // zero vector
      8L -> Seq[java.lang.Float](0f, 1f, 0f, 0f)) // exact centroid tie
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  private def unitLit(components: IndexedSeq[Float]): Column = {
    val norm = math.sqrt(components.map(x => x.toDouble * x).sum)
    typedLit(components.map(x => (x / norm).toFloat).toSeq)
  }

  // the ORIGINAL unrolled cell ranking (pre-r14-opt cellsFor body)
  private def oldTopCells(nProbe: Int): Column = {
    val scored = cents.zipWithIndex.map { case (cvec, i) =>
      struct(call_function("dot_f32", col("embedding"), unitLit(cvec)).as("d"),
        lit(i).as("c"))
    }
    slice(reverse(array_sort(array(scored: _*))), 1, nProbe)
  }

  // the ORIGINAL unrolled per-subspace argmax (pre-r14-opt pqArgminExpr)
  private def oldPqCodes(): Column = {
    val m = books.length
    val ds = dim / m
    array((0 until m).map { s =>
      val scored = books(s).zipWithIndex.map { case (cw, j) =>
        val halfNorm2 = cw.map(x => x.toDouble * x).sum / 2.0
        struct((call_function("dot_f32", slice(col("embedding"), s * ds + 1, ds),
          typedLit(cw.toSeq)) - lit(halfNorm2)).as("d"), lit(j).as("c"))
      }
      array_max(array(scored: _*)).getField("c")
    }: _*)
  }

  // the ORIGINAL unrolled LUT grid (pre-r14-opt adcRefinedShortlistFrom)
  private def oldPqLut(): Column = {
    val m = books.length
    val kCodes = books.head.length
    val ds = dim / m
    array((0 until m).map(s =>
      array((0 until kCodes).map(j =>
        call_function("dot_f32", slice(col("embedding"), s * ds + 1, ds),
          typedLit(books(s)(j).toSeq))): _*)): _*)
  }

  private def normCents: Seq[Seq[Float]] = cents.map { cvec =>
    val norm = math.sqrt(cvec.map(x => x.toDouble * x).sum)
    cvec.map(x => (x / norm).toFloat).toSeq
  }

  private def booksLit = typedLit(
    books.map(_.map(_.toSeq): Seq[Seq[Float]]): Seq[Seq[Seq[Float]]])

  test("top_cells equals the unrolled struct-sort ranking, nProbe 1..6") {
    GraftFunctions.register(spark)
    for (nProbe <- Seq(1, 2, 3, 6)) {
      val both = fixture.select(col("vec_id"),
        call_function("top_cells", col("embedding"), typedLit(normCents),
          lit(nProbe)).as("native"),
        transform(oldTopCells(nProbe), s => s.getField("c")).as("unrolled"))
      val bad = both.where(not(col("native") <=> col("unrolled"))).collect()
      assert(bad.isEmpty, s"nProbe=$nProbe mismatches: ${bad.mkString(", ")}")
    }
  }

  test("pq_codes equals the unrolled struct-argmax encoding") {
    GraftFunctions.register(spark)
    val both = fixture.select(col("vec_id"),
      call_function("pq_codes", col("embedding"), booksLit).as("native"),
      oldPqCodes().as("unrolled"))
    val bad = both.where(not(col("native") <=> col("unrolled"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("pq_lut equals the unrolled dot grid (bit-identical doubles)") {
    GraftFunctions.register(spark)
    // compare via xxhash64 of the stringified rows so NaN == NaN: <=> on
    // double arrays treats NaN equal too, so a direct <=> works
    val both = fixture.select(col("vec_id"),
      call_function("pq_lut", col("embedding"), booksLit).as("native"),
      oldPqLut().as("unrolled"))
    val bad = both.where(not(col("native") <=> col("unrolled"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("top_cells stays codegen'd at the production cell cap (4096)") {
    GraftFunctions.register(spark)
    // 4096 cells — the maxCells geometry writeAnnIndex can reach. The
    // unrolled form is guaranteed past Janino's 64 KB method limit
    // here; the loop kernel must evaluate (and rank) without error.
    val big: Seq[Seq[Float]] = (0 until 4096).map(c =>
      (0 until dim).map(d => ((c * 31 + d * 7) % 17 - 8).toFloat / 8f))
    val r = fixture.where(col("vec_id") === 1L)
      .select(call_function("top_cells", col("embedding"), typedLit(big),
        lit(3)).as("cells"))
      .collect()(0).getSeq[Int](0)
    assert(r.length == 3 && r.toSet.size == 3)
  }
}
