package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native loop kernels for the IVF/PQ expression family.
  *
  * Why these exist (r14 optimization round, guide §4): the original
  * cell-assignment / PQ-encode / ADC-LUT expressions UNROLLED one
  * `dot_f32` call per centroid (or per codeword) into the projection —
  * `array(struct(dot_f32(emb, lit_0), 0), …, struct(dot_f32(emb,
  * lit_k), k))` + `array_sort`. At the pinned toy geometries (8
  * cells) that is fine; at the √N auto geometry the registry actually
  * serves (≈190 cells on the regenerated sf0.1 sentence corpus, up to
  * 4096 at the production cap) the generated Java for the fused
  * projection exceeds Janino's hard 64 KB method limit, whole-stage
  * codegen FAILS ("Code grows beyond 64 KB", 9 hits in the r14
  * baseline bench log) and the hottest ANN stages run fully
  * interpreted — q_mine_bitext_sent_ann measured 23.5 s at sf0.1,
  * with 179 s of summed task time on the serve pass alone. A loop
  * over a constant matrix REFERENCE generates O(1) code regardless of
  * k, so the stage stays codegen'd at every geometry.
  *
  * Semantics are bit-identical to the expression forms they replace
  * (spec-asserted in IvfPqExprSpec):
  *   - scores are the same `DotUtil.dot` accumulation (same order,
  *     same NaN contract: length mismatch / empty / null element →
  *     NaN);
  *   - comparisons mirror Spark's SQLOrderingUtil.compareDoubles
  *     (primitive `==` first, so -0.0 == 0.0; else Double.compare, so
  *     NaN sorts largest);
  *   - `top_cells` ranks (dot DESC, cell DESC) — exactly
  *     `reverse(array_sort(struct(d, c)))`, whose ascending sort
  *     breaks ties on the LOW cell and reverses to the HIGH cell;
  *   - `pq_codes` ties toward the HIGHER code index (the struct
  *     array_max convention);
  *   - a NULL embedding yields what the null-propagated struct sort
  *     yielded: top_cells = the highest cells, pq_codes = kCodes−1
  *     everywhere, pq_lut = all-null lookup rows.
  */
object IvfPqUtil {

  /** array<array<float>> literal value → driver/executor matrix. */
  def matrixOf(v: Any): Array[Array[Float]] = {
    val outer = v.asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { i =>
      val inner = outer.getArray(i)
      Array.tabulate(inner.numElements())(j => inner.getFloat(j))
    }
  }

  /** array<array<array<float>>> literal value → codebook tensor. */
  def booksOf(v: Any): Array[Array[Array[Float]]] = {
    val outer = v.asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements())(s => matrixOf(outer.getArray(s)))
  }

  /** −‖c_j‖²/2 per codeword, folded once (same Scala fold order as the
    * old per-literal `cw.map(x => x.toDouble * x).sum / 2.0`).
    */
  def halfNorms(books: Array[Array[Array[Float]]]): Array[Array[Double]] =
    books.map(_.map { cw =>
      var acc = 0.0
      var i = 0
      while (i < cw.length) { acc += cw(i).toDouble * cw(i); i += 1 }
      acc / 2.0
    })

  /** SQLOrderingUtil.compareDoubles: primitive == first (-0.0 == 0.0),
    * else Double.compare (NaN largest). The ordering Spark's struct
    * sort / array_max applied to the unrolled form.
    */
  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** `DotUtil.dot(slice(emb, off+1, ds), cw)` without materializing the
    * slice: same accumulation order, same NaN contract (short slice,
    * empty, or null element → NaN).
    */
  private def dotRange(emb: ArrayData, off: Int, cw: Array[Float]): Double = {
    val n = emb.numElements()
    val ds = cw.length
    if (off + ds > n || ds == 0) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < ds) {
      if (emb.isNullAt(off + i)) return Double.NaN
      acc += emb.getFloat(off + i).toDouble * cw(i).toDouble
      i += 1
    }
    acc
  }

  /** `DotUtil.dot` against a plain float[] (no per-row ArrayData
    * wrapper): same accumulation order, same NaN contract.
    */
  private def dotFull(emb: ArrayData, cw: Array[Float]): Double = {
    val n = emb.numElements()
    if (n != cw.length || n == 0) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (emb.isNullAt(i)) return Double.NaN
      acc += emb.getFloat(i).toDouble * cw(i).toDouble
      i += 1
    }
    acc
  }

  /** Top-`nProbe` cell ids by (dot DESC, cell DESC). `emb == null`
    * reproduces the null-propagated sort: highest cells first.
    */
  def topCells(emb: ArrayData, cents: Array[Array[Float]],
      nProbe: Int): ArrayData = {
    val k = cents.length
    val p = math.min(math.max(nProbe, 0), k)
    val out = new Array[Int](p)
    if (emb == null) {
      var i = 0
      while (i < p) { out(i) = k - 1 - i; i += 1 }
      return new GenericArrayData(out)
    }
    val d = new Array[Double](k)
    var c = 0
    while (c < k) { d(c) = dotFull(emb, cents(c)); c += 1 }
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < p) {
      // scan HIGH→LOW with strict > so ties keep the higher cell —
      // the reversed ascending (d, c) struct sort
      var best = -1
      var cc = k - 1
      while (cc >= 0) {
        if (!taken(cc) && (best < 0 || cmpD(d(cc), d(best)) > 0)) best = cc
        cc -= 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Per-subspace argmax_j (dot(sub, c_j) − ‖c_j‖²/2), ties toward the
    * higher code (the array_max convention). `emb == null` → kCodes−1
    * everywhere (the null-propagated struct max).
    */
  def pqCodes(emb: ArrayData, books: Array[Array[Array[Float]]],
      halfN: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val kC = book.length
      if (emb == null) out(s) = kC - 1
      else {
        val ds = book(0).length
        val off = s * ds
        var best = 0
        var bestD = dotRange(emb, off, book(0)) - halfN(s)(0)
        var j = 1
        while (j < kC) {
          val dj = dotRange(emb, off, book(j)) - halfN(s)(j)
          if (cmpD(dj, bestD) >= 0) { best = j; bestD = dj }
          j += 1
        }
        out(s) = best
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The ADC lookup table: lut(s)(j) = dot(subvec_s, c_{s,j}) — the
    * same doubles the unrolled `dot_f32(slice(...), lit)` grid
    * produced. `emb == null` → all-null rows (the null-propagated
    * form).
    */
  def pqLut(emb: ArrayData, books: Array[Array[Array[Float]]]): ArrayData = {
    val m = books.length
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val kC = book.length
      val row = new Array[Any](kC)
      if (emb != null) {
        val ds = book(0).length
        val off = s * ds
        var j = 0
        while (j < kC) { row(j) = dotRange(emb, off, book(j)); j += 1 }
      }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows)
  }
}

/** Shared shape checks + the foldable-matrix plumbing for the family:
  * child 0 is the embedding column, child 1 a FOLDABLE nested float
  * array literal (the geometry), evaluated once per plan — codegen
  * embeds it as one reference object, so generated code size is O(1)
  * in the centroid/codeword count.
  */
trait IvfPqExpr extends Expression {
  def emb: Expression
  def geom: Expression

  override def nullable: Boolean = false

  protected def geomName: String

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArr(t: DataType, depth: Int): Boolean = (t, depth) match {
      case (FloatType, 0) => true
      case (ArrayType(e, _), n) if n > 0 => isFloatArr(e, n - 1)
      case _ => false
    }
    if (!isFloatArr(emb.dataType, 1))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: embedding must be array<float>, got ${emb.dataType}")
    else if (!isFloatArr(geom.dataType, geomDepth))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: $geomName must be a ${geomDepth}-deep float array " +
          s"literal, got ${geom.dataType}")
    else if (!geom.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: $geomName must be foldable (a literal)")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected def geomDepth: Int
}

/** `top_cells(embedding, centroidsLit, nProbe)` → array<int> of the
  * nProbe nearest cell ids, ranked (dot DESC, cell DESC). See
  * [[IvfPqUtil]] for the exact-equivalence contract with the unrolled
  * struct-sort form it replaces.
  */
case class TopCells(emb: Expression, geom: Expression, nProbe: Int)
    extends IvfPqExpr {
  override def children: Seq[Expression] = Seq(emb, geom)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"
  override protected def geomName: String = "centroids"
  override protected def geomDepth: Int = 2

  @transient private lazy val cents: Array[Array[Float]] =
    IvfPqUtil.matrixOf(geom.eval(null))

  override def eval(input: InternalRow): Any =
    IvfPqUtil.topCells(emb.eval(input).asInstanceOf[ArrayData], cents, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = emb.genCode(ctx)
    val ref = ctx.addReferenceObj("cents", cents, "float[][]")
    ev.copy(code = code"""
      ${e.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.IvfPqUtil.topCells(
          ${e.isNull} ? null : ${e.value}, $ref, $nProbe);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopCells =
    copy(emb = newChildren(0), geom = newChildren(1))
}

/** `pq_codes(embedding, booksLit)` → array<int>, the m per-subspace PQ
  * codes (argmax dot − ‖c‖²/2, ties toward the higher code).
  */
case class PqCodes(emb: Expression, geom: Expression) extends IvfPqExpr {
  override def children: Seq[Expression] = Seq(emb, geom)
  // the unrolled form's codes were nullable ints (array_max ∘ getField)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "pq_codes"
  override protected def geomName: String = "codebooks"
  override protected def geomDepth: Int = 3

  @transient private lazy val books: Array[Array[Array[Float]]] =
    IvfPqUtil.booksOf(geom.eval(null))
  @transient private lazy val halfN: Array[Array[Double]] =
    IvfPqUtil.halfNorms(books)

  override def eval(input: InternalRow): Any =
    IvfPqUtil.pqCodes(emb.eval(input).asInstanceOf[ArrayData], books, halfN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = emb.genCode(ctx)
    val b = ctx.addReferenceObj("books", books, "float[][][]")
    val h = ctx.addReferenceObj("halfN", halfN, "double[][]")
    ev.copy(code = code"""
      ${e.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.IvfPqUtil.pqCodes(
          ${e.isNull} ? null : ${e.value}, $b, $h);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqCodes =
    copy(emb = newChildren(0), geom = newChildren(1))
}

/** `pq_lut(embedding, booksLit)` → array<array<double>>: the per-query
  * ADC lookup table, lut(s)(j) = dot(subvec_s, codeword_{s,j}).
  */
case class PqLut(emb: Expression, geom: Expression) extends IvfPqExpr {
  override def children: Seq[Expression] = Seq(emb, geom)
  // the unrolled dot_f32 grid was nullable doubles in a non-null array
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def prettyName: String = "pq_lut"
  override protected def geomName: String = "codebooks"
  override protected def geomDepth: Int = 3

  @transient private lazy val books: Array[Array[Array[Float]]] =
    IvfPqUtil.booksOf(geom.eval(null))

  override def eval(input: InternalRow): Any =
    IvfPqUtil.pqLut(emb.eval(input).asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = emb.genCode(ctx)
    val b = ctx.addReferenceObj("books", books, "float[][][]")
    ev.copy(code = code"""
      ${e.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.IvfPqUtil.pqLut(
          ${e.isNull} ? null : ${e.value}, $b);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqLut =
    copy(emb = newChildren(0), geom = newChildren(1))
}
