package graft

import graft.operators.Similarity
import graft.sources.Tables

/** PCA family ([[Similarity.embedPca]] / [[Similarity.pcaVariance]]):
  * the eigensolve against hand-built anisotropic fixtures, the model
  * invariants (orthonormal basis, descending eigenvalues, variance
  * conservation), the projection-variance ≍ eigenvalue contract, the
  * whitening contract, and rerun determinism.
  */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  // planted 2-factor fixture in 4 dims: x = a·u + b·w with
  // orthonormal u, w and var(a) ≫ var(b) — cov eigenpairs are known
  // in closed form (var(a) on u, var(b) on w, 0, 0)
  private val u = Array(0.6f, 0.8f, 0f, 0f)
  private val w = Array(0f, 0f, 1f, 0f)
  private lazy val planted = {
    val rows = (0 until 210).map { i =>
      val a = (i % 21 - 10).toFloat // -10..10, mean 0
      val b = ((i * 7) % 5 - 2).toFloat * 0.3f
      (i.toLong, Array.tabulate(4)(d => a * u(d) + b * w(d)))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def variance(xs: Seq[Double]): Double = {
    val m = xs.sum / xs.size
    xs.map(x => (x - m) * (x - m)).sum / xs.size
  }

  test("jacobiEigen: known 2x2 — eigvals {3,1}, vectors (1,±1)/√2") {
    val (vals, vecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = vals.zip(vecs).sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    val v0 = pairs(0)._2
    assert(math.abs(math.abs(v0(0)) - s) < 1e-12 &&
      math.abs(math.abs(v0(1)) - s) < 1e-12 && v0(0) * v0(1) > 0)
    val v1 = pairs(1)._2
    assert(v1(0) * v1(1) < 0)
  }

  test("pcaModel on the planted fixture: axes and eigenvalues recovered") {
    val m = Similarity.pcaModel(planted, dim = 4).get
    assert(m.n == 210)
    // closed-form factor variances
    val as = (0 until 210).map(i => (i % 21 - 10).toDouble)
    val bs = (0 until 210).map(i => ((i * 7) % 5 - 2).toDouble * 0.3)
    // tolerance: the fixture embeds through float32, so products carry
    // ~1e-7 relative error into the exact closed-form comparison
    assert(math.abs(m.eigvals(0) - variance(as)) < 1e-5 * variance(as),
      s"pc1 eigval ${m.eigvals(0)} vs planted ${variance(as)}")
    assert(math.abs(m.eigvals(1) - variance(bs)) < 1e-5 + 1e-5 * variance(bs))
    assert(math.abs(m.eigvals(2)) < 1e-6 && math.abs(m.eigvals(3)) < 1e-6)
    // pc1 axis = u exactly (sign convention: largest |component| — the
    // 0.8 at index 1 — positive)
    (0 until 4).foreach { d =>
      assert(math.abs(m.components(0)(d) - u(d)) < 1e-6,
        s"pc1 axis ${m.components(0).toSeq} vs planted ${u.toSeq}")
    }
    (0 until 4).foreach { d =>
      assert(math.abs(m.components(1)(d) - w(d)) < 1e-6)
    }
  }

  test("pcaModel on real embeddings: orthonormal basis, descending " +
      "eigenvalues, variance conserved") {
    val m = Similarity.pcaModel(emb, dim = 64).get
    // orthonormality (Jacobi rotations are orthogonal by construction)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- 0 until 64; j <- i until 64) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(m.components(i), m.components(j)) - expect) < 1e-9,
        s"basis not orthonormal at ($i,$j)")
    }
    assert(m.eigvals.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "eigenvalues must descend")
    // trace conservation: Σ eigvals = mean ||x−μ||²
    val vecs = emb.collect().map(
      _.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val mean = Array.tabulate(64)(d => vecs.map(_(d).toDouble).sum / vecs.length)
    val totVar = vecs.map { v =>
      (0 until 64).map(d => { val c = v(d) - mean(d); c * c }).sum
    }.sum / vecs.length
    assert(math.abs(m.eigvals.sum - totVar) < 1e-4,
      s"trace ${m.eigvals.sum} vs total variance $totVar")
  }

  test("embedPca: per-axis projection variance tracks the eigenvalue") {
    val m = Similarity.pcaModel(emb, dim = 64).get
    val proj = Similarity.embedPca(emb, k = 4).collect()
    assert(proj.length == emb.count())
    (1 to 4).foreach { j =>
      val vs = proj.map(_.getAs[Double](s"pc$j")).toSeq
      val v = variance(vs)
      val ev = m.eigvals(j - 1)
      assert(math.abs(v - ev) < 0.02 * math.max(ev, 1e-6) + 1e-6,
        s"pc$j variance $v vs eigenvalue $ev")
    }
  }

  test("embedPca whiten: unit variance per kept axis; zero-variance " +
      "axes whiten to 0") {
    val proj = Similarity.embedPca(emb, k = 4, whiten = true).collect()
    (1 to 4).foreach { j =>
      val v = variance(proj.map(_.getAs[Double](s"pc$j")).toSeq)
      assert(math.abs(v - 1.0) < 0.05, s"whitened pc$j variance $v")
    }
    // planted fixture: axes 3/4 carry no variance → whitened exactly 0
    val flat = Similarity.embedPca(planted, k = 4, dim = 4, whiten = true)
      .collect()
    assert(flat.forall(r => r.getAs[Double]("pc3") == 0.0 &&
      r.getAs[Double]("pc4") == 0.0))
  }

  test("embedPca: deterministic across reruns") {
    def runOnce() = Similarity.embedPca(emb, k = 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("pc1"),
        r.getAs[Double]("pc2"), r.getAs[Double]("pc3"))).sortBy(_._1).toSeq
    assert(runOnce() == runOnce())
  }

  test("pcaVariance: k rows, shares descend, cum_share is a CDF") {
    val rows = Similarity.pcaVariance(emb, k = 8).collect()
    assert(rows.length == 8)
    val shares = rows.sortBy(_.getAs[Long]("component"))
      .map(_.getAs[Double]("var_share")).toSeq
    assert(shares.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    val cums = rows.sortBy(_.getAs[Long]("component"))
      .map(_.getAs[Double]("cum_share")).toSeq
    assert(cums.sliding(2).forall(p => p(1) >= p(0) - 1e-9))
    assert(cums.last <= 1.0 + 1e-6)
    // the fixture's curve saturates at 2 components
    val p = Similarity.pcaVariance(planted, k = 4, dim = 4).collect()
      .sortBy(_.getAs[Long]("component"))
    assert(math.abs(p(1).getAs[Double]("cum_share") - 1.0) < 1e-6)
  }

  test("empty / degenerate inputs: empty frames back, wrong-dim rows " +
      "excluded from fit and projection") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.embedPca(empty, k = 2).isEmpty)
    assert(Similarity.pcaVariance(empty, k = 2).isEmpty)
    // wrong-dim, NaN-element and Inf-element rows neither shift the
    // fit (a single NaN would poison the WHOLE covariance) nor appear
    // in the output
    val mixed = planted.union(Seq(
      (9999L, Array(1f, 2f)),
      (9998L, Array(1f, Float.NaN, 0f, 0f)),
      (9997L, Array(1f, Float.PositiveInfinity, 0f, 0f))
    ).toDF("vec_id", "embedding"))
    val m = Similarity.pcaModel(mixed, dim = 4).get
    assert(m.n == 210)
    assert(m.eigvals.forall(v => !v.isNaN),
      "degenerate rows must not reach the covariance")
    val ids = Similarity.embedPca(mixed, k = 2, dim = 4).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(ids.size == 210 &&
      Seq(9997L, 9998L, 9999L).forall(!ids.contains(_)))
  }
}
