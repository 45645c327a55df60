package graft

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("lshBuckets: one row per (vec, table), bucket within bit range") {
    val n = emb.count()
    val b = Similarity.lshBuckets(emb, nTables = 8, nPlanes = 3).collect()
    assert(b.length == 8 * n)
    assert(b.forall { r =>
      val bk = r.getAs[Int]("bucket"); bk >= 0 && bk < 8
    })
  }

  test("randomProject: dense form is the float view of the flat doubles") {
    val dense = Similarity.randomProject(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("proj")).toMap
    val flat = Similarity.randomProjectFlat(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("out_pos"),
        r.getAs[Double]("val")))
    assert(dense.nonEmpty && flat.size == dense.size * 16)
    assert(dense.values.forall(_.length == 16))
    assert(flat.forall { case (id, pos, v) => dense(id)(pos.toInt) == v.toFloat })
  }

  test("randomProject approximately preserves pairwise cosine (JL contract)") {
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / math.sqrt(na * nb)
    }
    def denseOf(od: Int): Map[Long, Array[Float]] =
      Similarity.randomProject(emb, outDim = od).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("proj").toArray).toMap
    val p16 = denseOf(16)
    val p32 = denseOf(32)
    val orig = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    val ids = p16.keys.toSeq.sorted.take(60)
    val idPairs = for { i <- ids.indices; j <- (i + 1) until ids.size }
      yield (ids(i), ids(j))
    def mae(p: Map[Long, Array[Float]]): Double = {
      val errs = idPairs.map { case (a, b) =>
        math.abs(cosine(orig(a), orig(b)) - cosine(p(a), p(b))) }
      errs.sum / errs.size
    }
    val (m16, m32) = (mae(p16), mae(p32))
    info(s"mean |cos_orig - cos_proj| over ${idPairs.size} pairs: " +
      s"outDim=16 -> $m16, outDim=32 -> $m32")
    // JL concentration: error variance ~ 1/outDim, so doubling the
    // output dims must shrink the mean error; data + signs are
    // deterministic, so these bounds are stable across runs
    assert(m16 <= 0.2, s"outDim=16 mean cosine error $m16")
    assert(m32 < m16, s"error must shrink with outDim: $m32 !< $m16")
  }

  test("annLsh recall vs exact annTopK is >= 0.8 on the test embeddings") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val exact = pairs(Similarity.annTopK(emb, nQueries = 10, k = 5))
    val approx = pairs(Similarity.annLsh(emb, nQueries = 10, k = 5))
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"recall = $recall (${(exact & approx).size}/${exact.size})")
    assert(recall >= 0.8)
  }

  test("annIvf recall vs exact annTopK on the test embeddings") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val exact = pairs(Similarity.annTopK(emb, nQueries = 10, k = 5))
    val approx = pairs(Similarity.annIvf(emb, nQueries = 10, k = 5))
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"ivf recall = $recall (${(exact & approx).size}/${exact.size})")
    assert(recall >= 0.6) // nProbe=4 of 8 cells on loose neighbors
  }

  test("annIvfLearned: learned centroids match or beat fixed-centroid recall") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val exact = pairs(Similarity.annTopK(emb, nQueries = 10, k = 5))
    val fixed = pairs(Similarity.annIvf(emb, nQueries = 10, k = 5))
    val learned = pairs(Similarity.annIvfLearned(emb, nQueries = 10, k = 5))
    val rFixed = (exact & fixed).size.toDouble / exact.size
    val rLearned = (exact & learned).size.toDouble / exact.size
    info(s"fixed recall = $rFixed, learned recall = $rLearned")
    assert(rLearned >= rFixed,
      s"data-adaptive cells must not lose recall: $rLearned < $rFixed")
    assert(rLearned >= 0.6)
  }

  test("ivfCells: corpus side one cell per vec, query side nProbe cells") {
    val n = emb.count()
    assert(Similarity.ivfCells(emb, nCells = 8, nProbe = 1).count() == n)
    assert(Similarity.ivfCells(emb, nCells = 8, nProbe = 4).count() == 4 * n)
  }

  test("kmeansAssign: every vector gets one cluster; assignments are deterministic") {
    val a1 = Similarity.kmeansAssign(emb, k = 4, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val a2 = Similarity.kmeansAssign(emb, k = 4, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(a1 == a2)
    assert(a1.size == emb.count())
    assert(a1.values.toSet.subsetOf((0 until 4).toSet))
    assert(a1.values.toSet.size > 1, "clustering must actually split the data")
  }

  test("clusterBalance matches the local weights-then-hash-cutoff model") {
    // from-scratch model over the operator's own (deterministic)
    // assignment: BigDecimal 6-dp weight assembly in the operator's
    // exact op order, then the salted md5 id-bucket admit
    val budget = 100L
    val alpha = 0.5
    val assign = Similarity.kmeansAssign(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster"))
    val counts = assign.groupBy(_._2).map { case (c, g) => c -> g.size }
    val tot = assign.size
    val p6 = counts.map { case (c, n) =>
      c -> BigDecimal(math.pow(n.toDouble / tot, alpha))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val sp = p6.values.sum
    val cutoff = counts.map { case (c, n) =>
      val rate = math.min(1.0,
        p6(c).toDouble / sp.toDouble * budget.toDouble / n)
      c -> math.floor(rate * 10000d + 0.5d).toLong
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"clusterbalance:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10000
    }
    val expected = assign.filter { case (id, c) => bucket(id) < cutoff(c) }
      .map(_._1).toSet
    // inject the collected assignment: internal Lloyd's training sums
    // doubles in shuffle-merge order and boundary vectors can flip
    // cells between runs (operator scaladoc) — everything AFTER the
    // assignment is bitwise deterministic, which is what this spec
    // pins exactly
    val assignDf = assign.toSeq.toDF("vec_id", "cluster")
    def run() = Similarity.clusterBalance(emb, budget = budget,
      alpha = alpha, assignment = Some(assignDf)).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val got = run()
    assert(got == expected)
    assert(got == run(), "the resample must be rerun-stable")
    assert(got.nonEmpty && got.size < assign.size,
      "a sub-corpus budget must admit a nonempty proper subset")
    // covering budget: every rate caps at 1 and every vector is
    // admitted. budget = n is NOT enough — α<1 shifts weight away
    // from dense clusters, so the biggest cluster's rate stays below
    // 1 at budget = n (by design); 5n clears every cap here
    val all = Similarity.clusterBalance(emb,
      budget = assign.size.toLong * 5, assignment = Some(assignDf))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(all == assign.map(_._1).toSet)
    // the self-training default path: same frame contract, bounded
    // admitted size (exact membership is the injected path's claim)
    val own = Similarity.clusterBalance(emb, budget = budget).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(own.nonEmpty && own.size < assign.size)
  }

  test("quantizeEmbeddings: int8 range, per-element error <= half a step") {
    val raw = emb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    val q = Similarity.quantizeEmbeddings(emb).collect()
    assert(q.nonEmpty && q.length <= raw.size)
    q.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val scale = r.getAs[Double]("scale")
      val qs = r.getAs[scala.collection.Seq[Byte]]("q")
      val orig = raw(id)
      assert(qs.length == orig.length)
      assert(qs.forall(b => b >= -127 && b <= 127))
      // dequantized value is within half a quantization step
      val exactScale = orig.map(x => math.abs(x.toDouble)).max
      qs.zip(orig).foreach { case (b, x) =>
        val deq = b.toDouble / 127 * exactScale
        assert(math.abs(deq - x) <= exactScale / 254 + 1e-12,
          s"vec $id: $x -> $b -> $deq")
      }
      assert(math.abs(scale - math.rint(exactScale * 1e6) / 1e6) < 1e-9)
    }
  }

  test("quantizeEmbeddingsFlat: csv encoding is lossless vs the array form") {
    val arr = Similarity.quantizeEmbeddings(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[scala.collection.Seq[Byte]]("q").toList))
      .toMap
    val flat = Similarity.quantizeEmbeddingsFlat(emb).collect()
    assert(flat.length == arr.size)
    flat.foreach { r =>
      val (scale, q) = arr(r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("scale") == scale)
      assert(r.getAs[String]("q_csv") == q.map(_.toString).mkString(","))
    }
  }

  test("embedOutlier: scores vectors against their label centroid, drops NaN") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0L),
      (1L, Array(1f, 0f, 0f, 0f), 0L),
      (2L, Array(1f, 0f, 0f, 0f), 0L),
      (3L, Array(-1f, 0f, 0f, 0f), 0L), // the outlier in label 0
      (4L, Array(0f, 1f, 0f, 0f), 1L),
      (5L, Array(0f, 1f, 0f, 0f), 1L),
      (6L, Array(Float.NaN, 1f, 0f, 0f), 1L), // NaN element: excluded
      (7L, Array(0f, 0f, 0f, 0f), 2L) // zero-norm: NaN score, dropped
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.embedOutlier(vecs).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Double]("centroid_sim"))
      .toMap
    // label-0 centroid is (0.5, 0, 0, 0): aligned vectors score 1.0,
    // the flipped one -1.0; vec 6 must not poison label 1's centroid
    assert(r == Map(0L -> 1.0, 1L -> 1.0, 2L -> 1.0, 3L -> -1.0,
      4L -> 1.0, 5L -> 1.0))
  }

  test("embedOutlier: null-element vector excluded without shifting centroid") {
    // the filter's null leg must be EXPLICIT: `!exists(_, isnan)` is
    // NULL (silent drop) for [null, ...] in Spark while the oracle's
    // list_filter(isnan) count KEEPS the vector — this pins the
    // deterministic both-engines-drop contract
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", LongType, nullable = false)))
    val rows = Seq(
      Row(0L, Seq[Any](1f, 0f, 0f, 0f), 0L),
      Row(1L, Seq[Any](1f, 0f, 0f, 0f), 0L),
      Row(2L, Seq[Any](null, 1f, 0f, 0f), 0L)) // null element: excluded
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val r = Similarity.embedOutlier(df).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Double]("centroid_sim"))
      .toMap
    // the clean vectors' centroid must be untouched by vec 2
    assert(r == Map(0L -> 1.0, 1L -> 1.0))
  }

  test("pqEncode/annIvfPq: degenerate vectors dropped, never fabricated") {
    // dot_f32 scores NaN for null-element / wrong-dim input; without
    // the pqEncodable gate every argmin tie then resolves to code
    // kCodes-1 — an in-range, fake code word — and the NaN cosine
    // outranks every true neighbor in the rerank window
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val good = (0L until 10L).map { i =>
      Row(i, Seq.tabulate(4)(d =>
        (math.sin(i * 1.7 + d) * 0.5).toFloat): Seq[Any])
    }
    val bad = Seq(
      Row(10L, Seq[Any](1f, 0f, 0f)), // wrong dim
      Row(11L, Seq[Any](1f, null, 0f, 0f)), // null element
      Row(12L, Seq[Any](Float.NaN, 0f, 0f, 0f))) // NaN element
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(good ++ bad, 2), schema)
    val codes = Similarity.pqEncode(df, m = 2, kCodes = 4, iters = 1, dim = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(codes == (0L until 10L).toSet,
      s"degenerate vectors must be dropped from the code index: $codes")
    val nn = Similarity.annIvfPq(df, nQueries = 2, k = 3, nCells = 2,
      nProbe = 2, m = 2, kCodes = 4, iters = 1, rerank = 10, dim = 4)
      .collect()
    assert(nn.nonEmpty)
    val nIds = nn.map(_.getAs[Long]("n_id")).toSet
    assert(Seq(10L, 11L, 12L).forall(!nIds.contains(_)),
      s"degenerate vectors must never surface as neighbors: $nIds")
  }

  test("semDeDup: drop flag matches the in-cluster greedy reference") {
    val r = Similarity.semDeDup(emb, threshold = 0.4).collect()
      .map(x => (x.getAs[Long]("vec_id"),
        (x.getAs[Int]("cell"), x.getAs[Boolean]("is_dropped"))))
      .toMap
    val vecs = emb.collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getSeq[Float](1).toArray).toMap
    assert(r.keySet == vecs.keySet, "every vector must be flagged")
    def cosR(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // a vector is dropped iff SOME lower-id vector in its cell scores
    // >= threshold (the operator's cell assignment is the ground truth
    // here; the reference replays only the dedup decision)
    var drops = 0
    for ((b, (cellB, flagged)) <- r) {
      val expected = r.exists { case (a, (cellA, _)) =>
        a < b && cellA == cellB && cosR(vecs(a), vecs(b)) >= 0.4
      }
      assert(flagged == expected, s"vec $b: got $flagged expected $expected")
      if (flagged) drops += 1
    }
    info(s"semDeDup drops $drops of ${r.size} at threshold 0.4")
    assert(drops > 0, "gate data must exercise the drop path")
  }

  test("semDeDup auto-k: cells track corpus size, bounded by the literal budget") {
    // the arithmetic itself
    assert(Similarity.autoCells(0L, 10000L, 4096) == 8)
    assert(Similarity.autoCells(80000L, 10000L, 4096) == 8)
    assert(Similarity.autoCells(80001L, 10000L, 4096) == 9)
    assert(Similarity.autoCells(2000000L, 10000L, 4096) == 200)
    assert(Similarity.autoCells(1000000000L, 10000L, 4096) == 4096,
      "auto-k must cap at the centroid-literal plan budget")
    // the default path wires the derived k through: forcing small
    // cells on the gate corpus must yield more cells than fixed k=8,
    // keep every vector flagged, and match the explicitly-passed k
    val n = emb.count()
    val k = Similarity.autoCells(n, 16L, 4096)
    assert(k > 8, s"gate corpus ($n vecs) must derive k > 8 at target 16")
    val auto = Similarity.semDeDup(emb, threshold = 0.4, targetCellSize = 16L)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[Boolean]("is_dropped"))).sortBy(_._1)
    val fixed = Similarity.semDeDup(emb, threshold = 0.4, nCells = k)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[Boolean]("is_dropped"))).sortBy(_._1)
    assert(auto.length == n, "auto-k must still flag every vector")
    assert(auto.sameElements(fixed),
      "auto-k must be exactly fixed-k at the derived k")
    val cellsUsed = auto.map(_._2).distinct.length
    info(s"auto-k derived k=$k, $cellsUsed non-empty cells over $n vectors")
    assert(cellsUsed > 8, s"derived k must spread beyond fixed k=8: $cellsUsed")
  }

  test("nearDupPairs agrees with cosine threshold and is symmetric-free") {
    val r = Similarity.nearDupPairs(emb, bound = 50, threshold = 0.3).collect()
    assert(r.forall(x => x.getAs[Long]("a_id") < x.getAs[Long]("b_id")))
    assert(r.forall(x => x.getAs[Double]("cos_sim") > 0.3))
  }

  test("nearDupPairsLsh: exact precision, bounded-baseline recall >= 0.7") {
    val bounded = emb.where(org.apache.spark.sql.functions.col("vec_id") < 200)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        r.getAs[Double]("cos_sim"))).toMap
    val truth = pairs(Similarity.nearDupPairs(emb, bound = 200, threshold = 0.35))
    val lsh = pairs(Similarity.nearDupPairsLsh(bounded, threshold = 0.35,
      nTables = 8, nPlanes = 3, allowDense = true))
    // precision is EXACT: every returned pair is a true pair with the
    // identical rounded cosine (the filter re-scores exactly)
    lsh.foreach { case (p, c) => assert(truth.get(p).contains(c), s"false pair $p") }
    val recall = lsh.size.toDouble / truth.size
    info(s"lsh pair recall = $recall (${lsh.size}/${truth.size})")
    assert(recall >= 0.7)
  }

  test("nearDupPairsLsh: exact-dup-first composition — clone corpus " +
      "output equals the per-vector semantics built from the base run") {
    import org.apache.spark.sql.functions.col
    val base = emb.where(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        r.getAs[Double]("cos_sim"))).toMap
    val basePairs = pairs(Similarity.nearDupPairsLsh(base, threshold = 0.35,
      nTables = 8, nPlanes = 3, allowDense = true))
    assert(basePairs.nonEmpty)
    // every base vector cloned once at id+10000: the rep reduction
    // must band the 60 distinct vectors only, then compose — expected
    // output is each base pair times the 2×2 member combinations at
    // the SAME cosine, plus one within-star pair per vector at 1.0
    val cloned = base.unionByName(
      base.select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
    val got = pairs(Similarity.nearDupPairsLsh(cloned, threshold = 0.35,
      nTables = 8, nPlanes = 3, allowDense = true))
    val expected = basePairs.flatMap { case ((a, b), c) =>
      for (x <- Seq(a, a + 10000L); y <- Seq(b, b + 10000L))
        yield (math.min(x, y), math.max(x, y)) -> c
    } ++ (0L until 60L).map(i => (i, i + 10000L) -> 1.0).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} " +
        s"extra=${got.keySet -- expected.keySet} " +
        s"cosDiff=${got.collect { case (k, v) if expected.get(k).exists(_ != v) => k }}")
  }

  test("embedDedupGroups: equals a local union-find over the operator's " +
      "own pair view; degenerate vectors stay singletons") {
    import org.apache.spark.sql.functions.col
    val base = emb.where(col("vec_id") < 80)
      .select(col("vec_id"), col("embedding"))
    // clones (exact-dup stars) + a degenerate zero-vector pair
    val withClones = base.unionByName(
      base.where(col("vec_id") < 10)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
      .unionByName(spark.createDataFrame(Seq(
        (20001L, Array.fill(64)(0f)), (20002L, Array.fill(64)(0f))))
        .toDF("vec_id", "embedding"))
    val pairs = Similarity.nearDupPairsLsh(withClones, threshold = 0.35,
      nTables = 8, nPlanes = 3, allowDense = true).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val groups = Similarity.embedDedupGroups(withClones, threshold = 0.35,
      nTables = 8, nPlanes = 3, allowDense = true).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("group_id"))).toMap
    // local union-find with path compression over the pair view
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val ids = withClones.collect().map(_.getAs[Long]("vec_id"))
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = ids.map(i => i -> find(i)).toMap
    assert(groups == expect,
      s"drift: ${groups.toSet.diff(expect.toSet).take(5)}")
    // the zero vectors pair with nothing and must not group together
    assert(groups(20001L) == 20001L && groups(20002L) == 20002L)
    // clones share their base's group
    assert(groups(10000L) == groups(0L))
  }

  test("nearDupPairsLsh: dense parameterization refuses without allowDense") {
    // threshold 0.35 at b=3: (p/0.5)^b ~ 1.9x < 4 -> near-quadratic by
    // the operator's own math; must refuse at plan build
    val e = intercept[IllegalArgumentException](
      Similarity.nearDupPairsLsh(emb, threshold = 0.35, nTables = 8, nPlanes = 3))
    assert(e.getMessage.contains("near-quadratic"))
    // the win-case defaults pass the guard (no exception at build)
    Similarity.nearDupPairsLsh(emb)
    // opting in builds the loose shape
    Similarity.nearDupPairsLsh(emb, threshold = 0.35, nTables = 8, nPlanes = 3,
      allowDense = true)
  }

  test("nearDupPairs: uniformly wrong-dim corpus raises instead of empty result") {
    import org.apache.spark.sql.functions._
    // every vector is 32-dim while the kernel expects 64: silently
    // returning zero pairs would hide a caller error, so the plan
    // raises at action time (construction itself stays lazy)
    val wrongDim = emb.where(col("vec_id") < 50)
      .select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"))
    val df = Similarity.nearDupPairs(wrongDim, bound = 50, threshold = 0.3)
    val e = intercept[Exception](df.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("matched dim=64")),
      s"expected the loud dim-mismatch error, got: $e")
    // a MIXED corpus (some valid vectors) still computes over the
    // valid subset without raising
    val mixed = emb.where(col("vec_id") < 50)
      .select(col("vec_id"), when(col("vec_id") % 5 === 0,
        slice(col("embedding"), 1, 32)).otherwise(col("embedding")).as("embedding"))
    val r = Similarity.nearDupPairs(mixed, bound = 50, threshold = 0.3).collect()
    assert(r.forall(x => x.getAs[Long]("a_id") % 5 != 0 &&
      x.getAs[Long]("b_id") % 5 != 0))
  }

  test("nearDupPairs: plan construction runs ZERO Spark jobs (lazy by contract)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // force the input's own lazy setup (table read schema inference)
    // BEFORE listening, so only nearDupPairs construction is counted
    emb.schema
    spark.sparkContext.addSparkListener(l)
    try {
      val df = Similarity.nearDupPairs(emb, bound = 50, threshold = 0.3)
      df.queryExecution.executedPlan // even physical planning stays job-free
      Thread.sleep(500) // drain the listener bus
      assert(jobs.get() == 0,
        "constructing/planning nearDupPairs must run no Spark job")
      assert(df.count() >= 0) // still executes (broadcast runs here)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("pqEncode: codes in range, deterministic, one row per vector") {
    val c1 = Similarity.pqEncode(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    val c2 = Similarity.pqEncode(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(c1 == c2, "PQ encoding must be deterministic")
    assert(c1.size == emb.count())
    assert(c1.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 64)))
    // codes must actually discriminate: not every vector on one codeword
    assert(c1.values.toSet.size > c1.size / 4,
      "code diversity collapsed - codebook training is broken")
  }

  test("pqEncode: codeword reconstruction approximates the original vector") {
    val books = Similarity.pqCodebooks(emb)
    val codes = Similarity.pqEncode(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    val vecs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val sims = codes.collect { case (id, cs) if vecs(id).length == 64 =>
      val recon = cs.zipWithIndex.flatMap { case (c, s) => books(s)(c) }
        .map(_.toDouble)
      cosine(vecs(id).map(_.toDouble), recon)
    }.toSeq
    val mean = sims.sum / sims.size
    info(f"mean reconstruction cosine = $mean%.3f over ${sims.size} vectors")
    // 8 subspaces x 16 codes after Lloyd's must reconstruct far above
    // chance (random 64-dim pairs have cosine ~0)
    assert(mean >= 0.5, f"reconstruction collapsed: $mean%.3f")
  }

  test("annIvfPq recall vs exact annTopK on the test embeddings") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val exact = pairs(Similarity.annTopK(emb, nQueries = 10, k = 5))
    val pq = pairs(Similarity.annIvfPq(emb, nQueries = 10, k = 5))
    // the ceiling must probe the SAME cells as the PQ defaults (r11
    // tuned the PQ family to nProbe=6; plain IVF keeps its own default)
    val ivf = pairs(Similarity.annIvf(emb, nQueries = 10, k = 5, nProbe = 6))
    val rPq = (exact & pq).size.toDouble / exact.size
    val rIvf = (exact & ivf).size.toDouble / exact.size
    info(s"ivf-pq recall = $rPq (plain ivf at same probes = $rIvf)")
    // plain IVF under identical cells/probes is the ceiling by
    // construction; ADC prune + exact top-R refinement must land close
    // to it (0.72 vs 0.74 measured), far above the unrefined ADC rank
    // (0.40 measured at kCodes=64)
    assert(rPq <= rIvf + 1e-9, s"PQ cannot beat its candidate ceiling")
    assert(rPq >= rIvf - 0.1, s"refinement lost too much: $rPq vs $rIvf")
    assert(rPq >= 0.6)
  }

  test("annIvfPqLearned: near fixed-cell recall, bounded by learned-IVF ceiling") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    // PRECONDITION: the ceiling comparison below assumes annIvfLearned
    // (trains cells on the unfiltered frame) and annIvfPqLearned
    // (trains on the pqEncodable-filtered frame) see the SAME rows —
    // true only while the gate corpus has zero non-encodable vectors.
    // Assert it so a future poison-vector fixture fails HERE with the
    // reason, not downstream as a mysterious recall flake.
    import org.apache.spark.sql.functions.{col, forall, isnan, size => asize}
    val nAll = emb.count()
    // mirrors the operator's pqEncodable gate exactly
    val nEnc = emb.where(col("embedding").isNotNull &&
      asize(col("embedding")) === 64 &&
      forall(col("embedding"), x => x.isNotNull && !isnan(x))).count()
    assume(nAll == nEnc,
      s"gate corpus gained non-encodable vectors ($nEnc/$nAll): the " +
        "learned-IVF/learned-PQ ceiling comparison trains on different " +
        "row sets and is no longer meaningful as written")
    val exact = pairs(Similarity.annTopK(emb, nQueries = 10, k = 5))
    val fixedPq = pairs(Similarity.annIvfPq(emb, nQueries = 10, k = 5))
    val learnedPq = pairs(Similarity.annIvfPqLearned(emb, nQueries = 10, k = 5))
    // ceiling probes the same cells as the PQ defaults (nProbe=6, r11)
    val learnedIvf = pairs(
      Similarity.annIvfLearned(emb, nQueries = 10, k = 5, nProbe = 6))
    val rFixed = (exact & fixedPq).size.toDouble / exact.size
    val rLearned = (exact & learnedPq).size.toDouble / exact.size
    val rCeil = (exact & learnedIvf).size.toDouble / exact.size
    info(s"learned ivf-pq recall = $rLearned (fixed ivf-pq = $rFixed, " +
      s"uncompressed learned-ivf ceiling = $rCeil)")
    // uncompressed IVF over the same learned cells ranks exact cosine
    // within the same candidate sets — the ceiling holds given the
    // same-rows precondition asserted above
    assert(rLearned <= rCeil + 1e-9,
      s"learned PQ cannot beat its uncompressed ceiling: $rLearned > $rCeil")
    // Lloyd's carries no recall guarantee on arbitrary data, so this
    // claim is PINNED to the fixed gate corpus + defaults: there,
    // data-adaptive cells must stay within a small tolerance of the
    // fixed-cell variant (measured: at or above it)
    assert(rLearned >= rFixed - 0.1,
      s"learned cells lost recall on the gate corpus: $rLearned vs $rFixed")
    assert(rLearned >= 0.6)
  }

  test("diverseSelect: greedy k-center invariant matches a local model; corners covered") {
    import spark.implicits._
    // three tight clusters at orthogonal corners + one distant
    // singleton: k=4 must pick one per corner + the singleton, never
    // two from one blob
    def v(hot: Int, eps: Float): Array[Float] =
      Array.tabulate(8)(i => if (i == hot) 1f else if (i == (hot + 1) % 8) eps else 0f)
    val fixture = (
      (0 until 3).map(j => (j.toLong, v(0, 0.01f * j))) ++
        (0 until 3).map(j => (10L + j, v(3, 0.01f * j))) ++
        (0 until 3).map(j => (20L + j, v(6, 0.01f * j))) :+
        (99L, Array.tabulate(8)(i => if (i == 7) -1f else 0f))
      ).toDF("vec_id", "embedding")
    val sel = Similarity.diverseSelect(fixture, k = 4, dim = 8).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sel_rank"),
        r.getAs[Double]("min_dist"))).sortBy(_._2)
    assert(sel.head._1 == 0L, "the seed is the smallest vec_id")
    val blobs = sel.map(_._1).map(id =>
      if (id < 10) 0 else if (id < 20) 1 else if (id < 30) 2 else 3).toSet
    assert(blobs == Set(0, 1, 2, 3),
      s"k-center must cover every corner exactly once, got ${sel.toSeq}")
    // coverage radius is non-increasing after the seed
    val dists = sel.drop(1).map(_._3)
    assert(dists.zip(dists.drop(1)).forall { case (a, b) => b <= a + 1e-12 },
      s"marginal coverage must not increase: ${sel.toSeq}")
    // greedy invariant vs a local model over the collected fixture
    val all = fixture.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    def cosd(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      1.0 - math.rint(dot / (na * nb) * 1e4) / 1e4
    }
    var chosen = List(0L)
    sel.drop(1).foreach { case (id, _, d) =>
      val best = all.keys.filter(!chosen.contains(_))
        .map(c => (chosen.map(s => cosd(all(c), all(s))).min, c))
        .maxBy { case (dist, cid) => (dist, cid) }
      assert(best._2 == id && math.abs(best._1 - d) < 1e-9,
        s"greedy step mismatch: local model picked $best, operator ($id, $d)")
      chosen ::= id
    }
    // determinism
    val again = Similarity.diverseSelect(fixture, k = 4, dim = 8).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sel_rank")))
    assert(again.sortBy(_._2).map(_._1).toSeq == sel.map(_._1).toSeq)
  }

  test("diverseSelect: k beyond the corpus returns the whole corpus; diversity beats a prefix") {
    val sel = Similarity.diverseSelect(emb.limit(40).cache(), k = 12)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(sel.length == 12 && sel.distinct.length == 12)
    val tiny = {
      import spark.implicits._
      Seq((5L, Array(1f, 0f)), (7L, Array(0f, 1f))).toDF("vec_id", "embedding")
    }
    val exhausted = Similarity.diverseSelect(tiny, k = 10, dim = 2).collect()
    assert(exhausted.length == 2, "k > corpus returns every vector once")
  }

  test("annRecall: exact-vs-exact is identically 1.0; the frame agrees with the set computation") {
    val exact = Similarity.annTopK(emb, nQueries = 10, k = 5)
    val self = Similarity.annRecall(exact, exact).collect()
    assert(self.nonEmpty)
    assert(self.forall(r => r.getAs[Double]("recall") == 1.0 &&
      r.getAs[Long]("n_hit") == r.getAs[Long]("n_exact")))
    val approx = Similarity.annLsh(emb, nQueries = 10, k = 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (es, as) = (pairs(exact), pairs(approx))
    val frame = Similarity.annRecall(exact, approx).collect()
    val gotMean = frame.map(_.getAs[Long]("n_hit")).sum.toDouble /
      frame.map(_.getAs[Long]("n_exact")).sum
    val wantMean = (es & as).size.toDouble / es.size
    assert(math.abs(gotMean - wantMean) < 1e-12,
      s"frame recall $gotMean vs set recall $wantMean")
    // one row per query, even a query the approx path fully missed
    assert(frame.map(_.getAs[Long]("q_id")).toSet == es.map(_._1))
  }

  test("annRecall over the SERVED index: one row per exact query, " +
      "hits bounded by k, recall reproducible across serve calls") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-serverecall").toString
    // pinned geometry: the 0.85 recall floor was measured at the r11
    // sweep's 75%-probed operating point (nCells=8, nProbe=6)
    Similarity.writeAnnIndex(emb, dir, nCells = 8)
    val exact = Similarity.annTopK(emb, nQueries = 10, k = 5)
    def recallRows() = Similarity.annRecall(exact,
        Similarity.annFromIndex(spark, dir, emb)).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("recall")))
      .sortBy(_._1).toSeq
    val r1 = recallRows()
    assert(r1.size == 10, s"one audit row per exact query: $r1")
    r1.foreach { case (q, ne, nh, rec) =>
      assert(nh >= 0 && nh <= ne && ne <= 5, s"query $q: $nh/$ne")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // frozen artifacts: the audit is reproducible serve-over-serve
    assert(r1 == recallRows())
    val recall = r1.map(_._3).sum.toDouble / r1.map(_._2).sum
    info(s"served recall@5 = $recall")
    // the deployment floor the r11 sweep pinned the serve defaults to
    // (nProbe=6, rerank=200: 0.90/0.94/0.94 at sf0.001/0.01/0.1; the
    // old 4/50 defaults measured 0.66-0.76 — this assert is why the
    // audit exists)
    assert(recall >= 0.85, s"served recall@5 $recall below the 0.85 floor")
  }

  test("clusterPurity: weighted purity >= the single-cluster baseline; bitwise deterministic") {
    def run() = Similarity.clusterPurity(emb).collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n_vecs"),
        r.getAs[Int]("dominant_label"), r.getAs[Long]("n_dominant"),
        r.getAs[Double]("purity"))).sortBy(_._1).toSeq
    val p1 = run()
    assert(p1 == run(), "purity frame must be rerun-stable")
    assert(p1.map(_._2).sum == emb.count(), "cells partition the corpus")
    assert(p1.forall(t => t._5 > 0.0 && t._5 <= 1.0))
    // per-cell dominant count >= any single label's count in that
    // cell, so the weighted purity can never fall below the share of
    // the globally dominant label (the k=1 baseline)
    val globalTop = emb.groupBy("label").count().collect()
      .map(_.getAs[Long]("count")).max.toDouble / emb.count()
    val weighted = p1.map(_._4).sum.toDouble / p1.map(_._2).sum
    assert(weighted >= globalTop - 1e-12,
      s"weighted purity $weighted below the k=1 baseline $globalTop")
  }

  test("writeAnnIndex/annFromIndex: served top-k equals the in-memory " +
      "build bit-for-bit; serve path scans stored codes, never retrains") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Long]("rnk"))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annindex-spec").toString
    // AUTO geometry (r12 default): the index derives nCells from the
    // corpus count via the √N rule — the round trip must stay exact
    // against an in-memory build at the SAME derived geometry
    Similarity.writeAnnIndex(emb, dir)
    val autoK = Similarity.annAutoCells(
      spark.read.parquet(s"$dir/codes").count())
    val served = Similarity.annFromIndex(spark, dir, emb)
    // training is deterministic (hash-ordered sample, fixed seeds) and
    // the serve path scores through the SHARED adcSearch core, so the
    // round trip is exact — cos_sim and rank included
    val inMem = rows(Similarity.annIvfPqLearned(emb, nCells = autoK))
    assert(rows(served) == inMem,
      s"missing=${inMem -- rows(served)} extra=${rows(served) -- inMem}")
    // the serve plan reads the stored codes — no corpus re-encode, no
    // codeword argmin projection over the source embeddings
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains(s"$dir/codes"),
      s"serve path must scan the stored codes:\n$plan")
    // plan CONSTRUCTION of the serve path must run no Lloyd's /
    // PQ-training jobs against the corpus: the only eager work is the
    // two constant-size artifact reads. Assert via the artifacts'
    // geometry being read back, not re-derived: corrupt the source
    // frame's tail and the served result must NOT change (a retraining
    // path would see different centroids/codebooks from different
    // data; the index path trains on nothing).
    import org.apache.spark.sql.functions.col
    val perturbed = emb.where(col("vec_id") < 400)
    val servedP = Similarity.annFromIndex(spark, dir, perturbed)
    val inMemP = Similarity.annIvfPqLearned(perturbed)
    // queries (vec_id < 10) and their true neighbors survive the cut;
    // the stored index still covers the FULL corpus, so served top-k
    // can only differ from the truncated in-memory build where the
    // dropped tail held neighbors — assert the index side still
    // returns k rows per query from the full stored corpus
    val perQ = Similarity.annFromIndex(spark, dir, perturbed)
      .groupBy("q_id").count().collect()
      .map(_.getAs[Long]("count"))
    assert(perQ.nonEmpty && perQ.forall(_ >= 5L),
      "the stored index must keep serving the full corpus even when " +
        s"the live source frame shrinks: $perQ")
    assert(servedP.count() >= inMemP.count(),
      "index-served candidates can only exceed a truncated live build")
    // artifact geometry guards: the auto rule's √N cell count landed
    // in the stored centroids (500 encodable vecs → ceil(√500) = 23)
    val cs = spark.read.parquet(s"$dir/centroids").collect()
    val bks = spark.read.parquet(s"$dir/codebooks").collect()
    assert(cs.length == autoK && bks.length == 8 * 64,
      s"centroids ${cs.length} != autoK $autoK")
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == emb.where(col("embedding").isNotNull).count())
    // dim mismatch is refused loudly
    val err = intercept[IllegalArgumentException] {
      Similarity.annFromIndex(spark, dir, emb, dim = 32)
    }
    assert(err.getMessage.contains("dim"))
  }

  test("annFromIndex candidateFilter: neighbors all satisfy the " +
      "predicate, a true filter is the identity, ranks stay dense") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annfilter-spec").toString
    Similarity.writeAnnIndex(emb, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Long]("rnk"))).toSet
    // a tautological filter routes through the join leg yet must be
    // the unfiltered serve bit-for-bit (same stored codes survive)
    assert(rows(Similarity.annFromIndex(spark, dir, emb,
        candidateFilter = Some(lit(true)))) ==
      rows(Similarity.annFromIndex(spark, dir, emb)))
    // a selective filter: every served neighbor satisfies it
    val allowed = emb.where(col("label") === 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(allowed.nonEmpty && allowed.size < emb.count())
    val filtered = Similarity.annFromIndex(spark, dir, emb,
      candidateFilter = Some(col("label") === 3))
    val got = rows(filtered)
    assert(got.nonEmpty)
    assert(got.forall { case (_, n, _, _) => allowed.contains(n) },
      s"disallowed neighbors served: ${got.filterNot(t => allowed(t._2))}")
    // ranking runs AMONG allowed candidates (rank 1 present per
    // query, all ranks ≤ k) — not sparse survivors of an unfiltered
    // ranking, which would start above 1 for most queries
    got.groupBy(_._1).foreach { case (q, ts) =>
      val rnks = ts.map(_._4)
      assert(rnks.min == 1L && rnks.max <= 5L, s"query $q ranks $rnks")
    }
  }

  test("embedDrift: self-drift is zero with cells matching the stored " +
      "codes histogram; a point mass lands 1e6 ppm in one cell; dim guard") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-drift-spec").toString
    // pinned geometry: the expected per-cell histogram below is
    // derived from the 8-cell assignment this spec hand-mirrors
    Similarity.writeAnnIndex(emb, dir, nCells = 8)
    def driftMap(ref: org.apache.spark.sql.DataFrame,
        fresh: org.apache.spark.sql.DataFrame) =
      Similarity.embedDrift(spark, dir, ref, fresh).collect()
        .map(r => r.getAs[Int]("cell") ->
          ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_new"),
            r.getAs[Long]("share_ref_ppm"), r.getAs[Long]("share_new_ppm"),
            r.getAs[Long]("drift_ppm")))).toMap
    // 1. the corpus drifted against ITSELF: zero drift everywhere, and
    // the per-cell masses must equal the histogram of the cells the
    // index actually FILED those vectors in (codes/ was encoded via
    // the same argmax over the same read-back centroids — an exact
    // expectation with no reimplementation of the float kernel)
    val self = driftMap(emb, emb)
    val stored = spark.read.parquet(s"$dir/codes")
      .groupBy("cell").count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("count")).toMap
    assert(self.keySet == (0 until 8).toSet, "one row per stored cell")
    for ((cell, (nr, nn, sr, sn, dp)) <- self) {
      assert(nr == stored.getOrElse(cell, 0L), s"cell $cell vs codes/")
      assert(nn == nr && sr == sn && dp == 0L)
    }
    val tRef = self.values.map(_._1).sum
    // exact integer ppm, recomputable from the output itself
    for ((_, (nr, _, sr, _, _)) <- self)
      assert(sr == nr * 1000000L / tRef)
    assert(self.values.map(_._3).sum <= 1000000L)
    // 2. a one-vector new snapshot: exactly one cell carries the whole
    // new mass at 1e6 ppm; every other cell's drift is its ref share
    val one = emb.where(col("vec_id") === 7L)
    val point = driftMap(emb, one)
    val hit = point.filter(_._2._2 > 0)
    assert(hit.size == 1 && hit.head._2._2 == 1L &&
      hit.head._2._4 == 1000000L, s"got $hit")
    for ((cell, (_, nn, sr, sn, dp)) <- point if nn == 0)
      assert(sn == 0L && dp == sr, s"cell $cell")
    // TV distance from drift_ppm is a valid probability distance
    assert(point.values.map(_._5).sum / 2.0 <= 1000000.0)
    // 3. dim mismatch refused loudly (the annFromIndex guard)
    val err = intercept[IllegalArgumentException] {
      Similarity.embedDrift(spark, dir, emb, emb, dim = 32)
    }
    assert(err.getMessage.contains("dim"))
  }

  test("updateAnnIndex: surgery equals a frozen-artifact re-encode of the " +
      "post-diff corpus; artifacts copied verbatim; self-overwrite refused") {
    import org.apache.spark.sql.functions.col
    def codeSet(p: String) = spark.read.parquet(s"$p/codes").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getSeq[Int](r.fieldIndex("codes")).toList)).toSet
    val base = java.nio.file.Files
      .createTempDirectory("graft-annupd-base").toString
    val oldHalf = emb.where(col("vec_id") < 250)
    val newHalf = emb.where(col("vec_id") >= 250)
    Similarity.writeAnnIndex(oldHalf, base)
    // epoch: retract a slice of the indexed half, add the new half
    val retract = oldHalf.where(col("vec_id") % 5 === 0).select("vec_id")
    val upd = java.nio.file.Files
      .createTempDirectory("graft-annupd-upd").toString
    Similarity.updateAnnIndex(spark, base, upd, retract, newHalf)
    // reference: retract EVERYTHING stored, re-add the whole post-diff
    // corpus — pure frozen-artifact encode through the same door
    val ref = java.nio.file.Files
      .createTempDirectory("graft-annupd-ref").toString
    Similarity.updateAnnIndex(spark, base, ref,
      spark.read.parquet(s"$base/codes").select("vec_id"),
      oldHalf.where(col("vec_id") % 5 =!= 0).unionByName(newHalf))
    assert(codeSet(upd) == codeSet(ref),
      "surgery and frozen-artifact re-encode disagree")
    // retracted ids are gone, added ids are present
    val ids = codeSet(upd).map(_._1)
    assert(retract.collect().map(_.getLong(0)).forall(!ids.contains(_)))
    assert(ids.exists(_ >= 250))
    // artifacts byte-identical to the source index (no retraining)
    def arts(p: String, sub: String) = spark.read.parquet(s"$p/$sub")
      .collect().map(_.toString).sorted.toSeq
    assert(arts(upd, "centroids") == arts(base, "centroids"))
    assert(arts(upd, "codebooks") == arts(base, "codebooks"))
    // the updated index serves through the standard door
    assert(Similarity.annFromIndex(spark, upd, emb).count() > 0)
    val err = intercept[IllegalArgumentException] {
      Similarity.updateAnnIndex(spark, base, base, retract, newHalf)
    }
    assert(err.getMessage.contains("overwrite"))
  }

  test("annAutoCells: √N rule with floor and cap; annGeometry prices " +
      "the serve probe and flags stale geometry from the artifacts") {
    assert(Similarity.annAutoCells(0L) == 8)
    assert(Similarity.annAutoCells(64L) == 8)
    assert(Similarity.annAutoCells(100L) == 10)
    assert(Similarity.annAutoCells(500L) == 23)
    assert(Similarity.annAutoCells(1000000L) == 1000)
    assert(Similarity.annAutoCells(100000000L) == 4096)
    assert(Similarity.annAutoCells(1000000L, maxCells = 100) == 100)
    intercept[IllegalArgumentException] {
      Similarity.annAutoCells(10L, maxCells = 4)
    }
    // a pinned-small index on this corpus: the audit must say so
    val dir = java.nio.file.Files
      .createTempDirectory("graft-anngeom").toString
    Similarity.writeAnnIndex(emb, dir, nCells = 8)
    val g = Similarity.annGeometry(spark, dir).collect()(0)
    assert(g.getAs[Long]("n_cells") == 8L)
    val nVecs = g.getAs[Long]("n_vecs")
    assert(nVecs == spark.read.parquet(s"$dir/codes").count())
    assert(g.getAs[Long]("recommended_cells") ==
      Similarity.annAutoCells(nVecs))
    // 8 stored vs ~23 recommended: stale-small — retrain due
    assert(g.getAs[Boolean]("retrain_due"), s"got $g")
    // probing ALL cells touches the whole corpus: exactly 1e6 ppm
    val full = Similarity.annGeometry(spark, dir, nProbe = 8).collect()(0)
    assert(full.getAs[Long]("probed_fraction_ppm") == 1000000L, s"got $full")
    // nProbe=1 probes each query's own cell (self-cosine is maximal):
    // expected probed mass = Σ (m_c/N)² — hand-computed from the
    // stored cell histogram
    val masses = spark.read.parquet(s"$dir/codes")
      .groupBy("cell").count().collect().map(_.getAs[Long]("count"))
    val want = math.floor(masses.map(m =>
      (m.toDouble / nVecs) * (m.toDouble / nVecs)).sum * 1000000.0).toLong
    val one = Similarity.annGeometry(spark, dir, nProbe = 1).collect()(0)
    assert(one.getAs[Long]("probed_fraction_ppm") == want,
      s"nProbe=1 ppm ${one.getAs[Long]("probed_fraction_ppm")} != $want")
    // serve defaults sit between the two extremes
    val d6 = g.getAs[Long]("probed_fraction_ppm")
    assert(d6 >= want && d6 <= 1000000L, s"$want <= $d6 <= 1e6 violated")
    // an auto-written index is never retrain-due at birth
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-anngeom-auto").toString
    Similarity.writeAnnIndex(emb, dir2)
    val g2 = Similarity.annGeometry(spark, dir2).collect()(0)
    assert(g2.getAs[Long]("n_cells") ==
      Similarity.annAutoCells(g2.getAs[Long]("n_vecs")).toLong)
    assert(!g2.getAs[Boolean]("retrain_due"), s"got $g2")
  }

  test("retrainAnnIndexIfDue: acts exactly when the CURRENT corpus " +
      "says so — mis-pin, growth, and shrinkage all fire; a fresh " +
      "index over the same snapshot is immediately not-due") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annretrain").toString
    // pin a stale-small geometry, then hand the CURRENT snapshot to
    // the scheduled-retrain door
    Similarity.writeAnnIndex(emb, dir, nCells = 8)
    val r1 = Similarity.retrainAnnIndexIfDue(spark, dir, emb).collect()(0)
    assert(r1.getAs[Boolean]("retrained"), s"got $r1")
    assert(!r1.getAs[Boolean]("retrain_due"), s"got $r1")
    assert(r1.getAs[Long]("n_cells") ==
      Similarity.annAutoCells(r1.getAs[Long]("n_vecs")).toLong, s"got $r1")
    // idempotent: the second call reads geometry and does nothing
    val codesBefore = spark.read.parquet(s"$dir/codes").collect()
      .map(_.toString).sorted
    val r2 = Similarity.retrainAnnIndexIfDue(spark, dir, emb).collect()(0)
    assert(!r2.getAs[Boolean]("retrained"), s"got $r2")
    assert(r2.getAs[Long]("n_cells") == r1.getAs[Long]("n_cells"))
    val codesAfter = spark.read.parquet(s"$dir/codes").collect()
      .map(_.toString).sorted
    assert(codesBefore.sameElements(codesAfter),
      "a not-due call must leave the stored codes untouched")
    // GROWTH (the review finding: the decision must read the
    // SNAPSHOT, not the stored index's own row count — an auto-sized
    // index agrees with itself forever): index auto-written over a
    // 20-vec slice (8 cells) must retrain when handed the full
    // 500-vec corpus (√N rule: 23 cells, past the 2× band)
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-annretrain-grow").toString
    val slice = emb.where(col("vec_id") % 25 === 0)
    Similarity.writeAnnIndex(slice, dir2)
    val g = Similarity.retrainAnnIndexIfDue(spark, dir2, emb).collect()(0)
    assert(g.getAs[Boolean]("retrained"),
      s"growth past the band must retrain: $g")
    assert(g.getAs[Long]("n_cells") == 23L, s"got $g")
    assert(!g.getAs[Boolean]("retrain_due"), s"got $g")
    // SHRINKAGE: the 23-cell index handed the 20-vec slice is stale
    // the other way (23 > 2·8) — retrains back down
    val sh = Similarity.retrainAnnIndexIfDue(spark, dir2, slice)
      .collect()(0)
    assert(sh.getAs[Boolean]("retrained"),
      s"shrinkage past the band must retrain: $sh")
    assert(sh.getAs[Long]("n_cells") == 8L, s"got $sh")
  }

  test("q_ann_retrain registration shape: the pinned-64 seed is stale " +
      "at every shipped scale, so the door RETRAINS (not the " +
      "read-and-decline no-op the r12 advice caught with a pinned-8 " +
      "seed that agreed with the auto rule)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annretrain-reg").toString
    val slice = emb.where(col("vec_id") % 10 === 0)
    // mirrors the operator's pqEncodable gate (the spec convention
    // above) — the stored-code count the door's √N rule reads
    import org.apache.spark.sql.functions.{forall, isnan, size => asize}
    val n = slice.where(col("embedding").isNotNull &&
      asize(col("embedding")) === 64 &&
      forall(col("embedding"), x => x.isNotNull && !isnan(x))).count()
    // the registration's staleness precondition: 64 cells is outside
    // the 2× band of the √N recommendation for any slice this corpus
    // family ships (8/8/15 at sf0.001/0.01/0.1)
    assert(64 > 2 * Similarity.annAutoCells(n),
      s"seed geometry must be stale for n=$n")
    Similarity.writeAnnIndex(slice, dir, nCells = 64)
    val r = Similarity.retrainAnnIndexIfDue(spark, dir, slice).collect()(0)
    assert(r.getAs[Boolean]("retrained"),
      s"the registered key must exercise the retrain, got $r")
    assert(r.getAs[Long]("n_cells") == Similarity.annAutoCells(n).toLong,
      s"got $r")
    assert(!r.getAs[Boolean]("retrain_due"), s"got $r")
  }

  test("mineBitext over sentSplit sentences (the q_mine_bitext_sent " +
      "composition): an identical first sentence across the lang " +
      "split mines as the top margin pair") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = Seq(
      (1L, "alpha beta gamma delta. second sentence here", "en"),
      (2L, "alpha beta gamma delta. andere worte hier", "de"),
      (3L, "completely different words entirely. mehr text", "de"))
      .toDF("doc_id", "text", "lang")
    val sents = graft.operators.TextOps.sentSplit(d)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .select((col("sent_id") * lit(1000000000L) + col("doc_id"))
        .as("doc_id"), col("sentence").as("text"), col("lang"))
    val pairs = Similarity.mineBitext(
      graft.operators.TextOps.hashEmbed(sents)
        .withColumnRenamed("doc_id", "vec_id"), sents, k = 2)
      .collect()
    // sentence uid 1 = doc 1's first sentence; its token multiset
    // equals doc 2's first sentence (uid 2) → cosine 1.0, margin max
    assert(pairs.exists(r => r.getAs[Long]("src_id") == 1L &&
      r.getAs[Long]("dst_id") == 2L), pairs.mkString(";"))
  }

  test("sentence-level served bitext, PINNED-geometry recall audit " +
      "(the r11 75%-probed operating point — the registered keys ride " +
      "the √N auto index, audited by the production-serve spec below): " +
      "pairs off the sentence IVF-PQ index recover the exact leg's " +
      "pairs on the gate corpus") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val sents = graft.operators.TextOps.sentSplit(d.withColumn("text",
        graft.operators.TextOps.syntheticSentences(col("text"))))
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .select((col("sent_id") * lit(1000000000L) + col("doc_id"))
        .as("doc_id"), col("sentence").as("text"), col("lang"))
      .persist()
    val semb = graft.operators.TextOps.hashEmbed(sents)
      .withColumnRenamed("doc_id", "vec_id").persist()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sentbitext").toString
    Similarity.writeAnnIndex(semb, dir, nCells = 8)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"))).toSet
    val exact = pairSet(Similarity.mineBitext(semb, sents))
    val served = pairSet(Similarity.mineBitextIndexed(spark, dir, semb, sents))
    assert(exact.nonEmpty, "the gate corpus must mine sentence pairs")
    val overlap = (exact & served).size.toDouble / exact.size
    assert(overlap >= 0.8,
      s"served recall $overlap: exact=${exact.size} served=${served.size}")
  }

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("mineBitext: mutual-best pairs across the lang split, margins " +
      "over threshold, rerun-stable") {
    def run() = Similarity.mineBitext(emb, docs).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Double]("margin")))
      .sortBy(_._1).toSeq
    val p1 = run()
    assert(p1.nonEmpty, "the gate corpus must mine at least one pair")
    assert(p1 == run(), "mined pairs must be rerun-stable")
    // mutual-best: each side appears in at most one pair
    assert(p1.map(_._1).distinct.size == p1.size, "duplicate src side")
    assert(p1.map(_._2).distinct.size == p1.size, "duplicate dst side")
    p1.foreach { case (s0, d0, c, m) =>
      assert(m >= 1.05, s"pair ($s0,$d0) margin $m below threshold")
      assert(c >= -1.0001 && c <= 1.0001, s"cosine $c out of range")
      assert(s0 < 200, s"src $s0 outside the query window")
    }
    // side assignment honors the documents lang column
    val lang = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    assert(p1.forall { case (s0, _, _, _) => lang(s0) == "en" })
    assert(p1.forall { case (_, d0, _, _) => lang(d0) == "de" })
  }

  test("mineBitext: a planted parallel pair is mined, orthogonal and " +
      "zero-denominator vectors are not") {
    import spark.implicits._
    val dim = 64
    def basis(i: Int, scale: Float): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == i) scale else 0.0f)
    def mix(i: Int, j: Int, wi: Float, wj: Float): Seq[Float] =
      Seq.tabulate(dim)(x =>
        if (x == i) wi else if (x == j) wj else 0.0f)
    // en 0 ↔ de 10 planted parallel (cos ≈ 0.995); en 1/2 and de
    // 11/12/13 pairwise orthogonal to everything → their cosines
    // round to 0, the k-NN mean denominator sums to 0, and the
    // >0 guard drops them rather than dividing
    val vecs = Seq(
      (0L, basis(0, 1.0f)), (1L, basis(2, 1.0f)), (2L, basis(3, 1.0f)),
      (10L, mix(0, 1, 0.9f, 0.09f)), (11L, basis(4, 1.0f)),
      (12L, basis(5, 1.0f)), (13L, basis(6, 1.0f)))
      .toDF("vec_id", "embedding")
    val langs = Seq((0L, "en"), (1L, "en"), (2L, "en"),
      (10L, "de"), (11L, "de"), (12L, "de"), (13L, "de"))
      .toDF("doc_id", "lang")
    val mined = Similarity.mineBitext(vecs, langs).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Double]("margin")))
    assert(mined.map(t => (t._1, t._2)).toSeq == Seq((0L, 10L)),
      s"expected exactly the planted pair, got ${mined.toSeq}")
    // margin ≈ cos/(avg of [cos,0,0,0]) ≈ 4: far over threshold
    assert(mined.head._3 > 2.0, s"planted margin ${mined.head._3}")
  }

  test("mineBitextAll: the batched full-sweep equals one unbounded " +
      "run bit-for-bit; an absent src side yields an empty frame") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Double]("margin"))).toSet
    val single = rows(Similarity.mineBitext(emb, docs,
      nQueries = Long.MaxValue))
    assert(single.nonEmpty, "the gate corpus must mine pairs unbounded")
    // batchSize 100 on ~500 ids forces several slices; the sweep must
    // reproduce the single run exactly (per-pair quantities are
    // batch-independent, mutual-best runs over the union)
    val swept = rows(Similarity.mineBitextAll(emb, docs, batchSize = 100))
    assert(swept == single,
      s"missing=${single -- swept} extra=${swept -- single}")
    assert(Similarity.mineBitextAll(emb, docs, srcLang = "xx").count() == 0L,
      "no src side -> empty frame, not a crash")
  }

  // clone fixture for the dedup-first legs: 4 verbatim copies per side
  // of a planted parallel pair saturate every k-NN neighborhood at
  // k=4, so the ratio margin collapses to ~1 and the exact miner
  // correctly returns NOTHING — the r11-documented degeneracy the
  // dedup-first legs exist to kill
  private def cloneFixture = {
    val dim = 64
    def basis(i: Int, scale: Float): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == i) scale else 0.0f)
    def mix(i: Int, j: Int, wi: Float, wj: Float): Seq[Float] =
      Seq.tabulate(dim)(x => if (x == i) wi else if (x == j) wj else 0.0f)
    val vEn = basis(0, 1.0f)
    val vDe = mix(0, 1, 0.9f, 0.09f)
    val vecs = Seq(
      (0L, vEn), (1L, vEn), (2L, vEn), (3L, vEn), // en clones
      (4L, basis(2, 1.0f)), (5L, basis(3, 1.0f)), // en strangers
      (10L, vDe), (11L, vDe), (12L, vDe), (13L, vDe), // de clones
      (14L, basis(4, 1.0f)), (15L, basis(5, 1.0f))) // de strangers
      .toDF("vec_id", "embedding")
    val langs = Seq(0L, 1L, 2L, 3L, 4L, 5L).map(_ -> "en")
      .++(Seq(10L, 11L, 12L, 13L, 14L, 15L).map(_ -> "de"))
      .toDF("doc_id", "lang")
    (vecs, langs)
  }

  test("mineBitextDeduped: clone-saturated corpus — the exact miner " +
      "collapses to zero, the dedup-first leg recovers the planted " +
      "pair and composes members back") {
    val (vecs, langs) = cloneFixture
    // the degeneracy is real: every fwd/rev neighborhood is all-clones,
    // margin -> 1, threshold suppresses everything
    assert(Similarity.mineBitext(vecs, langs).count() == 0L,
      "clone saturation must collapse the exact miner's margins")
    val dd = Similarity.mineBitextDeduped(vecs, langs).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Long]("src_rep"), r.getAs[Long]("dst_rep"),
        r.getAs[Double]("margin")))
    // rep pairs == mineBitext on the DEDUPLICATED corpus
    import org.apache.spark.sql.functions.col
    val uniq = vecs.where(col("vec_id").isin(0L, 4L, 5L, 10L, 14L, 15L))
    val wantReps = Similarity.mineBitext(uniq, langs).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"))).toSet
    assert(wantReps == Set((0L, 10L)), s"fixture sanity: $wantReps")
    assert(dd.map(t => (t._3, t._4)).toSet == wantReps,
      s"rep pairs diverged from the deduplicated exact run: ${dd.toSeq}")
    // member composition: every (src clone x dst clone) combination
    assert(dd.map(t => (t._1, t._2)).toSet ==
      (for (s <- 0L to 3L; d <- 10L to 13L) yield (s, d)).toSet,
      s"member fan-out wrong: ${dd.toSeq}")
    assert(dd.forall(_._5 >= 1.05))
    // clone-free corpus: dedup-first is the identity (reps == ids)
    val dim = 64
    def basis(i: Int, scale: Float): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == i) scale else 0.0f)
    def mix(i: Int, j: Int, wi: Float, wj: Float): Seq[Float] =
      Seq.tabulate(dim)(x => if (x == i) wi else if (x == j) wj else 0.0f)
    val clean = Seq(
      (0L, basis(0, 1.0f)), (1L, basis(2, 1.0f)), (2L, basis(3, 1.0f)),
      (10L, mix(0, 1, 0.9f, 0.09f)), (11L, basis(4, 1.0f)),
      (12L, basis(5, 1.0f)), (13L, basis(6, 1.0f)))
      .toDF("vec_id", "embedding")
    val cleanLangs = Seq((0L, "en"), (1L, "en"), (2L, "en"),
      (10L, "de"), (11L, "de"), (12L, "de"), (13L, "de"))
      .toDF("doc_id", "lang")
    val cleanDd = Similarity.mineBitextDeduped(clean, cleanLangs).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Long]("src_rep"), r.getAs[Long]("dst_rep")))
    assert(cleanDd.toSeq == Seq((0L, 10L, 0L, 10L)),
      s"clone-free corpus: dedup-first must be the identity: " +
        s"${cleanDd.toSeq}")
  }

  test("mineBitextIndexedDeduped: served dedup-first equals the exact " +
      "dedup-first leg under a full probe; spurious clone pairs gone") {
    val (vecs, langs) = cloneFixture
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bitext-dd-idx").toString
    Similarity.writeAnnIndex(vecs, dir, nCells = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Long]("src_rep"), r.getAs[Long]("dst_rep"),
        r.getAs[Double]("cos_sim"), r.getAs[Double]("margin"))).toSet
    // nProbe = nCells and rerank > corpus: the served shortlist is
    // exhaustive, so the served leg must equal the exact leg exactly
    val served = rows(Similarity.mineBitextIndexedDeduped(spark, dir,
      vecs, langs, nProbe = 8, rerank = 100))
    val exact = rows(Similarity.mineBitextDeduped(vecs, langs))
    assert(served == exact,
      s"missing=${exact -- served} extra=${served -- exact}")
    assert(served.map(t => (t._3, t._4)) == Set((0L, 10L)))
  }

  // clone-saturated SENTENCE fixture — the q_mine_bitext_sent_dedup
  // composition end-to-end from TEXT (sentSplit → hashEmbed → miner),
  // not pre-built vectors: every doc on each side opens with the SAME
  // boilerplate sentence (the crawl reality the r12 verdict named —
  // sentences are the most-duplicated unit, boilerplate repeats per
  // PAGE), plus one unique single-token sentence per doc (hashEmbed
  // makes a single token a one-hot basis vector, so strangers are
  // exactly orthogonal — the doc-level cloneFixture geometry, derived
  // from real text)
  private def sentCloneFixture = {
    import org.apache.spark.sql.functions.{col, lit}
    val d = Seq(
      (0L, "alpha beta gamma delta. zebra", "en"),
      (1L, "alpha beta gamma delta. quark", "en"),
      (2L, "alpha beta gamma delta. nimbus", "en"),
      (3L, "alpha beta gamma delta. comet", "en"),
      (10L, "alpha beta gamma delta. wombat", "de"),
      (11L, "alpha beta gamma delta. python", "de"),
      (12L, "alpha beta gamma delta. ember", "de"),
      (13L, "alpha beta gamma delta. magnet", "de"))
      .toDF("doc_id", "text", "lang")
    val sents = graft.operators.TextOps.sentSplit(d)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .select((col("sent_id") * lit(1000000000L) + col("doc_id"))
        .as("doc_id"), col("sentence").as("text"), col("lang"))
    val semb = graft.operators.TextOps.hashEmbed(sents)
      .withColumnRenamed("doc_id", "vec_id")
    (sents, semb)
  }

  test("mineBitextDeduped over sentences (q_mine_bitext_sent_dedup " +
      "shape): boilerplate clone saturation collapses the exact " +
      "sentence miner to zero; dedup-first recovers the planted pair " +
      "and fans members back out") {
    val (sents, semb) = sentCloneFixture
    // fixture sanity: the planted boilerplate embeds identically on
    // both sides (hashEmbed is lang-agnostic) and the single-token
    // strangers are pairwise orthogonal one-hots
    val embs = semb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    assert(embs(0L) == embs(10L), "planted boilerplate must embed equal")
    val strangers = Seq(1000000000L, 1000000001L, 1000000002L,
      1000000003L, 1000000010L, 1000000011L, 1000000012L, 1000000013L)
    for (a <- strangers; b <- strangers if a < b)
      assert(embs(a).zip(embs(b)).map { case (x, y) => x * y }.sum == 0.0f,
        s"stranger sentences $a/$b must be orthogonal (token bucket " +
          "collision — pick different filler tokens)")
    // the degeneracy: every fwd/rev neighborhood of the boilerplate is
    // all-clones, margin → 1, threshold suppresses everything; the
    // stranger sentences are orthogonal (zero k-NN means → excluded)
    assert(Similarity.mineBitext(semb, sents).count() == 0L,
      "clone saturation must collapse the exact sentence miner")
    val dd = Similarity.mineBitextDeduped(semb, sents).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Long]("src_rep"), r.getAs[Long]("dst_rep"),
        r.getAs[Double]("margin")))
    // the rep pair is the two sides' min-uid boilerplate sentences
    assert(dd.map(t => (t._3, t._4)).toSet == Set((0L, 10L)),
      s"rep pairs: ${dd.toSeq}")
    // member fan-out: every (en boilerplate clone × de boilerplate
    // clone) — 4×4, the honest semantics of mining a duplicated corpus
    assert(dd.map(t => (t._1, t._2)).toSet ==
      (for (s <- 0L to 3L; d <- 10L to 13L) yield (s, d)).toSet,
      s"member fan-out wrong: ${dd.toSeq}")
    assert(dd.forall(_._5 >= 1.05))
  }

  test("production sentence serve (q_mine_bitext_sent_dedup_ann " +
      "shape): dedup-first pairs off the √N AUTO-geometry sentence " +
      "index recover the dedup-first exact leg on the gate corpus") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val sents = graft.operators.TextOps.sentSplit(d.withColumn("text",
        graft.operators.TextOps.syntheticSentences(col("text"))))
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .select((col("sent_id") * lit(1000000000L) + col("doc_id"))
        .as("doc_id"), col("sentence").as("text"), col("lang"))
      .persist()
    val semb = graft.operators.TextOps.hashEmbed(sents)
      .withColumnRenamed("doc_id", "vec_id").persist()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sentbitext-auto").toString
    // the REGISTERED geometry: writeAnnIndex's √N auto rule — the r12
    // verdict's pinned-8/75%-probed sentence index was the last
    // corpus-linear serve leg; this spec audits the auto shape
    Similarity.writeAnnIndex(semb, dir)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"))).toSet
    val exact = pairSet(Similarity.mineBitextDeduped(semb, sents,
      nQueries = 100))
    // nProbe = 10, the registered sentence-serve operating point: the
    // near-uniform hash embeddings are IVF's adversarial case (recall
    // tracks probed fraction), so the serve probes a few more cells —
    // probed mass stays ~O(nProbe·√N), the sublinear production shape
    // (vs the retired pin's fixed 75% of ANY corpus size)
    val served = pairSet(Similarity.mineBitextIndexedDeduped(spark, dir,
      semb, sents, nQueries = 100, nProbe = 10))
    assert(exact.nonEmpty, "the gate corpus must mine sentence rep pairs")
    val recall = (exact & served).size.toDouble / exact.size
    info(s"sentence dedup-serve recall vs exact: $recall " +
      s"(${served.size} served, ${exact.size} exact)")
    assert(recall >= 0.8,
      s"served recall $recall: exact=${exact.size} served=${served.size}")
    // the plain served sentence leg (q_mine_bitext_sent_ann shape)
    // rides the same auto index — it must still mine pairs
    val plain = pairSet(Similarity.mineBitextIndexed(spark, dir,
      semb, sents, nQueries = 100, nProbe = 10))
    assert(plain.nonEmpty,
      "auto-geometry non-dedup sentence serve must still mine pairs")
    sents.unpersist(); semb.unpersist()
  }

  test("mineBitextIndexed: served pairs recall the exact miner's, " +
      "same mutual/threshold contract, exact cosines on survivors") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bitext-idx").toString
    // pinned geometry: the 0.80 recall floor below was measured at
    // the r11 sweep's 75%-probed operating point (nCells=8, nProbe=6)
    Similarity.writeAnnIndex(emb, dir, nCells = 8)
    val exact = Similarity.mineBitext(emb, docs).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id")))
      .toSet
    val served = Similarity.mineBitextIndexed(spark, dir, emb, docs)
      .collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Double]("margin")))
    // contract invariants hold on the served leg too
    assert(served.map(_._1).distinct.length == served.length)
    assert(served.map(_._2).distinct.length == served.length)
    assert(served.forall(_._4 >= 1.05))
    val recall = if (exact.isEmpty) 1.0
      else served.map(t => (t._1, t._2)).count(exact.contains).toDouble /
        exact.size
    info(s"bitext serve recall vs exact: $recall " +
      s"(${served.length} served, ${exact.size} exact)")
    // measured 0.914 on the gate corpus at the pinned serve defaults
    // (nProbe=6, rerank=200); floor leaves noise room
    assert(recall >= 0.80,
      s"served bitext recall $recall below floor (exact=${exact.size})")
    // refined cosines are TRUE cosines: a served pair that the exact
    // leg also mined carries the identical 4-dp cosine
    val exactCos = Similarity.mineBitext(emb, docs).collect()
      .map(r => ((r.getAs[Long]("src_id"), r.getAs[Long]("dst_id")),
        r.getAs[Double]("cos_sim"))).toMap
    served.foreach { case (s0, d0, c, _) =>
      exactCos.get((s0, d0)).foreach(ec =>
        assert(ec == c, s"pair ($s0,$d0) served cos $c vs exact $ec"))
    }
  }

  test("dedup-first star-reduce is the aggregate idiom (r13 verdict " +
      "#1): a 1e5-clone hot class runs through BOTH legs — partial " +
      "map-side min folds it before the shuffle, no embedding-keyed " +
      "window anywhere in either plan") {
    import org.apache.spark.sql.functions.{array, col, lit}
    val dim = 64
    def vec(weights: Map[Int, Float]) =
      array(Seq.tabulate(dim)(j =>
        lit(weights.getOrElse(j, 0.0f))): _*)
    // en side: ONE embedding cloned 100 000× (the clone-saturated
    // crawl these legs exist for — the r13 window shape would land
    // all 1e5 rows on one sorting task) + two orthogonal strangers;
    // de side: the planted parallel vector cloned 4× + two strangers
    val en = spark.range(0L, 100000L)
      .select(col("id").as("vec_id"), vec(Map(0 -> 1.0f)).as("embedding"))
      .unionByName(spark.range(100001L, 100002L).select(
        col("id").as("vec_id"), vec(Map(2 -> 1.0f)).as("embedding")))
      .unionByName(spark.range(100002L, 100003L).select(
        col("id").as("vec_id"), vec(Map(3 -> 1.0f)).as("embedding")))
    val de = spark.range(200000L, 200004L)
      .select(col("id").as("vec_id"),
        vec(Map(0 -> 0.9f, 1 -> 0.09f)).as("embedding"))
      .unionByName(spark.range(200010L, 200011L).select(
        col("id").as("vec_id"), vec(Map(4 -> 1.0f)).as("embedding")))
      .unionByName(spark.range(200011L, 200012L).select(
        col("id").as("vec_id"), vec(Map(5 -> 1.0f)).as("embedding")))
    val vecs = en.unionByName(de)
    val langs = en.select(col("vec_id").as("doc_id"), lit("en").as("lang"))
      .unionByName(de.select(col("vec_id").as("doc_id"),
        lit("de").as("lang")))
    def audit(df: org.apache.spark.sql.DataFrame, leg: String): Unit = {
      val p = df.queryExecution.executedPlan.toString
      for (c <- Seq("embedding", "q_emb", "n_emb"))
        assert(!p.contains(s"windowspecdefinition($c"),
          s"$leg: embedding-keyed window survived in the plan")
      assert(p.contains("partial_min"),
        s"$leg: no map-side partial min visible in the plan:\n" +
          p.linesIterator.take(40).mkString("\n"))
    }
    val dd = Similarity.mineBitextDeduped(vecs, langs)
    audit(dd, "exact leg")
    // the hot class folds to ONE rep; members fan back out 1e5 × 4
    assert(dd.count() == 400000L, "member fan-out must be 1e5 x 4")
    val reps = dd.select("src_rep", "dst_rep").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reps == Set((0L, 200000L)), s"rep pairs: $reps")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bitext-hotclone-idx").toString
    Similarity.writeAnnIndex(vecs, dir, nCells = 8)
    val served = Similarity.mineBitextIndexedDeduped(spark, dir,
      vecs, langs, nProbe = 8, rerank = 100)
    audit(served, "served leg")
    assert(served.count() == 400000L,
      "served member fan-out must be 1e5 x 4")
  }
}
