package graft

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the native expressions: the codegen'd kernels
  * must agree with independent JVM reference computations on
  * generated inputs (unicode strings, arbitrary float vectors) — this
  * exercises the UTF8String byte handling and the generated-code path
  * that hand-picked vectors can't cover.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("hmac_sha256_hex agrees with javax.crypto on generated unicode inputs") {
    GraftFunctions.register(spark)
    val gen = for {
      data <- Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
        // incl. an astral-plane codepoint (surrogate pair in UTF-16)
        Gen.listOf(Gen.oneOf("é", "中", "𝄞", "ß", " "))
          .map(_.mkString))
      key <- Gen.asciiPrintableStr.suchThat(_.nonEmpty)
    } yield (data, key)
    val cases = sample(gen, 200)
    def expected(data: String, key: String): String = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key.getBytes("UTF-8"), "HmacSHA256"))
      mac.doFinal(data.getBytes("UTF-8"))
        .map(b => f"$b%02X").mkString
    }
    val got = cases.toDF("d", "k")
      .select(call_function("hmac_sha256_hex", col("d"), col("k")).as("h"))
      .as[String].collect()
    cases.zip(got).foreach { case ((d, k), h) =>
      assert(h == expected(d, k), s"mismatch for data=$d key=$k")
    }
  }

  test("annLsh recall tracks the 1-(1-p^b)^L hyperplane bound across (L, b) configs") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    // true top-k WITH their cosines: each neighbor's per-table collision
    // prob is p^b with p = 1 - theta/pi, so its find prob over L
    // independent tables is 1-(1-p^b)^L; expected recall = mean over
    // the true neighbor set. The generated (L, b) grid replaces the
    // old single-config point assertion.
    val exact = Similarity.annTopK(emb, nQueries = 10, k = 5).collect()
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("n_id")),
        r.getAs[Double]("cos_sim"))).toMap
    val combos = sample(Gen.zip(Gen.oneOf(4, 8, 12), Gen.oneOf(2, 3, 4)), 8)
      .distinct.take(5)
    assert(combos.size >= 3, "need a real grid of configurations")
    combos.foreach { case (l, b) =>
      val approx = Similarity.annLsh(emb, nQueries = 10, k = 5,
        nTables = l, nPlanes = b).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
      val measured = (exact.keySet & approx).size.toDouble / exact.size
      val expected = exact.values.map { c =>
        val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, c))) / math.Pi
        1.0 - math.pow(1.0 - math.pow(p, b), l)
      }.sum / exact.size
      info(f"L=$l b=$b measured=$measured%.3f expected=$expected%.3f")
      assert(math.abs(measured - expected) <= 0.2,
        f"L=$l b=$b: measured recall $measured%.3f vs bound $expected%.3f " +
          "outside tolerance")
    }
  }

  test("cosine_sim agrees with direct double accumulation on generated vectors") {
    GraftFunctions.register(spark)
    val genVec = Gen.listOfN(16,
      Gen.chooseNum(-1000f, 1000f)).map(_.toArray)
    val cases = sample(Gen.zip(genVec, genVec), 200)
    def expected(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (a, b).zipped.foreach { (x, y) =>
        dot += x.toDouble * y.toDouble
        na += x.toDouble * x.toDouble; nb += y.toDouble * y.toDouble
      }
      dot / math.sqrt(na * nb)
    }
    val got = cases.toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), c) =>
      val e = expected(a, b)
      assert((e.isNaN && c.isNaN) || c == e, s"mismatch: got $c want $e")
    }
  }

  /** Independent in-memory model of [[graft.operators.Dedup.cutSpans]]
    * semantics: gram-ownership by globally-first (doc_id, pos),
    * covered-by-all token cut, short docs pass through. Deliberately
    * naive (quadratic over tiny corpora) so it shares no structure
    * with the distributed plan it checks.
    */
  private def refCutSpans(docs: Seq[(Long, String)], n: Int,
      minDocs: Int): Map[Long, (String, Long, Long)] = {
    // Spark's split(text, " ") keeps empty tokens, incl. trailing ones
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occ = for {
      (id, tk) <- toks.toSeq if tk.size >= n
      p <- 0 to (tk.size - n)
    } yield (id, p, tk.slice(p, p + n).mkString(" "))
    val dup = occ.groupBy(_._3)
      .filter { case (_, os) => os.map(_._1).distinct.size >= minDocs }.keySet
    val owner = occ.filter(o => dup(o._3)).groupBy(_._3)
      .map { case (g, os) => g -> os.map(o => (o._1, o._2)).min }
    val marked = occ.collect {
      case (id, p, g) if dup(g) && owner(g) != ((id, p)) => (id, p)
    }.toSet
    docs.map { case (id, text) =>
      val tk = toks(id)
      if (tk.size < n) id -> (text, tk.size.toLong, 0L)
      else {
        val keptIdx = (for {
          p <- 0 to (tk.size - n) if !marked((id, p))
          ti <- p until (p + n)
        } yield ti).toSet
        val kept = tk.zipWithIndex.collect { case (t, i) if keptIdx(i) => t }
        id -> (kept.mkString(" "), tk.size.toLong, (tk.size - kept.size).toLong)
      }
    }.toMap
  }

  test("cutSpans matches the keep-one-copy reference model on generated corpora") {
    import graft.operators.Dedup
    // tiny alphabet + short docs force heavy gram collisions: repeated
    // spans within a doc, across docs, full-doc duplicates, docs
    // shorter than n, empty docs, and double spaces (empty tokens)
    val genDoc = Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "")).map(_.mkString(" ")))
    val genCorpus = Gen.chooseNum(2, 8).flatMap(nd => Gen.listOfN(nd, genDoc))
    val corpora = sample(genCorpus, 30)
    corpora.zipWithIndex.foreach { case (texts, ci) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val want = refCutSpans(docs, n = 3, minDocs = 2)
      val got = Dedup.cutSpans(docs.toDF("doc_id", "text"), n = 3, minDocs = 2)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("text_clean"), r.getAs[Long]("n_tok"),
            r.getAs[Long]("n_cut_tok"))))
        .toMap
      assert(got == want,
        s"corpus #$ci diverged\n docs=$docs\n got=$got\n want=$want")
    }
  }

  test("dupSpanMerge matches an independent gaps-and-islands model on generated corpora") {
    import graft.operators.Dedup
    // same dup-heavy generator as the cutSpans property; the model
    // here is the island merge: per doc, maximal consecutive runs of
    // duplicated window positions, each reported as
    // (tok_start, n_span_tok = span of covered tokens, n_windows)
    def refMerge(docs: Seq[(Long, String)], n: Int,
        minDocs: Int): Set[(Long, Long, Long, Long)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val occ = for {
        (id, tk) <- toks if tk.size >= n
        p <- 0 to (tk.size - n)
      } yield (id, p, tk.slice(p, p + n).mkString(" "))
      val dup = occ.groupBy(_._3)
        .filter { case (_, os) => os.map(_._1).distinct.size >= minDocs }.keySet
      occ.filter(o => dup(o._3)).groupBy(_._1).flatMap { case (id, os) =>
        val runs = os.map(_._2).distinct.sorted
          .foldLeft(List.empty[List[Int]]) {
            case (cur :: rest, p) if cur.head == p - 1 => (p :: cur) :: rest
            case (acc, p) => List(p) :: acc
          }
        runs.map(r => (id, r.min.toLong, (r.max - r.min + n).toLong,
          r.size.toLong))
      }.toSet
    }
    val genDoc = Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "")).map(_.mkString(" ")))
    val corpora = sample(
      Gen.chooseNum(2, 8).flatMap(nd => Gen.listOfN(nd, genDoc)), 30)
    corpora.zipWithIndex.foreach { case (texts, ci) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val want = refMerge(docs, n = 3, minDocs = 2)
      val got = Dedup.dupSpanMerge(docs.toDF("doc_id", "text"), n = 3,
        minDocs = 2).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok_start"),
          r.getAs[Long]("n_span_tok"), r.getAs[Long]("n_windows"))).toSet
      assert(got == want,
        s"corpus #$ci diverged\n docs=$docs\n got=$got\n want=$want")
    }
  }

  test("heavyHitters honors the Misra-Gries bounds on generated skewed streams") {
    import graft.operators.TextOps
    // zipf-ish skew plus a singleton tail, random capacity and random
    // partition counts: every (stream, k, parts) draw must satisfy
    // est <= true, true - est <= N/(k+1), and presence of every token
    // above that bound — the guarantees, never a specific estimate
    // (sketch-regime estimates legitimately vary with merge order)
    val genTok = Gen.frequency(
      8 -> Gen.const("alpha"), 4 -> Gen.const("beta"),
      2 -> Gen.const("gamma"),
      1 -> Gen.chooseNum(0, 50).map(i => s"u$i"))
    val genCase = for {
      len <- Gen.chooseNum(1, 300)
      toks <- Gen.listOfN(len, genTok)
      k <- Gen.chooseNum(1, 6)
      parts <- Gen.chooseNum(1, 8)
    } yield (toks, k, parts)
    sample(genCase, 25).zipWithIndex.foreach {
      case ((toks, k, parts), ci) =>
        val truth = toks.groupBy(identity)
          .map { case (t, g) => t -> g.size.toLong }
        val bound = toks.size.toLong / (k + 1)
        val d = toks.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("doc_id", "text").repartition(parts)
        val got = TextOps.heavyHitters(d, capacity = k, minCount = 1)
          .collect()
          .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count"))
          .toMap
        assert(got.size <= k, s"case #$ci: size ${got.size} > capacity $k")
        got.foreach { case (t, est) =>
          assert(est <= truth(t), s"case #$ci: $t overcounted $est>${truth(t)}")
          assert(truth(t) - est <= bound,
            s"case #$ci: $t undercounted past N/(k+1): $est vs ${truth(t)}")
        }
        truth.filter(_._2 > bound).keys.foreach { t =>
          assert(got.contains(t),
            s"case #$ci: $t above N/(k+1)=$bound must be present")
        }
    }
  }

  /** Independent in-memory model of
    * [[graft.operators.Similarity.mineBitext]]: brute-force 4-dp
    * cosines, fixed-point k-NN means, ratio margin, mutual best.
    * Deliberately naive (nested loops over tiny corpora) so it shares
    * no structure with the distributed plan it checks.
    */
  private def refMineBitext(vecs: Seq[(Long, Array[Float], String)],
      k: Int, thr: Double): Set[(Long, Long, Double)] = {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos4(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (a, b).zipped.foreach { (x, y) =>
        dot += x.toDouble * y.toDouble
        na += x.toDouble * x.toDouble; nb += y.toDouble * y.toDouble
      }
      val c = dot / math.sqrt(na * nb)
      if (c.isNaN) Double.NaN else r4(c)
    }
    val a = vecs.collect { case (id, v, "en") => (id, v) }
    val b = vecs.collect { case (id, v, "de") => (id, v) }
    def topk(scored: Seq[(Long, Double)]): Seq[(Long, Double)] =
      scored.filter(!_._2.isNaN).sortBy(t => (-t._2, t._1)).take(k)
    val fwd = a.filter(_._1 < 200).map { case (qid, qe) =>
      qid -> topk(b.map { case (nid, ne) => (nid, cos4(qe, ne)) })
    }.filter(_._2.nonEmpty).toMap
    def ttAvg(cs: Seq[Double]): Double =
      cs.map(c => math.round(c * 10000)).sum.toDouble / (cs.size * 10000.0)
    val fa = fwd.map { case (qid, tks) => qid -> ttAvg(tks.map(_._2)) }
    val ra = fwd.values.flatten.map(_._1).toSet.toSeq.map { nid: Long =>
      val ne = b.find(_._1 == nid).get._2
      val tks = topk(a.filter(_._1 != nid)
        .map { case (rid, re) => (rid, cos4(ne, re)) })
      nid -> (if (tks.isEmpty) Double.NaN else ttAvg(tks.map(_._2)))
    }.toMap
    val sp = for {
      (qid, tks) <- fwd.toSeq
      (nid, c) <- tks
      if !ra(nid).isNaN && fa(qid) + ra(nid) > 0
      m = r4(c / ((fa(qid) + ra(nid)) / 2.0))
      if m >= thr
    } yield (qid, nid, c, m)
    val bestF = sp.groupBy(_._1).values
      .map(_.minBy(p => (-p._4, p._2))).toSet
    val bestR = sp.groupBy(_._2).values
      .map(_.minBy(p => (-p._4, p._1))).toSet
    bestF.intersect(bestR).map(p => (p._1, p._2, p._4))
  }

  test("mineBitext matches the independent margin-mining reference " +
      "on generated corpora (incl. zero-norm vectors)") {
    import graft.operators.Similarity
    val genVec = Gen.frequency(
      9 -> Gen.listOfN(8, Gen.chooseNum(-5f, 5f)).map(_.toArray),
      1 -> Gen.const(Array.fill(8)(0.0f))) // zero norm → NaN leg
    val genRow = for { v <- genVec; l <- Gen.oneOf("en", "de", "fr") }
      yield (v, l)
    val corpora = sample(
      Gen.chooseNum(4, 14).flatMap(n => Gen.listOfN(n, genRow)), 20)
    corpora.zipWithIndex.foreach { case (rows, ci) =>
      val vecs = rows.zipWithIndex.map { case ((v, l), i) =>
        (i.toLong, v, l) }
      val emb = vecs.map(t => (t._1, t._2.toSeq))
        .toDF("vec_id", "embedding")
      val docs = vecs.map(t => (t._1, t._3)).toDF("doc_id", "lang")
      val got = Similarity
        .mineBitext(emb, docs, k = 3, marginThreshold = 1.0)
        .collect()
        .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
          r.getAs[Double]("margin"))).toSet
      val want = refMineBitext(vecs, k = 3, thr = 1.0)
      assert(got == want, s"case #$ci: got $got want $want " +
        s"(corpus: ${vecs.map(t => (t._1, t._3))})")
    }
  }
}
