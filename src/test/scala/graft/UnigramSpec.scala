package graft

import graft.operators.TextOps

/** Unigram-LM tokenizer family ([[TextOps.unigramLearn]] /
  * [[TextOps.unigramTokens]] / the persisted serve leg): the Viterbi
  * DP against known answers and an independent local scorer, the
  * hard-EM training contracts (planted multi-char unit survives,
  * single-char coverage floor, vocab bound, determinism), per-doc
  * fertility/UNK accounting, concat-reconstruction as a randomized
  * property, and the write/serve round trip.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private def df(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")

  // independent local scorer: total logprob of a given segmentation
  private def score(ps: Seq[String], lp: Map[String, Double]): Double =
    ps.map(p => lp.getOrElse(p, if (p.length == 1) -100.0
      else Double.NegativeInfinity)).sum

  // every segmentation of w into pieces of length <= maxLen (small
  // inputs only) — the exhaustive reference the DP must beat or tie
  private def allSegs(w: String, maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap(l =>
      allSegs(w.drop(l), maxLen).map(w.take(l) +: _))

  test("unigramApply: maximum-likelihood segmentation matches the " +
      "exhaustive reference; ties break to the longest piece; unseen " +
      "chars fall to the UNK floor") {
    val lp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.5, "c" -> -3.0,
      "abc" -> -2.2, "bc" -> -1.4)
    for (w <- Seq("abc", "abcabc", "aabbcc", "cabab", "b")) {
      val got = TextOps.unigramApply(w, lp, 3)
      assert(got.mkString == w, s"$w reconstructs")
      val bestRef = allSegs(w, 3).map(s => score(s, lp)).max
      assert(math.abs(score(got.toSeq, lp) - bestRef) < 1e-9,
        s"$w: got ${got.toSeq} score ${score(got.toSeq, lp)} vs $bestRef")
    }
    // exact tie: ["ab"] (-2.0) vs ["a","b"] (-1.0 + -1.0 = -2.0) →
    // the longest-first rule keeps the single piece
    val tie = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(TextOps.unigramApply("ab", tie, 2).toSeq == Seq("ab"))
    // unseen char: segments as itself (coverage never fails)
    val unk = TextOps.unigramApply("axb", lp, 3)
    assert(unk.mkString == "axb" && unk.contains("x"))
  }

  test("unigramLearn: the planted repeated unit earns a multi-char " +
      "piece, every corpus char keeps a single-char piece, the vocab " +
      "bound holds, and training is deterministic") {
    val texts = Seq.fill(6)("abab abab cd") ++ Seq("ab cd", "xyz")
    val pieces = TextOps.unigramLearn(df(texts), vocabSize = 12,
      maxPieceLen = 4, nIters = 3, seedSize = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byPiece = pieces.map(p => p._1 -> p._2).toMap
    val corpusChars = texts.flatMap(_.split(" ")).flatten.toSet
    corpusChars.foreach(c => assert(byPiece.contains(c.toString),
      s"single-char coverage lost $c"))
    assert(pieces.length <= 12, s"vocab bound: ${pieces.length}")
    // the dominant unit: some multi-char piece covering 'ab' repeats
    val multis = pieces.filter(_._1.length > 1).map(_._1).toSet
    assert(multis.exists(p => p == "ab" || p == "abab"),
      s"planted unit missing from $multis")
    // logprobs are normalized: all negative, max piece most probable
    assert(pieces.forall(_._3 < 0.0))
    val again = TextOps.unigramLearn(df(texts), vocabSize = 12,
      maxPieceLen = 4, nIters = 3, seedSize = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(again == pieces.toSet, "nondeterministic training")
  }

  test("unigramTokens: per-doc words/pieces/UNK accounting matches a " +
      "local re-encode; docs with zero words emit no row") {
    val texts = Seq("abab abab", "ab cd cd", "", "q")
    val d = df(texts)
    val pieces = TextOps.unigramLearn(d, vocabSize = 10,
      maxPieceLen = 4, nIters = 2, seedSize = 32)
    val tbl = pieces.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val maxLen = tbl.keys.map(_.length).max
    val got = TextOps.unigramTokens(d, pieces).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(!got.contains(2L), "empty doc must emit no row")
    for ((t, i) <- texts.zipWithIndex if t.nonEmpty) {
      val ws = t.split(" ").filter(_.nonEmpty)
      val encs = ws.map(w => TextOps.unigramApply(w, tbl, maxLen))
      val expPieces = encs.map(_.length.toLong).sum
      val expUnk = encs.map(_.count(p => !tbl.contains(p)).toLong).sum
      val (nw, np, nu, f) = got(i.toLong)
      assert(nw == ws.length && np == expPieces && nu == expUnk,
        s"doc $i: got ($nw,$np,$nu) want (${ws.length},$expPieces,$expUnk)")
      assert(math.abs(f - np.toDouble / nw) < 1e-6)
    }
  }

  test("unigram serve round trip: the persisted table reproduces the " +
      "in-memory encode, and a NEW snapshot's unseen chars count as " +
      "UNK under the frozen tokenizer") {
    val oldDocs = df(Seq("abab abab cd", "ab ab cd"))
    val path = s"/tmp/graft-test-warehouse/unigram-rt-${System.nanoTime}"
    TextOps.writeUnigramIndex(oldDocs, path, vocabSize = 10,
      maxPieceLen = 4, nIters = 2, seedSize = 32)
    val direct = TextOps.unigramTokens(oldDocs,
      TextOps.unigramLearn(oldDocs, vocabSize = 10, maxPieceLen = 4,
        nIters = 2, seedSize = 32)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val served = TextOps.unigramTokensFrom(spark, path, oldDocs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(served == direct, s"round trip: $served vs $direct")
    // 'z' never trained: the frozen tokenizer counts it, never fails
    val newDocs = df(Seq("zz ab"))
    val row = TextOps.unigramTokensFrom(spark, path, newDocs).collect()
    assert(row.length == 1 && row.head.getAs[Long]("n_unk_chars") == 2L,
      s"got ${row.toSeq}")
  }

  test("unigramLearn: words past maxWordLen are EXCLUDED from training " +
      "(the crawl-garbage guard) but still encode at the UNK floor") {
    val long = "q" * 500
    val texts = Seq.fill(4)("abab abab") :+ s"ab $long"
    val pieces = TextOps.unigramLearn(df(texts), vocabSize = 10,
      maxPieceLen = 4, nIters = 2, seedSize = 32, maxWordLen = 16)
    val tbl = pieces.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(!tbl.keys.exists(_.contains("q")),
      "the excluded word must contribute nothing to the table")
    val enc = TextOps.unigramApply(long, tbl, 4)
    assert(enc.mkString == long, "encode must still reconstruct")
    val row = TextOps.unigramTokens(df(Seq(s"ab $long")), pieces)
      .collect().head
    assert(row.getAs[Long]("n_unk_chars") == 500L, s"got $row")
  }

  test("property: segmentation reconstructs every distinct word under " +
      "a table learned from a seeded random corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    val words = (1 to 80).map(_ => (1 to (1 + rnd.nextInt(9)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val texts = (1 to 20).map(_ =>
      (1 to 8).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val d = df(texts)
    val pieces = TextOps.unigramLearn(d, vocabSize = 24,
      maxPieceLen = 4, nIters = 3, seedSize = 128)
    val tbl = pieces.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val maxLen = tbl.keys.map(_.length).max
    texts.flatMap(_.split(" ")).filter(_.nonEmpty).distinct.foreach { w =>
      val ps = TextOps.unigramApply(w, tbl, maxLen)
      assert(ps.mkString == w, s"$w -> ${ps.toSeq}")
      assert(ps.forall(p => tbl.contains(p) || p.length == 1))
    }
  }
}
