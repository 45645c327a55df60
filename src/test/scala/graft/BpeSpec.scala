package graft

import graft.operators.TextOps
import graft.sources.Tables

/** BPE family ([[TextOps.bpeLearn]] / [[TextOps.bpeTokens]]): the
  * learned merge table against an independent local reference model
  * (hand-rolled Sennrich training with the same overlapping pair
  * counts and (count desc, left, right) tie-break), the classic
  * textbook fixture, encode/fertility invariants, determinism, and
  * empty input.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def df(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")

  // independent local trainer: word counts → overlapping adjacent pair
  // counts → max with (cnt desc, l asc, r asc) → leftmost
  // non-overlapping merge, repeated
  private def localLearn(texts: Seq[String], nMerges: Int,
      minPair: Long = 2): Seq[(Long, String, String, Long)] = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L)
    var words: Map[Vector[String], Long] =
      wc.toMap.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>", c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    while (out.length < nMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val best = pairs.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minPair =>
          out += ((out.length + 1L, l, r, c))
          words = words.map { case (syms, cnt) =>
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += l + r; i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.toVector, cnt)
          }.groupMapReduce(_._1)(_._2)(_ + _)
        case _ => done = true
      }
    }
    out.toSeq
  }

  private def learned(d: org.apache.spark.sql.DataFrame, n: Int) =
    TextOps.bpeLearn(d, nMerges = n).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq

  test("textbook fixture: merge order and counts are the hand computation") {
    // hug×4 pug×2 pun×3 bun×1 hugs×2 (one word per doc slot, spaces)
    val corpus = Seq.fill(4)("hug") ++ Seq.fill(2)("pug") ++
      Seq.fill(3)("pun") ++ Seq("bun") ++ Seq.fill(2)("hugs")
    val m = learned(df(Seq(corpus.mkString(" "))), 3)
    // (u,g): 4+2+2 = 8 — the uncontested first merge
    assert(m.head._2 == "u" && m.head._3 == "g" && m.head._4 == 8L)
    // after merge 1: h·ug (6), ug·</w> (6), u·n (4), n·</w> (4),
    // p·u (3), p·ug (2), ug·s (2), s·</w> (2), b·u (1) — tie at 6
    // between (h,ug) and (ug,</w>) → left asc "h" < "ug" picks (h,ug)
    assert(m(1)._2 == "h" && m(1)._3 == "ug" && m(1)._4 == 6L)
    // after merge 2, hug words are fully fused: (hug,</w>) 4,
    // (u,n) 4, (n,</w>) 4 tie → left asc "hug" < "n" < "u"
    assert(m(2)._2 == "hug" && m(2)._3 == "</w>" && m(2)._4 == 4L)
  }

  test("merge table equals the independent local model on randomized corpora") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val vocabulary = Seq("ab", "abc", "bca", "aab", "ca", "b", "abab", "ccc")
      val texts = (0 until 20).map { _ =>
        (0 until (3 + rnd.nextInt(8)))
          .map(_ => vocabulary(rnd.nextInt(vocabulary.size))).mkString(" ")
      }
      val expect = localLearn(texts, 10)
      val got = learned(df(texts), 10)
      assert(got == expect, s"trial $trial:\n got    $got\n expect $expect")
    }
  }

  test("bpeApply: rank-order encode matches training segmentation; " +
      "token count between 1 and chars+1") {
    val texts = Seq("banana band bandana ban", "anna banana and band")
    val merges = learned(df(texts), 8).map(m => (m._2, m._3)).toArray
    texts.flatMap(_.split(" ")).distinct.foreach { w =>
      val toks = TextOps.bpeApply(w, merges)
      assert(toks.mkString == w + "</w>", s"lossless segmentation of $w")
      assert(toks.length >= 1 && toks.length <= w.length + 1)
    }
    // zero merges → chars + terminal
    assert(TextOps.bpeApply("abc", Array.empty).toSeq ==
      Seq("a", "b", "c", "</w>"))
  }

  test("bpeTokens: per-doc stats match a local re-encode; more merges " +
      "never increase the token count") {
    val texts = Seq("aa ab aa ba", "ab ab aa", "ba ba ba aa ab")
    val d = df(texts)
    def run(n: Int): Map[Long, (Long, Long)] = {
      val merges = TextOps.bpeLearn(d, nMerges = n)
      TextOps.bpeTokens(d, merges).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    }
    val merges4 = learned(d, 4).map(m => (m._2, m._3)).toArray
    val got = run(4)
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val nb = ws.map(w => TextOps.bpeApply(w, merges4).length.toLong).sum
      assert(got(i.toLong) == ((ws.length.toLong, nb)), s"doc $i")
    }
    val tok2 = run(2).values.map(_._2).sum
    val tok6 = run(6).values.map(_._2).sum
    assert(tok6 <= tok2, "merges only ever join tokens")
  }

  test("fertility on the real corpus: >= 1 per doc, deterministic rerun") {
    val merges = TextOps.bpeLearn(docs, nMerges = 8)
    def run() = TextOps.bpeTokens(docs, merges).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bpe_tokens"),
        r.getAs[Double]("fertility"))).sortBy(_._1).toSeq
    val a = run()
    assert(a.nonEmpty && a.forall(_._3 >= 1.0))
    assert(a == run())
  }

  test("bpeVocab: conservation vs bpeTokens, within-word multiplicity " +
      "folded, known fixture inventory") {
    val texts = Seq("aaa ab aaa", "ab ba aaa")
    val d = df(texts)
    val merges = TextOps.bpeLearn(d, nMerges = 2)
    val vocab = TextOps.bpeVocab(d, merges).collect()
      .map(r => r.getAs[String]("subtoken") ->
        (r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_words"))).toMap
    // conservation: vocabulary occurrences == total emitted tokens
    val totalTokens = TextOps.bpeTokens(d, merges).collect()
      .map(_.getAs[Long]("n_bpe_tokens")).sum
    assert(vocab.values.map(_._1).sum == totalTokens,
      s"vocab mass ${vocab.values.map(_._1).sum} vs tokens $totalTokens")
    // local re-derivation: encode each distinct word, fold by hand
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    val wc = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val expect = wc.toSeq.flatMap { case (w, c) =>
      TextOps.bpeApply(w, ms).groupBy(identity).map { case (t, occ) =>
        (t, occ.length * c, 1L)
      }
    }.groupBy(_._1).map { case (t, rows) =>
      t -> (rows.map(_._2).sum, rows.map(_._3).sum)
    }
    assert(vocab == expect, s"got $vocab expect $expect")
  }

  test("early stop below minPairCount; empty corpus learns nothing") {
    // every word unique and length 2 → every pair count 1 < default 2
    val m = TextOps.bpeLearn(df(Seq("ab cd ef gh")), nMerges = 5)
    // (char,char) pairs are all count-1; (char,</w>) too → no merges
    assert(m.count() == 0)
    val empty = df(Seq.empty)
    assert(TextOps.bpeLearn(empty, nMerges = 3).count() == 0)
    assert(TextOps.bpeTokens(empty,
      TextOps.bpeLearn(empty, nMerges = 3)).count() == 0)
    assert(TextOps.bpeVocab(empty,
      TextOps.bpeLearn(empty, nMerges = 3)).count() == 0)
  }

  test("writeBpeIndex/bpeTokensFrom: the serve leg equals in-memory " +
      "learn+encode, and the vocab artifact matches the written merges") {
    val train = df(Seq(
      "low low low low lower lower lowest",
      "new new newer newest low"))
    val fresh = df(Seq("lowest newest low", "brand new words here"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpeidx").toString
    TextOps.writeBpeIndex(train, dir, nMerges = 8)
    def fert(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Double]("fertility")))).toMap
    val served = fert(TextOps.bpeTokensFrom(spark, dir, fresh))
    val mem = fert(TextOps.bpeTokens(fresh, TextOps.bpeLearn(train, 8)))
    assert(served == mem, s"served=$served mem=$mem")
    // merges/ round-trips the learned table exactly
    val storedMerges = spark.read.parquet(s"$dir/merges").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSet
    val memMerges = TextOps.bpeLearn(train, 8).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSet
    assert(storedMerges == memMerges && storedMerges.nonEmpty)
    // vocab/ derives from the written merges over the TRAINING corpus
    val storedVocab = spark.read.parquet(s"$dir/vocab").collect()
      .map(r => r.getAs[String]("subtoken") ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_words")))).toMap
    val memVocab = TextOps.bpeVocab(train, TextOps.bpeLearn(train, 8))
      .collect()
      .map(r => r.getAs[String]("subtoken") ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_words")))).toMap
    assert(storedVocab == memVocab)
  }
}
