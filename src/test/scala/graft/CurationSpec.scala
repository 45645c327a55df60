package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Similarity, TextOps}
import graft.sources.Tables

class CurationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("decontaminate: flags exactly the docs sharing an n-gram with the benchmark") {
    // doc 0 is benchmark (0 % 10 == 0); doc 1 embeds two of its
    // 4-grams, doc 2 shares words but no 4-gram, doc 3 is disjoint
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "x y alpha beta gamma delta epsilon w"),
      (2L, "alpha beta gamma q delta epsilon zeta2 r"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val r = Curation.decontaminate(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_hits")).toMap
    // doc 1 contains "alpha beta gamma delta" and
    // "beta gamma delta epsilon" — exactly 2 of doc 0's 4-grams
    assert(r == Map(1L -> 2L), s"got $r")
  }

  test("curateCorpus: end-to-end behavioral contract on the gate corpus") {
    val out = Curation.curateCorpus(docs)
    val rows = out.collect()
    assert(rows.nonEmpty, "the pipeline must keep some of the gate corpus")
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.forall(_ % 10 != 0), "benchmark holdout docs must not survive")
    val texts = rows.map(_.getAs[String]("text"))
    assert(texts.distinct.length == texts.length, "no exact-duplicate text")
    // every survivor passes the Gopher gate (per-doc metrics are
    // doc-local, so re-running the gate on the output is equivalent)
    val keep = TextOps.gopherGate(out).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(ids.forall(keep(_)), "every survivor must pass the Gopher gate")
    // zero decontamination hits among survivors
    val hits = Curation.decontaminate(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert((ids & hits).isEmpty, "no contaminated doc may survive")
    // near-dup keep-one: no verified pair can remain within the output
    assert(Dedup.minhashExactVerifiedPairs(out, threshold = 0.8)
      .collect().isEmpty, "survivors must contain no near-dup pair")
    assert(rows.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
  }

  test("curateReport: the funnel telescopes, ends at curateCorpus's " +
      "count, and each stage row matches its own gate") {
    val rep = Curation.curateReport(docs).collect()
      .map(r => (r.getAs[Long]("stage_ord"), r.getAs[String]("stage"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("n_out")))
      .sortBy(_._1).toSeq
    assert(rep.map(t => (t._1, t._2)) == Seq(
      (1L, "benchmark_holdout"), (2L, "cleaning"), (3L, "exact_dedup"),
      (4L, "gopher"), (5L, "decontaminate"), (6L, "neardup")),
      s"one row per stage in order: $rep")
    val total = docs.count()
    assert(rep.head._3 == total, "the funnel starts at the corpus size")
    // telescoping: each stage's n_out is the next stage's n_in,
    // and n_out = n_in - n_dropped everywhere
    rep.foreach { case (_, s, in, d, out) =>
      assert(out == in - d, s"stage $s: $in - $d != $out") }
    rep.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 == b._3, s"${a._2} out ${a._5} != ${b._2} in ${b._3}") }
    // the report is the capstone's audit twin: same final count
    assert(rep.last._5 == Curation.curateCorpus(docs).count(),
      "funnel n_out must equal the curated corpus size")
    // stage-1 cross-check against the holdout rule itself
    assert(rep.head._4 ==
      docs.where(pmod(col("doc_id"), lit(10)) === 0).count(),
      "benchmark_holdout drop must equal the % 10 == 0 count")
  }

  test("curateReport on an empty corpus: all six stage rows, every " +
      "count zero (a data card always has its rows)") {
    val none = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val rep = Curation.curateReport(none).collect()
      .map(r => (r.getAs[Long]("stage_ord"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_dropped"), r.getAs[Long]("n_out")))
      .sortBy(_._1).toSeq
    assert(rep.map(_._1) == (1L to 6L), rep.toString)
    assert(rep.forall(t => t._2 == 0L && t._3 == 0L && t._4 == 0L),
      rep.toString)
  }

  test("curateCorpus/curateReport sentenceDedup (r13 verdict #6): no " +
      "duplicated 3-sentence span among survivors, the sentence_dedup " +
      "row appears with nonzero drops, the funnel still telescopes to " +
      "the capstone's count") {
    // the q_curate_report_sent plant: %7=2 docs share a 3-sentence
    // preamble (they keep their tails), %11=7 docs ARE the duplicated
    // span (exact-dup-distinct via the id-dependent space run) — all
    // but the owner drop entirely at the sentence stage
    val sp = expr("repeat(' ', CAST(doc_id % 7 + 1 AS INT))")
    val planted = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(11L)) === 7L,
        concat(lit("the alpha beta one."), sp,
          lit("the gamma delta two."), sp,
          lit("the epsilon zeta three.")))
        .otherwise(TextOps.syntheticSentences(
          TextOps.syntheticSpanDupes(col("doc_id"), col("text")))))
    val out = Curation.curateCorpus(planted, sentenceDedup = true)
    val survivors = out.collect()
    assert(survivors.nonEmpty)
    // C4's invariant on the OUTPUT: across all survivor texts, no
    // 3-sentence span occurs twice
    val spans = survivors.flatMap { r =>
      val sents = r.getAs[String]("text")
        .split("(?<=[.!?])").map(_.trim).filter(_.nonEmpty)
      sents.sliding(3).filter(_.length == 3).map(_.mkString(""))
    }
    assert(spans.distinct.length == spans.length,
      "a duplicated 3-sentence span survived the sentence stage")
    // the funnel: 7 rows, the sentence row nonzero, telescoping holds,
    // final n_out equals the capstone's count
    val rep = Curation.curateReport(planted, sentenceDedup = true)
      .collect()
      .map(r => (r.getAs[Long]("stage_ord"), r.getAs[String]("stage"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("n_out")))
      .sortBy(_._1).toSeq
    assert(rep.map(t => (t._1, t._2)) == Seq(
      (1L, "benchmark_holdout"), (2L, "cleaning"), (3L, "exact_dedup"),
      (4L, "sentence_dedup"), (5L, "gopher"), (6L, "decontaminate"),
      (7L, "neardup")), s"stage rows: $rep")
    rep.foreach { case (_, s, in, d, o) =>
      assert(o == in - d, s"stage $s: $in - $d != $o") }
    rep.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 == b._3, s"${a._2} out ${a._5} != ${b._2} in ${b._3}") }
    val sentRow = rep.find(_._2 == "sentence_dedup").get
    assert(sentRow._4 > 0L,
      s"the boilerplate slice must drop docs at the sentence stage: $rep")
    assert(rep.last._5 == out.count(),
      "funnel n_out must equal the sentence-staged capstone's size")
    // flag OFF is bit-compatible with the r13 funnel (6 rows, same ords)
    val off = Curation.curateReport(planted).collect()
      .map(r => (r.getAs[Long]("stage_ord"), r.getAs[String]("stage")))
      .sortBy(_._1).toSeq
    assert(off == Seq((1L, "benchmark_holdout"), (2L, "cleaning"),
      (3L, "exact_dedup"), (4L, "gopher"), (5L, "decontaminate"),
      (6L, "neardup")), s"flag-off rows: $off")
  }

  test("curateCorpus/curateReport lineDedup (late r14): no duplicated " +
      "long line among survivors, the line_dedup row appears with " +
      "nonzero drops, the funnel telescopes to the capstone's count, " +
      "both flags compose") {
    // the q_curate_report_lines plant: %11=7 docs are PURE boilerplate
    // (the two long lines, exact-dup-distinct via the space run before
    // the newline), %9=4 docs carry the block as a prefix
    val sp = expr("repeat(' ', CAST(doc_id % 7 + 1 AS INT))")
    val lineA = "please subscribe to the newsletter and share the page today"
    val lineB = "copyright of the example corporation all rights reserved"
    val planted = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(11L)) === 7L,
        concat(lit(lineA), sp, lit("\n" + lineB)))
        .when(pmod(col("doc_id"), lit(9L)) === 4L,
          concat(lit(lineA + "\n" + lineB + "\n"), col("text")))
        .otherwise(col("text")))
    val out = Curation.curateCorpus(planted, lineDedup = true)
    val survivors = out.collect()
    assert(survivors.nonEmpty)
    // the Dolma/RefinedWeb invariant on the OUTPUT: across all
    // survivor texts, no >=30-char line occurs twice
    val lines = survivors.flatMap(
      _.getAs[String]("text").split("\n").map(_.trim)
        .filter(l => l.nonEmpty && l.length >= 30))
    assert(lines.distinct.length == lines.length,
      "a duplicated long line survived the line stage")
    val rep = Curation.curateReport(planted, lineDedup = true)
      .collect()
      .map(r => (r.getAs[Long]("stage_ord"), r.getAs[String]("stage"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("n_out")))
      .sortBy(_._1).toSeq
    assert(rep.map(t => (t._1, t._2)) == Seq(
      (1L, "benchmark_holdout"), (2L, "cleaning"), (3L, "exact_dedup"),
      (4L, "line_dedup"), (5L, "gopher"), (6L, "decontaminate"),
      (7L, "neardup")), s"stage rows: $rep")
    rep.foreach { case (_, s, in, d, o) =>
      assert(o == in - d, s"stage $s: $in - $d != $o") }
    rep.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 == b._3, s"${a._2} out ${a._5} != ${b._2} in ${b._3}") }
    assert(rep.find(_._2 == "line_dedup").get._4 > 0L,
      s"the pure-boilerplate slice must drop docs at the line stage: $rep")
    assert(rep.last._5 == out.count(),
      "funnel n_out must equal the line-staged capstone's size")
    // BOTH optional stages on: 8 rows, line before sentence, ords shift
    val both = Curation.curateReport(planted, sentenceDedup = true,
        lineDedup = true).collect()
      .map(r => (r.getAs[Long]("stage_ord"), r.getAs[String]("stage")))
      .sortBy(_._1).toSeq
    assert(both == Seq((1L, "benchmark_holdout"), (2L, "cleaning"),
      (3L, "exact_dedup"), (4L, "line_dedup"), (5L, "sentence_dedup"),
      (6L, "gopher"), (7L, "decontaminate"), (8L, "neardup")),
      s"both-flags rows: $both")
  }

  test("curateCorpusFromHtml: extraction front door equals curateCorpus " +
      "on the word-floor-cleared docs; boilerplate never leaks") {
    val pages = docs.select(col("doc_id"),
      TextOps.syntheticHtml(col("doc_id"), col("text")).as("html"),
      col("lang"), col("source"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_tok"), r.getAs[String]("split"))).toSet
    val viaHtml = rows(Curation.curateCorpusFromHtml(pages))
    // the synthetic wrapper's prose round-trips verbatim, so the
    // front door must equal the plain capstone on the docs whose
    // text clears the extractor's 5-alpha-word floor
    val floorCleared = docs.where(
      size(filter(split(col("text"), "[^A-Za-z]+"),
        w => length(w) > 0)) >= 5)
    val direct = rows(Curation.curateCorpus(floorCleared))
    assert(viaHtml == direct,
      s"missing=${direct -- viaHtml} extra=${viaHtml -- direct}")
    assert(viaHtml.nonEmpty)
    // no survivor carries the wrapper's boilerplate strings
    viaHtml.foreach { case (_, text, _, _, _, _) =>
      assert(!text.contains("Sponsored") && !text.contains("Example Corp")
        && !text.contains("<"), s"boilerplate leaked: '$text'")
    }
  }

  test("dsirSelect: deterministic Gumbel top-k over raw docs only") {
    val k = 10
    def sel() = Curation.dsirSelect(docs, k = k).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("gumbel_key"),
        r.getAs[Long]("rnk"))).sortBy(_._3)
    val s1 = sel()
    assert(s1.length == k)
    assert(s1.sameElements(sel()), "the draw must be rerun-stable")
    assert(s1.forall(_._1 % 10 != 7), "target docs are never selected")
    // keys are ranked descending with doc_id tie-break
    assert(s1.map(_._2).toSeq == s1.map(_._2).sortBy(x => -x).toSeq)
    // the selection is ∝ exp(log_weight): verify against an in-memory
    // reference computing the same keys from the operator's own parts
    val scored = Curation.dsirScore(docs).collect()
      .filter(!_.getAs[Boolean]("is_target"))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight"))
      .toMap
    val gums = Curation.dsirSelect(docs, k = Int.MaxValue).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("gumbel_key"))
    val expect = gums.sortBy { case (id, key) => (-key, id) }.take(k)
      .map(_._1).toSeq
    assert(s1.map(_._1).toSeq == expect)
    assert(gums.forall { case (id, key) =>
      math.abs(key - scored(id)) < 20.0 }) // key = log_weight + Gumbel noise
  }

  test("mixWeights: temperature flattens the head, budget caps the rate") {
    val d = Seq(
      (1L, "a b c d e f g h", "en", "s"), // en: 3 docs x 8 toks = 24
      (2L, "a b c d e f g h", "en", "s"),
      (3L, "a b c d e f g h", "en", "s"),
      (4L, "x y", "de", "s")              // de: 1 doc x 2 toks = 2
    ).toDF("doc_id", "text", "lang", "source")
    def w(alpha: Double) =
      Curation.mixWeights(d, alpha = alpha, budgetTokens = 10).collect()
        .map(r => r.getAs[String]("lang") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("alpha_weight"),
            r.getAs[Double]("admit_rate")))).toMap
    val w1 = w(1.0) // alpha=1: proportional — weight == token share
    assert(w1("en")._1 == 24L && w1("de")._1 == 2L)
    assert(math.abs(w1("en")._2 - 24.0 / 26.0) < 1e-5)
    val w0 = w(0.0) // alpha=0: uniform
    assert(math.abs(w0("en")._2 - 0.5) < 1e-9)
    val w03 = w(0.3) // temperature lands between the two
    assert(w03("en")._2 < w1("en")._2 && w03("en")._2 > 0.5)
    Seq(w1, w0, w03).foreach(m =>
      assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-6,
        "weights must normalize"))
    // 10-token budget: en's allocation stays under its 24 tokens;
    // de's uniform share (5 tokens for its 2) is capped at rate 1
    assert(w03("en")._3 < 1.0)
    assert(w0("de")._3 == 1.0)
  }

  test("epochPlan: scarce source repeats up to the cap with shortfall, " +
      "abundant source subsamples; effective never exceeds the budget") {
    // source A: 1 doc x 100 tokens (scarce); source B: 10 x 1000
    // (abundant). alpha=0.3 wants far more of A than it has.
    val d = ((0 until 1).map(i => (i.toLong,
        (1 to 100).map(_ => "w").mkString(" "), "en", "A")) ++
      (0 until 10).map(i => (100L + i,
        (1 to 1000).map(_ => "w").mkString(" "), "en", "B")))
      .toDF("doc_id", "text", "lang", "source")
    val r = Curation.epochPlan(d, alpha = 0.3, budgetTokens = 20000L)
      .collect().map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("desired_tokens"),
          x.getAs[Long]("epochs_milli"), x.getAs[Long]("effective_tokens"),
          x.getAs[Long]("shortfall_tokens")))).toMap
    val (ntA, desA, epA, effA, shA) = r("A")
    val (ntB, desB, epB, effB, shB) = r("B")
    assert(ntA == 100L && ntB == 10000L)
    // A's alpha-share of 20k dwarfs its 100 tokens: capped at 4 epochs
    assert(epA == 4000L, s"scarce source must hit the cap, got $epA")
    assert(effA == 400L && shA == desA - 400L && shA > 0L)
    // B repeats mildly (~1.6 epochs) and is never cut short
    assert(epB > 1000L && epB < 4000L && effB == desB && shB == 0L,
      s"abundant source must not shortfall: $r")
    // plan-level conservation: effective mass never exceeds the budget
    assert(effA + effB <= 20000L)
    // weights normalize and desired splits the budget
    assert(math.abs((desA + desB) - 20000L) <= 2L)
  }

  test("epochApply: per-doc copy counts re-derived exactly from the plan " +
      "+ md5 admission; epochs dense from 1") {
    val d = ((0 until 1).map(i => (i.toLong,
        (1 to 100).map(j => s"w$j").mkString(" "), "en", "A")) ++
      (0 until 10).map(i => (100L + i,
        (1 to 500).map(j => s"t$i-$j").mkString(" "), "en", "B")))
      .toDF("doc_id", "text", "lang", "source")
    val plan = Curation.epochPlan(d, alpha = 0.3, budgetTokens = 8000L)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("epochs_milli")).toMap
    val got = Curation.epochApply(d, alpha = 0.3, budgetTokens = 8000L)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.map(_.getAs[Long]("epoch")).sorted.toSeq }
    // local re-derivation of the admission rule, bit for bit
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(text: String): Long = {
      md.reset()
      val hex = md.digest(("epochapply:" + text).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 1000L
    }
    d.collect().foreach { r =>
      val em = plan(r.getAs[String]("source"))
      val expect = em / 1000L +
        (if (bucket(r.getAs[String]("text")) < em % 1000L) 1L else 0L)
      val copies = got.getOrElse(r.getAs[Long]("doc_id"), Seq.empty)
      assert(copies == (1L to expect),
        s"doc ${r.getAs[Long]("doc_id")}: copies $copies vs em=$em")
    }
    // the scarce source hit the 4-epoch cap: every A doc appears 4x
    assert(plan("A") == 4000L && got(0L) == (1L to 4L))
  }

  test("probeScore: deterministic weights, in-sample separation, scores in (0,1)") {
    val r1 = Curation.probeScore(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_target"),
        r.getAs[Double]("score"))).sortBy(_._1)
    val r2 = Curation.probeScore(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_target"),
        r.getAs[Double]("score"))).sortBy(_._1)
    assert(r1.nonEmpty)
    assert(r1.sameElements(r2), "training must be bit-deterministic")
    assert(r1.forall { case (_, _, s) => s > 0.0 && s < 1.0 })
    // the whole gate corpus is inside sampleBound, so this is
    // in-sample separation: a 64-feature model must separate the
    // bounded sample even though the labels carry no true signal
    val (pos, neg) = r1.partition(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    val accuracy = (pos.count(_._3 >= 0.5) + neg.count(_._3 < 0.5)).toDouble /
      r1.length
    info(s"in-sample accuracy = $accuracy (${pos.length} pos / ${neg.length} neg)")
    assert(accuracy >= 0.8, s"in-sample separation too weak: $accuracy")
  }

  test("probeScore: single-class sample degrades to the untrained prior") {
    val oneClass = Seq((1L, "alpha beta gamma delta", "en", "s"),
      (2L, "epsilon zeta eta theta", "en", "s"))
      .toDF("doc_id", "text", "lang", "source") // no doc_id % 10 == 7
    val r = Curation.probeScore(oneClass).collect()
      .map(_.getAs[Double]("score"))
    assert(r.length == 2 && r.forall(_ == 0.5))
  }

  test("decontaminate: benchmark docs never appear in the output") {
    val r = Curation.decontaminate(docs).collect()
    assert(r.nonEmpty, "synthetic near-dup corpus must show contamination")
    assert(r.forall(_.getAs[Long]("doc_id") % 10 != 0))
    assert(r.forall(_.getAs[Long]("n_hits") > 0))
  }

  test("contamAttribution: per-benchmark leakage counts, bench ids only") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "x y alpha beta gamma delta epsilon w"),
      (2L, "alpha beta gamma q delta epsilon zeta2 r"),
      (3L, "one two three four five six seven"),
      // a second contaminated train doc for the same bench item
      (11L, "alpha beta gamma delta nothing else here")
    ).toDF("doc_id", "text")
    val r = Curation.contamAttribution(d).collect()
      .map(x => x.getAs[Long]("bench_id") ->
        ((x.getAs[Long]("n_train_docs"), x.getAs[Long]("n_shingles_hit"))))
      .toMap
    // doc 1 shares 2 of doc 0's 4-grams, doc 11 shares 1; docs 2/3
    // share none -> bench 0 leaks 2 distinct grams into 2 train docs
    assert(r == Map(0L -> ((2L, 2L))), s"got $r")
    // gate corpus: only benchmark ids appear, every count positive
    val g = Curation.contamAttribution(docs).collect()
    assert(g.nonEmpty)
    assert(g.forall(_.getAs[Long]("bench_id") % 10 == 0))
    assert(g.forall(x => x.getAs[Long]("n_train_docs") >= 1 &&
      x.getAs[Long]("n_shingles_hit") >= 1))
  }

  test("decontaminateBloom equals exact decontaminate, even at fpp 0.5") {
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    val exact = asMap(Curation.decontaminate(docs))
    assert(exact.nonEmpty, "gate corpus must have some contamination")
    // default fpp: the production shape
    assert(asMap(Curation.decontaminateBloom(docs)) == exact)
    // adversarial fpp floods the confirm join with false positives;
    // the output must not move (bloom FPs are shuffle cost, never
    // correctness)
    assert(asMap(Curation.decontaminateBloom(docs, fpp = 0.5)) == exact)
  }

  test("decontaminate: hashed-shingle scale path matches the exact-string path") {
    def res(hash: Boolean) = Curation.decontaminate(docs, hashShingles = hash)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_hits"))
      .toMap
    assert(res(hash = true) == res(hash = false))
  }

  test("semanticDecontaminate: exactly the train vecs with a benchmark neighbor") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val th = 0.35
    val r = Curation.semanticDecontaminate(emb, threshold = th).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Double]("max_sim"))).toMap
    assert(r.nonEmpty)
    assert(r.keys.forall(_ % 10 != 0), "benchmark vecs never flagged")
    assert(r.values.forall { case (n, m) => n >= 1 && m >= th })
    // cross-check against the brute-force pair kernel: a flagged vec
    // is exactly a train vec sharing a >= th pair with a benchmark vec
    val pairs = Similarity.nearDupPairs(emb, bound = 2000, threshold = th - 0.0001)
      .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"),
        x.getAs[Double]("cos_sim")))
    val expected = pairs.iterator.flatMap { case (a, b, c) =>
      val out = scala.collection.mutable.ListBuffer.empty[Long]
      if (c >= th) {
        if (a % 10 != 0 && b % 10 == 0) out += a
        if (b % 10 != 0 && a % 10 == 0) out += b
      }
      out
    }.toSet
    assert(r.keySet == expected)
  }

  test("semanticDecontaminateAnn: true-hit subset of exact with measured recall") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val th = 0.35
    val idx = java.nio.file.Files
      .createTempDirectory("graft-semdecon-ann").toString
    // geometry pinned at the r11 sweep's operating point: the recall
    // floor below was measured at 75% probed fraction (6 of 8 cells);
    // the engine's √N auto default would starve it on this
    // near-uniform toy corpus (the annIndexOf pin rationale)
    Similarity.writeAnnIndex(emb, idx, nCells = 8)
    // the whole sf0.001 corpus sits under the baseline's bound, so the
    // bounded op IS the exact sweep here — the recall denominator
    val exact = Curation.semanticDecontaminate(emb, threshold = th)
      .collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Double]("max_sim"))).toMap
    val ann = Curation.semanticDecontaminateAnn(spark, idx, emb,
        threshold = th)
      .collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Double]("max_sim"))).toMap
    assert(ann.nonEmpty)
    assert(ann.keys.forall(_ % 10 != 0), "benchmark vecs never flagged")
    // every ANN hit is TRUE: refinement scores full-precision cosine,
    // so a flagged pair is a real over-threshold pair — the flagged
    // set is a subset of exact (precision 1.0) and its per-vec stats
    // are bounded by the exact sweep's
    assert(ann.keySet.subsetOf(exact.keySet),
      s"false positives: ${ann.keySet -- exact.keySet}")
    ann.foreach { case (id, (n, m)) =>
      assert(n <= exact(id)._1, s"vec $id: ann n_hits $n > exact")
      assert(m <= exact(id)._2 + 1e-9, s"vec $id: ann max_sim $m > exact")
    }
    // recall floor at the registry defaults (nProbe=6 of 8, rerank=200)
    val recall = ann.keySet.size.toDouble / exact.keySet.size
    info(f"semanticDecontaminateAnn recall vs exact: $recall%.3f " +
      s"(${ann.size} of ${exact.size} flagged vecs)")
    assert(recall >= 0.80, f"recall $recall%.3f below floor 0.80 " +
      s"(${ann.size} of ${exact.size})")
    // empty source frame: no queries, no candidates — empty, no crash
    assert(Curation.semanticDecontaminateAnn(spark, idx,
      emb.where(col("vec_id") < 0), threshold = th).count() == 0)
  }

  test("domainMix: deterministic, subset of input, rebalances en toward target") {
    val kept1 = Curation.domainMix(docs).collect().map(_.getAs[Long]("doc_id")).toSet
    val kept2 = Curation.domainMix(docs).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept1 == kept2, "hash sampling must be rerun-stable")
    val byLang = Curation.domainMix(docs).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    // non-target langs are kept wholesale (rate 1.0)
    totals.keys.filterNot(_ == "en").foreach(l => assert(byLang(l) == totals(l)))
    // en is downsampled to ~35% (hash uniformity; generous tolerance
    // at this corpus size)
    val enFrac = byLang("en").toDouble / totals("en")
    assert(enFrac > 0.15 && enFrac < 0.55, s"en kept fraction $enFrac")
  }

  test("packSequences: shard-local first-fit packing accounts for every doc") {
    val budget = 7
    val d = Seq(
      // shard 0 (doc_id % 2 == 0): tokens 3, 3, 3 → cum 3, 6, 9 →
      // bins (0)/7=0, (3)/7=0, (6)/7=0 — all open inside the first bin
      (0L, "a b c"), (2L, "d e f"), (4L, "g h i"),
      // shard 1: tokens 5, 5 → bins 0/7=0, 5/7=0; then 5 more → 10/7=1
      (1L, "a b c d e"), (3L, "f g h i j"), (5L, "k l m n o")
    ).toDF("doc_id", "text")
    val r = Curation.packSequences(d, budget = budget, shards = 2).collect()
      .map(x => (x.getAs[Long]("shard"), x.getAs[Long]("bin")) ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("sum_tokens"))).toMap
    assert(r == Map((0L, 0L) -> (3L, 9L), (1L, 0L) -> (2L, 10L),
      (1L, 1L) -> (1L, 5L)), s"got $r")
  }

  test("packStats: per-shard audit reconciles with the bin frame, integer-exact") {
    // same fixture as the packing test above: shard 0 = one overflowing
    // bin {9 tok}, shard 1 = bins {10, 5} under budget 7
    val budget = 7
    val d = Seq(
      (0L, "a b c"), (2L, "d e f"), (4L, "g h i"),
      (1L, "a b c d e"), (3L, "f g h i j"), (5L, "k l m n o")
    ).toDF("doc_id", "text")
    val r = Curation.packStats(d, budget = budget, shards = 2).collect()
      .map(x => x.getAs[Long]("shard") ->
        ((x.getAs[Long]("n_bins"), x.getAs[Long]("n_docs"),
          x.getAs[Long]("sum_tokens"), x.getAs[Long]("pad_tokens"),
          x.getAs[Long]("n_overflow"), x.getAs[Long]("fill_milli")))).toMap
    assert(r == Map(
      // 9 tokens in 1×7 capacity: no pad (overflow), fill 9000/7 = 1285
      0L -> ((1L, 3L, 9L, 0L, 1L, 1285L)),
      // 15 tokens in 2×7: bin {10} overflows, bin {5} pads 2, fill 1071
      1L -> ((2L, 3L, 15L, 2L, 1L, 1071L))), s"got $r")
  }

  test("snapshotDiff: all four statuses by content identity; new snapshot's source wins") {
    val old = Seq(
      (1L, "alpha text", "en", "web"),
      (2L, "beta text", "en", "web"),
      (3L, "gamma text", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val newer = Seq(
      (2L, "beta text", "en", "wiki"),   // same content, re-attributed
      (3L, "gamma text revised", "en", "web"),
      (4L, "delta text", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Curation.snapshotDiff(old, newer).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[String]("status")))).toMap
    assert(out == Map(
      1L -> (("web", "removed")),
      2L -> (("wiki", "unchanged")), // status is CONTENT identity; source is current
      3L -> (("web", "changed")),
      4L -> (("web", "added"))), s"got $out")
  }

  test("snapshotDrift: hand-computed TV per source; one-sided sources omitted; self-drift zero") {
    val old = Seq(
      (1L, "a a b b", "en", "s"),
      (2L, "x y", "en", "t"),
      (3L, "only old", "en", "u")
    ).toDF("doc_id", "text", "lang", "source")
    val newer = Seq(
      (1L, "a a a b", "en", "s"), // p(a) .5 -> .75: TV = 0.25
      (2L, "x y", "en", "t"),     // unchanged: TV = 0
      (4L, "only new", "en", "v")
    ).toDF("doc_id", "text", "lang", "source")
    val r = Curation.snapshotDrift(old, newer).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_tok_old"), x.getAs[Long]("n_tok_new"),
          x.getAs[Double]("drift_tv")))).toMap
    assert(r == Map("s" -> ((4L, 4L, 0.25)), "t" -> ((2L, 2L, 0.0))),
      s"got $r")
    // identity: a snapshot drifts zero against itself, every source
    val self = Curation.snapshotDrift(old, old).collect()
    assert(self.length == 3 && self.forall(_.getAs[Double]("drift_tv") == 0.0))
  }

  test("snapshotDrift equals an exact BigInt reference on randomized corpora") {
    val rnd = new scala.util.Random(9090)
    def corpus(nDocs: Int, seedBase: Int): Seq[(Long, String, String, String)] =
      (0 until nDocs).map { i =>
        val r = new scala.util.Random(seedBase + i)
        val src = s"s${r.nextInt(3)}"
        val text = (0 until 3 + r.nextInt(12))
          .map(_ => s"t${r.nextInt(15)}").mkString(" ")
        (i.toLong, text, "en", src)
      }
    def model(old: Seq[(Long, String, String, String)],
        newer: Seq[(Long, String, String, String)]): Map[String, Double] = {
      def tf(rows: Seq[(Long, String, String, String)]) = rows
        .flatMap { case (_, text, _, src) =>
          text.split(" ").filter(_.nonEmpty).map(t => (src, t)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val o = tf(old); val n = tf(newer)
      val srcs = (o.keySet ++ n.keySet).map(_._1)
      srcs.flatMap { s =>
        val no = o.collect { case ((`s`, _), c) => c }.sum
        val nn = n.collect { case ((`s`, _), c) => c }.sum
        if (no == 0 || nn == 0) None
        else {
          val toks = (o.keySet ++ n.keySet).collect { case (`s`, t) => t }
          val sum = toks.toSeq.map { t =>
            (BigInt(n.getOrElse((s, t), 0L)) * no -
              BigInt(o.getOrElse((s, t), 0L)) * nn).abs
          }.sum
          // the op's exact division order: s / (2.0 * no * nn)
          Some(s -> sum.toDouble / (2.0 * no.toDouble * nn.toDouble))
        }
      }.toMap
    }
    (0 until 5).foreach { trial =>
      val old = corpus(8 + rnd.nextInt(10), trial * 1000)
      val newer = corpus(8 + rnd.nextInt(10), trial * 1000 + 500)
      val got = Curation.snapshotDrift(
        old.toDF("doc_id", "text", "lang", "source"),
        newer.toDF("doc_id", "text", "lang", "source")).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Double]("drift_tv"))
        .toMap
      assert(got == model(old, newer),
        s"trial $trial: got $got want ${model(old, newer)}")
    }
  }

  test("snapshotPair: derived statuses match the bucket rule doc-for-doc") {
    import org.apache.spark.sql.functions.col
    val docs = spark.range(0, 400).selectExpr("id AS doc_id",
      "concat('doc body number ', id, ' filler tokens') AS text",
      "'en' AS lang", "'web' AS source")
    val (old, newer) = Curation.snapshotPair(docs)
    val got = Curation.snapshotDiff(old, newer).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    val buckets = docs.select(col("doc_id"),
      graft.functions.TextFunctions.hashBucket(col("text"), 100, "snap:")
        .as("b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("b")).toMap
    val want = buckets.map { case (id, b) =>
      id -> (if (b < 3) "added" else if (b >= 97) "removed"
      else if (b >= 50 && b < 60) "changed" else "unchanged")
    }
    assert(got == want)
    // the derivation must exercise every status on a 400-doc corpus
    assert(got.values.toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("packSequences matches a sequential reference packer (property)") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val nDocs = 1 + rnd.nextInt(60)
      val budget = 5 + rnd.nextInt(40)
      val shards = 1 + rnd.nextInt(4)
      val docs = (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(12))("w").mkString(" "))
      }
      // sequential reference: per shard in doc_id order, a doc opens in
      // the bin its predecessor token total points at
      val expected = docs
        .map { case (id, text) => (id, text.split(" ", -1).length.toLong) }
        .groupBy { case (id, _) => id % shards }
        .toSeq.flatMap { case (shard, ds) =>
          var cum = 0L
          ds.sortBy(_._1).map { case (_, n) =>
            val bin = cum / budget; cum += n
            ((shard, bin), n)
          }
        }
        .groupBy(_._1)
        .map { case (k, vs) => k -> (vs.size.toLong, vs.map(_._2).sum) }
      val got = Curation.packSequences(docs.toDF("doc_id", "text"),
          budget = budget, shards = shards).collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"))).toMap
      assert(got == expected, s"nDocs=$nDocs budget=$budget shards=$shards")
    }
  }

  test("domainMix matches the literal hash-cutoff reference (property)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(text: String): Long = {
      val hex = md.digest(("mix:" + text).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10000
    }
    val sample = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang")))
    val expected = sample.filter { case (_, text, lang) =>
      bucket(text) < (if (lang == "en") 3500 else 10000)
    }.map(_._1).toSet
    val got = Curation.domainMix(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected)
  }

  test("mixApply matches the rates-then-hash-cutoff reference (property)") {
    // independent local model: take the operator's own published rate
    // contract (mixWeights, already oracle-verified) and re-apply it
    // with a from-scratch md5 bucket — the test owns the salt, the
    // cutoff rounding, and the join, so a drift in any of the three
    // shows up as a set mismatch
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(text: String): Long = {
      val hex = md.digest(("mixapply:" + text).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10000
    }
    def check(budget: Long): Set[Long] = {
      val cutoffs = Curation.mixWeights(docs, budgetTokens = budget)
        .collect()
        .map(r => r.getAs[String]("lang") ->
          math.floor(r.getAs[Double]("admit_rate") * 10000d + 0.5d).toLong)
        .toMap
      val expected = docs.collect()
        .filter(r => bucket(r.getAs[String]("text")) <
          cutoffs(r.getAs[String]("lang")))
        .map(_.getAs[Long]("doc_id")).toSet
      val got = Curation.mixApply(docs, budgetTokens = budget).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got == expected, s"budget=$budget")
      got
    }
    // the gate corpus (~26k tokens) fits inside the default budget:
    // every rate caps at 1 and the resample must be the identity
    assert(check(100000L).size == docs.count())
    // a sub-corpus budget must admit a nonempty proper subset
    val tight = check(1000L)
    assert(tight.nonEmpty, "a 1000-token budget must admit some documents")
    assert(tight.size < docs.count(),
      "a 1000-token budget must reject some documents")
  }

  test("packSequences: bins partition the corpus; occupancy is budget-shaped") {
    val r = Curation.packSequences(docs).collect()
    val nDocs = r.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == docs.count(), "every doc lands in exactly one bin")
    val maxTok = docs.select(max(size(split(col("text"), " ")))).head().getInt(0)
    // a bin's occupancy exceeds the budget only by documents that
    // OPENED in it (first-fit): bound = budget + maxDoc - 1 per closing
    // doc, and the synthetic docs are all far under budget
    assert(r.forall(_.getAs[Long]("sum_tokens") <= 256 + maxTok))
  }

  test("tokenBudget: histogram-cutoff plan matches the naive-window reference") {
    val budgets = Map("en" -> 300L)
    val default = 150L
    val got = Curation.tokenBudget(docs, budgets, default).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_tok"))).toSet
    // reference: the oracle's naive semantics — per lang, order by
    // (md5 hash bucket, doc_id), admit while tokens-before < budget
    def bucket(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("budget:" + text).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 10000
    }
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text")))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val budget = budgets.getOrElse(lang, default)
      var before = 0L
      ds.sortBy { case (id, _, text) => (bucket(text), id) }.flatMap {
        case (id, l, text) =>
          val n = text.split(" ", -1).length.toLong
          val admit = before < budget
          before += n
          if (admit) Some((id, l, n)) else None
      }
    }.toSet
    assert(got == expected)
    // budget compliance: overshoot is at most one document
    got.groupBy(_._2).foreach { case (lang, sel) =>
      val budget = budgets.getOrElse(lang, default)
      val total = sel.map(_._3).sum
      assert(total < budget + sel.map(_._3).max,
        s"$lang: $total tokens vs budget $budget")
    }
  }

  test("qualityTopK matches an in-memory reference selection (property)") {
    val k = 5
    val got = Curation.qualityTopK(docs, k = k).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rnk")) ->
        ((r.getAs[Long]("doc_id"), r.getAs[Double]("q_score")))).toMap
    // reference: score + sort in plain Scala over the collected corpus
    val stop = Set("the", "a", "of", "and", "is")
    val expected = docs.select("doc_id", "lang", "text").collect()
      .map { r =>
        val toks = r.getAs[String]("text").split(" ", -1)
        (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
          toks.count(stop).toDouble / toks.length)
      }
      .groupBy(_._1)
      .toSeq
      .flatMap { case (lang, rows) =>
        rows.toSeq.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex.map {
          case ((_, id, s), i) => (lang, i + 1L) -> ((id, s))
        }
      }.toMap
    assert(got == expected)
    got.foreach { case ((_, rnk), _) => assert(rnk >= 1 && rnk <= k) }
  }

  test("tokenChunks: window arithmetic, truncation, and doc coverage") {
    val d = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Curation.tokenChunks(d, chunkLen = 4, stride = 3).collect()
      .map(x => (x.getAs[Long]("chunk_id"), x.getAs[Long]("tok_start"),
        x.getAs[Long]("n_chunk_tok"), x.getAs[String]("chunk_text")))
      .sortBy(_._1)
    assert(r.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    assert(r(0)._4 == "t1 t2 t3 t4")
    assert(r(1)._4 == "t4 t5 t6 t7")   // overlap = chunkLen - stride = 1
    assert(r(3)._4 == "t10")           // trailing chunk truncates
    // stride-aligned prefixes reassemble the doc exactly
    val rebuilt = r.map(c => c._4.split(" ").take(3)).flatten
    assert(rebuilt.mkString(" ").startsWith("t1 t2 t3 t4 t5 t6 t7 t8 t9"))
  }

  test("tokenChunks: corpus chunk mass accounts for every token") {
    val chunkLen = 32
    val stride = 32 // non-overlapping: chunk tokens partition each doc
    val r = Curation.tokenChunks(docs, chunkLen, stride)
    val got = r.agg(sum(col("n_chunk_tok"))).head().getLong(0)
    val total = docs.select(sum(size(split(col("text"), " "))))
      .head().getLong(0)
    assert(got == total, s"chunk token mass $got != corpus $total")
    // chunk ids are dense per doc: max(chunk_id)+1 == chunk count
    val perDoc = r.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max(col("chunk_id")).as("mx"))
      .where(col("n") =!= col("mx") + 1).count()
    assert(perDoc == 0L)
  }

  test("tokenChunks: boundaries-only mode emits identical chunks minus the text") {
    val withText = Curation.tokenChunks(docs, chunkLen = 16, stride = 12)
    val boundaries = Curation.tokenChunks(docs, chunkLen = 16, stride = 12,
      withText = false)
    assert(boundaries.columns.toSeq ==
      Seq("doc_id", "chunk_id", "tok_start", "n_chunk_tok"),
      "boundaries mode must drop ONLY chunk_text")
    // chunk identities are the same rows in both modes
    assert(withText.drop("chunk_text").exceptAll(boundaries).isEmpty &&
      boundaries.exceptAll(withText.drop("chunk_text")).isEmpty,
      "both modes must emit identical chunk boundaries")
  }

  test("decontaminateFuzzy: near-dups, verbatim copies, and clone inheritance flagged; unrelated not") {
    // doc 0 is the benchmark item (id%10==0); 21 tokens => 19 distinct
    // 3-shingles
    val base = (1 to 21).map(i => s"w$i").mkString(" ")
    val near = (1 to 20).map(i => s"w$i").mkString(" ") + " zz" // J = 18/20 = 0.9
    val d = Seq(
      (0L, base), // benchmark
      (1L, near), // near-dup of the benchmark -> flagged at 0.9
      (2L, base), // VERBATIM copy of the benchmark -> flagged at 1.0
      (3L, near), // exact copy of the flagged near-dup -> inherits 0.9
      (4L, (1 to 21).map(i => s"q$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val got = Curation.decontaminateFuzzy(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("max_jaccard"))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"flag set wrong: $got")
    assert(got(2L) == 1.0, "a verbatim benchmark copy is jaccard 1.0")
    assert(math.abs(got(1L) - 0.9) < 1e-12 && got(1L) == got(3L),
      s"near-dup jaccard exact and inherited by exact clones: $got")
  }

  test("sourceKl: zero for a distribution-identical source, positive for a skewed one") {
    // sources a and b share the corpus distribution scaled 2x; source c
    // is disjoint vocabulary -> strongly divergent
    val d = Seq(
      (1L, "x x y", "a"), (2L, "x x y x x y", "b"),
      (3L, "z z z", "c")
    ).toDF("doc_id", "text", "source")
    val rows = graft.operators.TextOps.sourceKl(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tok"), r.getAs[Double]("kl_nats"))).toMap
    assert(rows("a")._1 == 3L && rows("b")._1 == 6L && rows("c")._1 == 3L)
    // p_a = p_b = (2/3 x, 1/3 y) but the CORPUS includes c's z mass, so
    // both diverge from the corpus equally; same distribution -> same KL
    assert(math.abs(rows("a")._2 - rows("b")._2) < 1e-9,
      s"identical distributions must have identical KL: $rows")
    assert(rows.values.forall(_._2 >= 0.0), s"KL is non-negative: $rows")
    assert(rows("c")._2 > rows("a")._2,
      s"the disjoint-vocabulary source diverges most: $rows")
    // local model: KL(p_c || corpus) with p_c(z)=1, corpus(z)=3/12
    val expectC = math.rint(math.log((3.0 * 12) / (3.0 * 3)) * 1e6) / 1e6
    assert(math.abs(rows("c")._2 - expectC) < 1e-9,
      s"KL matches the local model: got ${rows("c")._2}, want $expectC")
  }

  test("stratifiedSample: exactly k per stratum, rerun-stable, dense ranks") {
    val r1 = Curation.stratifiedSample(docs, k = 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("rnk")))
    val r2 = Curation.stratifiedSample(docs, k = 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("rnk")))
    assert(r1.sortBy(x => (x._2, x._3)).toSeq == r2.sortBy(x => (x._2, x._3)).toSeq,
      "the draw is deterministic across runs")
    r1.groupBy(_._2).foreach { case (lang, rows) =>
      val n = docs.where(col("lang") === lang).count()
      assert(rows.length == math.min(5L, n),
        s"$lang: ${rows.length} sampled of $n")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"$lang ranks dense")
    }
    // a different salt draws a different sample (content-independent)
    val r3 = Curation.stratifiedSample(docs, k = 5, salt = "other").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(r3 != r1.map(_._1).toSet,
      "distinct salt domains must not reproduce the same draw")
  }

  test("splitLeakage: exactly the cross-split near-dup representative pairs") {
    val sf01 = Tables(spark, "/root/testdata/sf0.01", "documents")
    val r = Curation.splitLeakage(sf01).collect()
      .map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")) ->
        ((x.getAs[String]("a_split"), x.getAs[String]("b_split"),
          x.getAs[Double]("jaccard")))).toMap
    // the synthetic corpus plants near-dups; content-hash splits land
    // some straddling pairs (deterministic for fixed data)
    assert(r.nonEmpty, "expected at least one cross-split near-dup pair")
    r.values.foreach { case (a, b, j) =>
      assert(a != b); assert(j >= 0.8)
    }
    // cross-check: composition of the verified-pairs op and splitOf
    val pairs = graft.operators.Dedup.minhashExactVerifiedPairs(sf01)
      .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")))
    val splits = sf01.select(col("doc_id"),
      graft.operators.TextOps.splitOf().as("split")).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("split")).toMap
    val expected = pairs.filter { case (a, b) => splits(a) != splits(b) }.toSet
    assert(r.keySet == expected)
  }

  test("ccnetBuckets: histogram-rank plan equals the naive per-lang thirds") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val r = Curation.ccnetBuckets(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("lang"), x.getAs[Double]("score"),
          x.getAs[String]("bucket")))).toMap
    // reference: the oracle's naive global rank per lang
    val scores = graft.operators.TextOps.unigramLogProb(docs)
      .join(docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang")), "doc_id")
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("lang"),
        x.getAs[Double]("avg_logprob")))
    assert(r.keySet == scores.map(_._1).toSet)
    for ((lang, rows) <- scores.groupBy(_._2)) {
      val ordered = rows.sortBy { case (id, _, s) => (-s, id) }
      val n = ordered.length
      for (((id, _, s), i) <- ordered.zipWithIndex) {
        val rn = i + 1
        val expected = if (rn * 3 <= n) "head"
          else if (rn * 3 <= 2 * n) "middle" else "tail"
        assert(r(id)._3 == expected,
          s"doc $id ($lang rank $rn/$n): ${r(id)._3} vs $expected")
        assert(math.abs(r(id)._2 - s) < 1e-12)
      }
      // thirds are balanced to within one doc
      val counts = ordered.indices.groupBy { i =>
        val rn = i + 1
        if (rn * 3 <= n) "head" else if (rn * 3 <= 2 * n) "middle" else "tail"
      }.map { case (b, xs) => b -> xs.size }
      assert(counts.values.max - counts.values.min <= 2, s"$lang: $counts")
    }
  }

  test("dsirScore: target-like docs outscore off-distribution docs") {
    import spark.implicits._
    // target docs (doc_id % 10 == 7) all speak "alpha beta"; raw docs
    // 100/101 split into one alpha-beta clone and one off-distribution
    // doc — the clone must carry the higher importance weight
    val d = (Seq(7L, 17L, 27L, 37L).map(_ -> "alpha beta alpha beta alpha") ++
      Seq(100L -> "alpha beta alpha beta gamma",
        101L -> "delta epsilon zeta delta epsilon")).toDF("doc_id", "text")
    val r = Curation.dsirScore(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Boolean]("is_target"), x.getAs[Double]("log_weight")))).toMap
    assert(r.keySet == Set(7L, 17L, 27L, 37L, 100L, 101L))
    assert(r(7L)._1 && !r(100L)._1 && !r(101L)._1)
    assert(r(100L)._2 > r(101L)._2,
      s"target-like doc must outscore off-distribution: $r")
    assert(r(101L)._2 < 0, "off-distribution doc must score negative")
  }

  test("writeDsirIndex/dsirScoreFrom: served scores equal the " +
      "self-trained dsirScore bit-for-bit (round-trip — every " +
      "training bucket has a stored row, the floor never fires)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dsiridx").toString
    Curation.writeDsirIndex(docs, dir)
    def tuples(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_target"),
        r.getAs[Long]("n_feat"), r.getAs[Double]("log_weight")))
      .sortBy(_._1)
    val served = tuples(Curation.dsirScoreFrom(spark, dir, docs))
    val self = tuples(Curation.dsirScore(docs))
    assert(served.nonEmpty && served.sameElements(self))
  }

  test("dsirScoreFrom: a bucket the frozen model never saw takes the " +
      "add-one floor; snapshots served against one index share the " +
      "scale") {
    import spark.implicits._
    val train = (Seq(7L, 17L).map(_ -> "alpha beta alpha") ++
      Seq(100L -> "alpha gamma", 101L -> "beta gamma gamma"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dsirfloor").toString
    Curation.writeDsirIndex(train, dir)
    // meta carries the stored totals the floor derives from
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    val (nt, nr) = (meta.getAs[Long]("n_target"), meta.getAs[Long]("n_raw"))
    val floorDec = new java.math.BigDecimal(math.log(
        (1.0 / (nt + 1024)) / (1.0 / (nr + 1024))))
      .setScale(6, java.math.RoundingMode.HALF_UP)
    // "zzz unseen" holds two unigrams + one bigram, all absent from
    // the training corpus (no token overlap), so EVERY feature takes
    // the floor: log_weight = decimal(3 · floor) exactly
    val novel = Seq(200L -> "zzz unseen").toDF("doc_id", "text")
    val r = Curation.dsirScoreFrom(spark, dir, novel).collect()(0)
    val want = floorDec.multiply(new java.math.BigDecimal(3)).doubleValue()
    assert(r.getAs[Long]("n_feat") == 3)
    assert(r.getAs[Double]("log_weight") == want,
      s"got ${r.getAs[Double]("log_weight")} want $want")
    // one-scale property: the same doc in two served snapshots
    val snapA = Seq(300L -> "alpha beta", 301L -> "beta beta")
      .toDF("doc_id", "text")
    val snapB = Seq(300L -> "alpha beta", 302L -> "gamma")
      .toDF("doc_id", "text")
    val a = Curation.dsirScoreFrom(spark, dir, snapA).collect()
      .find(_.getAs[Long]("doc_id") == 300L).get.getAs[Double]("log_weight")
    val b = Curation.dsirScoreFrom(spark, dir, snapB).collect()
      .find(_.getAs[Long]("doc_id") == 300L).get.getAs[Double]("log_weight")
    assert(a == b, "frozen model must put both snapshots on one scale")
  }

  test("mineTriplets: anchors/positives are exactly the verified " +
      "near-dup pairs, negatives are never the pair or its text, " +
      "and the mining is rerun-deterministic") {
    val r1 = Curation.mineTriplets(docs, negBuckets = 8).collect()
      .map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("pos_id"),
        x.getAs[Long]("neg_id"), x.getAs[Double]("jaccard")))
      .sortBy(t => (t._1, t._2))
    assert(r1.nonEmpty, "gate corpus must yield triplets")
    val r2 = Curation.mineTriplets(docs, negBuckets = 8).collect()
      .map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("pos_id"),
        x.getAs[Long]("neg_id"), x.getAs[Double]("jaccard")))
      .sortBy(t => (t._1, t._2))
    assert(r1.sameElements(r2), "ring negatives must be deterministic")
    val verified = Dedup.minhashExactVerifiedPairs(docs).collect()
      .map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"))).toSet
    val texts = docs.collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("text")).toMap
    r1.foreach { case (a, p, n, j) =>
      assert(verified.contains((a, p)), s"($a,$p) not a verified pair")
      assert(n != a && n != p)
      assert(texts(n) != texts(a) && texts(n) != texts(p),
        s"negative $n text-collides with the pair ($a,$p)")
      assert(j >= 0.8)
    }
  }

  test("mineTripletsHard: banded rows carry the anchor's " +
      "highest-estimate candidate below hardMax, anchors without " +
      "one fall back to the ring negative") {
    val r = Curation.mineTripletsHard(docs, negBuckets = 8).collect()
      .map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("pos_id"),
        x.getAs[Long]("neg_id"),
        Option(x.getAs[java.lang.Double]("neg_est")).map(_.toDouble),
        x.getAs[String]("neg_kind")))
    assert(r.nonEmpty, "gate corpus must yield triplets")
    // every verified pair survives as a triplet (the fallback is
    // what makes the op total)
    val ringTrip = Curation.mineTriplets(docs, negBuckets = 8).collect()
      .map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("pos_id")))
      .toSet
    assert(r.map(t => (t._1, t._2)).toSet == ringTrip,
      "hard mining must keep exactly the ring op's (anchor, pos) rows")
    // all banded candidates with their estimates, bidirectional
    val cands = Dedup.minhashVerifiedPairs(docs, threshold = 0.0).collect()
      .flatMap { x =>
        val (a, b, e) = (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"),
          x.getAs[Double]("est_jaccard"))
        Seq((a, b, e), (b, a, e))
      }
    val below = cands.filter(_._3 < 0.5)
      .groupBy(_._1).view.mapValues(_.map(c => (c._3, c._2)).max).toMap
    r.foreach { case (a, p, n, e, kind) =>
      assert(n != p && n != a)
      kind match {
        case "banded" =>
          assert(e.exists(_ < 0.5), s"banded est $e must be below hardMax")
          assert(e.contains(below(a)._1),
            s"anchor $a: neg est $e but the hardest candidate has ${below(a)._1}")
        case "ring" =>
          assert(e.isEmpty)
          // ring fires only when no usable banded candidate exists
          assert(!below.get(a).exists(_._2 != p),
            s"anchor $a fell back to ring despite a banded candidate")
        case other => fail(s"unknown neg_kind $other")
      }
    }
    info(s"${r.count(_._5 == "banded")} banded / " +
      s"${r.count(_._5 == "ring")} ring of ${r.length}")
  }

  test("mineTripletsHard: a crafted near-miss candidate IS taken as " +
      "the banded hard negative") {
    import spark.implicits._
    // 1-2: verified near-dup pair (true J = 10/11); 3 shares a long
    // prefix with 1 (true J = 8/12; the fixed hash family estimates
    // it 0.71875 — banded, below hardMax 0.75); 100-103: ring filler
    val base = (1 to 12).map(i => s"t$i").mkString(" ")
    val d = Seq(
      1L -> base,
      2L -> (base + " t13"),
      3L -> ((1 to 10).map(i => s"t$i").mkString(" ") + " x1 x2"),
      100L -> "alpha beta gamma delta epsilon",
      101L -> "one two three four five six",
      102L -> "red green blue yellow purple",
      103L -> "north south east west centre").toDF("doc_id", "text")
    val r = Curation.mineTripletsHard(d, hardMax = 0.75, negBuckets = 2)
      .collect()
      .map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("pos_id"),
        x.getAs[Long]("neg_id"), x.getAs[String]("neg_kind")))
    assert(r.length == 1, s"got ${r.toSeq}")
    val (a, p, n, kind) = r(0)
    assert(a == 1L && p == 2L)
    assert(n == 3L && kind == "banded",
      s"doc 3 must be the banded hard negative, got ($n, $kind)")
  }

  test("updateDsirIndex: surgery is BIT-EQUAL to a scratch rebuild " +
      "over the post-diff corpus, fully-retracted buckets leave") {
    import spark.implicits._
    val oldCorpus = Seq(
      7L -> "alpha beta alpha", 17L -> "alpha gamma beta",
      100L -> "alpha delta", 101L -> "epsilon zeta zeta",
      102L -> "qqq www")                 // 102 fully retracts: its
      .toDF("doc_id", "text")            // buckets must leave
    val removed = Seq(102L -> "qqq www").toDF("doc_id", "text")
    val added = Seq(27L -> "alpha alpha theta", 103L -> "iota kappa")
      .toDF("doc_id", "text")
    val post = oldCorpus.where("doc_id <> 102").unionByName(added)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-dsirsurg").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-dsirsurg-out").toString
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-dsirsurg-scr").toString
    Curation.writeDsirIndex(oldCorpus, idx)
    Curation.updateDsirIndex(spark, idx, out, removed, added)
    Curation.writeDsirIndex(post, scratch)
    def frames(p: String) = (
      spark.read.parquet(s"$p/counts").collect()
        .map(r => (r.getAs[Long]("b"), r.getAs[Long]("ct"),
          r.getAs[Long]("cr"))).sortBy(_._1).toSeq,
      spark.read.parquet(s"$p/ratio").collect()
        .map(r => (r.getAs[Long]("b"),
          r.getAs[java.math.BigDecimal]("lr"))).sortBy(_._1).toSeq,
      spark.read.parquet(s"$p/meta").collect()(0).toSeq)
    assert(frames(out) == frames(scratch),
      "surgered artifacts must equal the scratch rebuild bit-for-bit")
    // the surgered index SERVES identically too
    val probeDocs = Seq(1L -> "alpha beta qqq", 2L -> "zzz")
      .toDF("doc_id", "text")
    val a = Curation.dsirScoreFrom(spark, out, probeDocs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("log_weight")))
      .sortBy(_._1).toSeq
    val b = Curation.dsirScoreFrom(spark, scratch, probeDocs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("log_weight")))
      .sortBy(_._1).toSeq
    assert(a == b)
    // guard: surgery must not write over the index it reads
    intercept[IllegalArgumentException] {
      Curation.updateDsirIndex(spark, idx, idx, removed, added)
    }
  }

  test("modelStats: artifact counts match direct reads, a missing " +
      "optional artifact reports present=false, unknown kinds throw") {
    val probeDir = java.nio.file.Files
      .createTempDirectory("graft-ms-probe").toString
    val bpeDir = java.nio.file.Files
      .createTempDirectory("graft-ms-bpe").toString
    Curation.writeProbeIndex(docs, probeDir, dim = 16)
    // serve-only BPE build: vocab/ intentionally absent
    TextOps.writeBpeIndex(docs, bpeDir, nMerges = 4, minPairCount = 1,
      writeVocab = false)
    val r = Curation.modelStats(spark, Seq(
        ("p", "probe", probeDir), ("b", "bpe", bpeDir))).collect()
      .map(x => (x.getAs[String]("model_id"), x.getAs[String]("artifact")) ->
        ((x.getAs[Boolean]("present"),
          Option(x.getAs[java.lang.Long]("n_rows")).map(_.toLong))))
      .toMap
    assert(r(("p", "weights")) == ((true, Some(16L))))
    assert(r(("p", "meta")) == ((true, Some(1L))))
    val merges = spark.read.parquet(s"$bpeDir/merges").count()
    assert(r(("b", "merges")) == ((true, Some(merges))))
    assert(r(("b", "vocab")) == ((false, None)),
      "the optional missing artifact must report, not crash")
    intercept[IllegalArgumentException] {
      Curation.modelStats(spark, Seq(("x", "nosuch", probeDir)))
    }
  }

  test("mineTriplets validity over randomized clone corpora: every " +
      "triplet's negative differs from the pair by id AND text, " +
      "anchors are verified-pair lefts, output is rerun-stable") {
    val rnd = new scala.util.Random(31337)
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until 8 + r.nextInt(12)).map(_ => s"w${r.nextInt(25)}").mkString(" ")
    }
    (0 until 5).foreach { trial =>
      // families of near-dups (suffix-extended copies) + strangers
      val base = (0 until 6 + rnd.nextInt(4)).map(i =>
        (i * 10).toLong -> doc(trial * 50 + i))
      val family = base.flatMap { case (id, t) =>
        (0 until rnd.nextInt(3)).map(v => (id + v + 1) -> (t + s" x$v"))
      }
      val d = (base ++ family).toDF("doc_id", "text")
      val buckets = 1 + rnd.nextInt(4)
      def run() = Curation.mineTriplets(d, negBuckets = buckets).collect()
        .map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("pos_id"),
          x.getAs[Long]("neg_id"))).sortBy(t => (t._1, t._2)).toSeq
      val r1 = run()
      assert(r1 == run(), s"trial $trial: not rerun-stable")
      val texts = d.collect()
        .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("text")).toMap
      val verified = Dedup.minhashExactVerifiedPairs(d).collect()
        .map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"))).toSet
      r1.foreach { case (a, p, n) =>
        assert(verified((a, p)), s"trial $trial: ($a,$p) unverified")
        assert(n != a && n != p, s"trial $trial: negative is the pair")
        assert(texts(n) != texts(a) && texts(n) != texts(p),
          s"trial $trial: negative text-collides")
      }
    }
  }

  test("dsirScore matches an in-memory hashed-feature reference") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val r = Curation.dsirScore(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_feat"), x.getAs[Double]("log_weight")))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1))
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1024
    }
    def feats(t: String): Seq[Long] = {
      val ts = t.split(" ", -1).filter(_.nonEmpty)
      val u = ts.toSeq
      val b = if (ts.length >= 2)
        ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      else Seq.empty
      (u ++ b).map(bucket)
    }
    val tfAll = texts.map { case (id, t) => id -> feats(t) }
    val ct = scala.collection.mutable.Map.empty[Long, Long]
    val cr = scala.collection.mutable.Map.empty[Long, Long]
    for ((id, fs) <- tfAll; f <- fs)
      if (id % 10 == 7) ct(f) = ct.getOrElse(f, 0L) + 1
      else cr(f) = cr.getOrElse(f, 0L) + 1
    val nt = ct.values.sum; val nr = cr.values.sum
    for ((id, fs) <- tfAll if fs.nonEmpty) {
      val exp = fs.groupBy(identity).map { case (b, xs) =>
        val lr = BigDecimal(math.log(
          ((ct.getOrElse(b, 0L) + 1).toDouble / (nt + 1024)) /
            ((cr.getOrElse(b, 0L) + 1).toDouble / (nr + 1024))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        lr * xs.length
      }.sum.toDouble
      val (nF, got) = r(id)
      assert(nF == fs.length, s"doc $id n_feat")
      assert(math.abs(got - exp) < 1e-9, s"doc $id: $got vs $exp")
    }
  }

  test("trainOrder: a seeded bijection — every doc exactly once, " +
      "per-shard positions contiguous, replayable, seed-sensitive") {
    import spark.implicits._
    val d = (0L until 100L).map(i => (i, s"text $i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    def coords(seed: Long) = Curation.trainOrder(d, seed, nShards = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    val c0 = coords(0)
    assert(c0.keySet == (0L until 100L).toSet, "every doc exactly once")
    assert(c0.values.forall { case (s, _) => s >= 0 && s < 4 })
    // positions within each shard are exactly 1..n (a read plan can
    // trust them as a dense cursor)
    c0.values.groupBy(_._1).foreach { case (s, rows) =>
      val ps = rows.map(_._2).toSeq.sorted
      assert(ps == (1L to ps.length.toLong), s"shard $s positions $ps")
    }
    // replay: the same seed is bit-identical
    assert(coords(0) == c0)
    // a different seed is a different order (content-free hashing of
    // (seed, doc_id) — on 100 docs a collision of entire epoch orders
    // would mean md5 is broken)
    assert(coords(1) != c0)
    // and the order is not doc_id order (the whole point)
    val inOrder = c0.toSeq.sortBy { case (_, (s, p)) => (s, p) }
      .map(_._1)
    assert(inOrder != inOrder.sorted, "shuffle must not be identity")
  }
}
