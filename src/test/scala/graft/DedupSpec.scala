package graft

import graft.operators.Dedup

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en"),
    (1L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest tonight", "en"),
    (2L, "completely different text about spark distributed query engines operating at warehouse scale with shuffles", "en"),
    (3L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en")
  ).toDF("doc_id", "text", "lang")

  test("exact dedup keeps lowest doc_id and counts duplicates") {
    val r = Dedup.exact(docs).collect()
    assert(r.length == 3) // docs 0 and 3 collapse
    val dup = r.find(_.getAs[Long]("dup_cnt") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("minhash LSH candidates: star-compressed default, composed form " +
      "includes exact dups, both exclude unrelated") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // default: exact copies collapse to their rep (0) — the (0,3)
    // member pair is stage 0's, not this op's
    val rep = pairs(Dedup.minhashCandidates(docs))
    assert(!rep.exists { case (a, b) => a == 3L || b == 3L },
      s"non-rep member must not appear in the star-compressed form: $rep")
    // composed: the full member-level enumeration (the pre-r10 raw
    // semantics) — identical signature pairs reappear
    val full = pairs(Dedup.minhashCandidates(docs, composeMembers = true))
    assert(full.contains((0L, 3L)))
    assert(!full.exists { case (a, b) => a == 2L || b == 2L })
    // composed == raw enumeration when no cap trips
    val raw = pairs(Dedup.candidatesFromSketch(Dedup.minhashSketch(docs)))
    assert(full == raw, s"missing=${raw -- full} extra=${full -- raw}")
  }

  test("minhash composed form: short-doc copies never sketch, so their " +
      "pairs are absent from both raw and composed forms") {
    // "tiny doc" has 2 tokens < shingleLen 3: its copies have no
    // signature, so the raw form never paired them — the composed
    // within-group expansion must respect that gate
    val d = Seq(
      (0L, "tiny doc", "en"), (1L, "tiny doc", "en"),
      (2L, "a long enough document with plenty of tokens to shingle", "en"),
      (3L, "a long enough document with plenty of tokens to shingle", "en")
    ).toDF("doc_id", "text", "lang")
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val full = pairs(Dedup.minhashCandidates(d, composeMembers = true))
    val raw = pairs(Dedup.candidatesFromSketch(Dedup.minhashSketch(d)))
    assert(full == raw, s"missing=${raw -- full} extra=${full -- raw}")
    assert(full.contains((2L, 3L)) && !full.contains((0L, 1L)))
  }

  test("simhash: identical docs identical, near-dup closer than unrelated") {
    val fp = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash64")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(0L, 3L) == 0)
    assert(ham(0L, 1L) < ham(0L, 2L))
  }

  test("minhashVerifiedPairs: near-dups estimated, exact dups left to stage 0") {
    val pairs = Dedup.minhashVerifiedPairs(docs, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("est_jaccard")))
    // (0,1) are near-dups: high but sub-1.0 estimate
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 1L && j >= 0.5 && j < 1.0 })
    // (0,3) are exact copies: collapsed by stage-0 exact dedup, not re-paired
    assert(!pairs.exists { case (a, b, _) => a == 0L && b == 3L })
    assert(pairs.forall(_._3 >= 0.5))
  }

  test("minhashExactVerifiedPairs: TRUE Jaccard on candidates, exact value") {
    // docs 0/1 differ in the last of 21 tokens: 19 distinct 3-shingles
    // each, 18 shared -> exact J = 18 / (19 + 19 - 18) = 0.9
    val pairs = Dedup.minhashExactVerifiedPairs(docs, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("jaccard")))
    assert(pairs.toSeq == Seq((0L, 1L, 0.9)),
      s"expected exactly the (0,1) near-dup pair with true jaccard, got ${pairs.toSeq}")
  }

  test("dedupGroups: exact + near-dup edges merge transitively into min-id groups") {
    // fixture: 0↔3 exact copies, 0↔1 near-dups (J=0.9) → one group {0,1,3};
    // 2 is isolated → its own group
    val groups = Dedup.dedupGroups(docs, threshold = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
    assert(groups == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 0L))
  }

  test("dedupApply: one survivor per group, group sizes account for every doc") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en", "web"),
      (1L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest tonight", "en", "wiki"),
      (2L, "completely different text about spark distributed query engines operating at warehouse scale with shuffles", "fr", "web"),
      (3L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.dedupApply(d, threshold = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[String]("source"),
          r.getAs[Long]("group_size")))).toMap
    // groups: {0,1,3} (0↔3 exact, 0↔1 near) and {2} → survivors are the
    // group minima, each carrying its own metadata and the member count
    assert(out == Map(0L -> (("en", "web", 3L)), 2L -> (("fr", "web", 1L))),
      s"got $out")
    assert(out.values.map(_._3).sum == d.count(),
      "group sizes must partition the corpus")
  }

  test("compute-once doors: apply/rate from a shared groups frame equal the one-shot forms") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en", "web"),
      (1L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest tonight", "en", "wiki"),
      (2L, "completely different text about spark distributed query engines operating at warehouse scale with shuffles", "fr", "web"),
      (3L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val groups = Dedup.dedupGroups(d, threshold = 0.5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Dedup.dedupApplyFromGroups(d, groups)) ==
      rows(Dedup.dedupApply(d, threshold = 0.5)))
    assert(rows(Dedup.dedupRateFromGroups(d, groups)) ==
      rows(Dedup.dedupRateBySource(d, threshold = 0.5)))
  }

  test("dedupRateBySource: cross-source groups count for both; ppm is integer-exact") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en", "web"),
      (1L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest tonight", "en", "wiki"),
      (2L, "completely different text about spark distributed query engines operating at warehouse scale with shuffles", "fr", "web"),
      (3L, "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark quiet forest today", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val r = Dedup.dedupRateBySource(d, threshold = 0.5).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("n_groups"),
          x.getAs[Long]("dup_ppm")))).toMap
    // groups: {0,1,3} and {2}. web sees docs {0,2,3} in groups {0,2}
    // → 1 redundant of 3 = 333333 ppm; wiki's single doc sits in the
    // shared group 0 (counted for wiki too) → zero redundancy
    assert(r == Map("web" -> ((3L, 2L, 333333L)),
      "wiki" -> ((1L, 1L, 0L))), s"got $r")
  }

  test("bandSaturation: planted constant segments read as saturated, varied ones do not") {
    import spark.implicits._
    // the maxHamming=5 layout is 8 bands × 8 bits (next divisor of
    // 64). 256 hashes whose only varying bits are 8..15 (band 1):
    // bands 0 and 2..7 are constant-zero → saturated (256 rows >
    // floor 100, share 100%); band 1 is 256 distinct single-row
    // buckets → top share 1/256
    val planted = (0 until 256).map(i => (i.toLong, (i.toLong & 0xff) << 8))
      .toDF("doc_id", "h64")
    val r = Dedup.bandSaturation(planted).collect()
      .map(x => x.getAs[Int]("band_idx") ->
        ((x.getAs[Long]("n_buckets"), x.getAs[Long]("top_share_ppm"),
          x.getAs[Long]("n_saturated"), x.getAs[Long]("rows_saturated"))))
      .toMap
    assert(r.keySet == (0 until 8).toSet, s"got ${r.keySet}")
    ((0 until 8).toSet - 1).foreach { b =>
      assert(r(b) == ((1L, 1000000L, 1L, 256L)),
        s"band $b should be one fully saturated bucket: ${r(b)}")
    }
    assert(r(1) == ((256L, 3906L, 0L, 0L)),
      s"the varied band must show uniform shares and no saturation: ${r(1)}")
    // uniform control: xxhash-mixed values never saturate
    val uniform = (0 until 256).map(i => (i.toLong, i.toLong))
      .toDF("doc_id", "x")
      .selectExpr("doc_id", "xxhash64(x) AS h64")
    val u = Dedup.bandSaturation(uniform).collect()
    assert(u.forall(_.getAs[Long]("n_saturated") == 0L),
      "mixed hashes must not saturate any band")
  }

  test("connectedComponents matches union-find on random graphs (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def unionFind(n: Int, es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        val ra = find(a.toInt); val rb = find(b.toInt)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val gen = for {
      n <- Gen.choose(1, 40)
      k <- Gen.choose(0, 80)
      es <- Gen.listOfN(k, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield (n, es.map { case (a, b) => (a.toLong, b.toLong) })
    val random = Gen.listOfN(8, gen)
      .apply(Gen.Parameters.default, Seed(7L)).get
    // plus the adversarial case star rounds exist for: a 30-node chain
    // (plain propagation would need 29 rounds; star rounds need ~log)
    val chain = (30, (0 until 29).map(i => (i.toLong, i.toLong + 1)).toSeq)
    (random :+ chain).foreach { case (n, es) =>
      val vertices = (0L until n.toLong).toDF("doc_id")
      val edges = es.toDF("src", "dst")
      // BOTH execution paths against the same reference: the default
      // driver-side union-find finish (small graphs) and the
      // distributed star rounds (forced via driverFinishEdges = 0)
      val viaDriver = Dedup.connectedComponents(vertices, edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaStars = Dedup.connectedComponents(vertices, edges,
          driverFinishEdges = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == unionFind(n, es), s"driver path: n=$n edges=$es")
      assert(viaStars == unionFind(n, es), s"star path: n=$n edges=$es")
    }
  }

  test("connectedComponents throws rather than returning an unproven fixpoint") {
    val vertices = (0L until 30L).toDF("doc_id")
    val chain = (0 until 29).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException](
      Dedup.connectedComponents(vertices, chain, maxRounds = 1,
        driverFinishEdges = 0L))
    assert(e.getMessage.contains("converge"))
  }

  test("simhashPairs: finds identical docs via band join, respects hamming cap") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("a_id") == 0L && r.getAs[Long]("b_id") == 3L &&
        r.getAs[Long]("hamming") == 0L))
    assert(pairs.forall(_.getAs[Long]("hamming") <= 3L))
    assert(!pairs.exists(r =>
      r.getAs[Long]("a_id") == 2L || r.getAs[Long]("b_id") == 2L))
  }

  test("minhash candidates cover every high-shingle-Jaccard pair (recall on real docs)") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // truth in the SAME feature space the signatures hash: 3-shingles
    val truth = pairs(Dedup.jaccardPairs(docs, bound = Long.MaxValue,
      threshold = 0.8, shingleLen = 3))
    val cand = pairs(Dedup.minhashCandidates(docs, composeMembers = true))
    assert(truth.nonEmpty, "test data should contain high-jaccard near-dups")
    val missed = truth -- cand
    assert(missed.isEmpty,
      s"LSH banding missed ${missed.size}/${truth.size} true pairs: $missed")
  }

  test("containmentPairs catches subset quotes Jaccard misses") {
    // doc 11's token set is a strict subset of doc 10's: containment
    // is exactly 1.0 while Jaccard is |A|/|B| — the asymmetric-size
    // near-dup the containment measure exists for
    val d = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      (11L, "alpha beta gamma delta", "en"),
      (12L, "totally unrelated words about completely other things here now", "en")
    ).toDF("doc_id", "text", "lang")
    val cont = Dedup.containmentPairs(d, bound = 100, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("containment")).toMap
    assert(cont == Map((10L, 11L) -> 1.0))
    val jac = Dedup.jaccardPairs(d, bound = 100, threshold = 0.8).collect()
    assert(jac.isEmpty, "Jaccard at 0.8 must be blind to the subset quote")
    // measures agree on the shared feature space: containment >= jaccard
    // always (min(|A|,|B|) <= |A∪B|)
    val jAll = Dedup.jaccardPairs(docs, bound = 100, threshold = 0.0)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("jaccard")).toMap
    val cAll = Dedup.containmentPairs(docs, bound = 100, threshold = 0.0)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("containment")).toMap
    assert(jAll.keySet == cAll.keySet)
    jAll.foreach { case (p, j) => assert(cAll(p) >= j - 1e-12, s"pair $p") }
  }

  test("dupSpan: counts corpus-duplicated window positions per doc") {
    val d = Seq(
      (0L, "a b c d e f", "en"),  // 3 windows; shares "a b c d" with doc 1
      (1L, "x a b c d y", "en"),  // 3 windows; one duplicated
      (2L, "p q r s t u", "en"),  // 3 windows, none shared: ratio 0
      (3L, "m n o p2 q2", "en"),  // exact duplicate pair: every window
      (4L, "m n o p2 q2", "en"),  //   duplicated, ratio 1.0
      (5L, "one two three", "en") // 3 tokens < n=4: no windows, no row
    ).toDF("doc_id", "text", "lang")
    val r = Dedup.dupSpan(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_windows"), x.getAs[Long]("n_dup_windows"),
          x.getAs[Double]("dup_ratio")))).toMap
    assert(r == Map(
      0L -> ((3L, 1L, 1.0 / 3.0)),
      1L -> ((3L, 1L, 1.0 / 3.0)),
      2L -> ((3L, 0L, 0.0)),
      3L -> ((2L, 2L, 1.0)),
      4L -> ((2L, 2L, 1.0))))
  }

  test("dupSpanMerge: maximal spans with exact token boundaries") {
    val d = Seq(
      // D1..D6 shared with doc 1 -> windows at pos 2,3,4 merge into one
      // span covering tokens 2..7 (start 2, 6 tokens, 3 windows)
      (0L, "z1 z2 D1 D2 D3 D4 D5 D6 z3 z4", "en"),
      (1L, "D1 D2 D3 D4 D5 D6", "en"), // all 3 windows duplicated
      // the same 4-gram at BOTH ends, unique middle -> two 1-window
      // islands, not one merged span
      (2L, "D1 D2 D3 D4 u1 u2 u3 u4 u5 D1 D2 D3 D4", "en"),
      (3L, "p q r s t u", "en"), // nothing shared: no rows
      // a gram repeated within ONE doc only is not corpus-duplicated
      // (minDocs counts DISTINCT docs) -> no rows
      (4L, "r1 r2 r3 r4 k k r1 r2 r3 r4", "en")
    ).toDF("doc_id", "text", "lang")
    val r = Dedup.dupSpanMerge(d).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("tok_start"),
        x.getAs[Long]("n_span_tok"), x.getAs[Long]("n_windows"))).toSet
    assert(r == Set(
      (0L, 2L, 6L, 3L),
      (1L, 0L, 6L, 3L),
      (2L, 0L, 4L, 1L),
      (2L, 9L, 4L, 1L)))
  }

  test("dupSpanMerge: span window counts sum to dupSpan's per-doc totals") {
    val spans = Dedup.dupSpanMerge(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("n_windows")).sum }
    val perDoc = Dedup.dupSpan(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_dup_windows"))
      .filter(_._2 > 0).toMap
    assert(spans.nonEmpty)
    assert(spans == perDoc)
  }

  test("cutSpans: first copy kept verbatim, later copies cut, boundaries conservative") {
    val d = Seq(
      (0L, "z1 z2 D1 D2 D3 D4 D5 D6 z3 z4", "en"), // owns every dup gram
      (1L, "D1 D2 D3 D4 D5 D6", "en"),  // verbatim later copy: fully cut
      (2L, "D1 D2 D3 D4 u1 u2 u3 u4 u5", "en"), // only window 0 marked:
      // token 0 is covered by no unmarked window -> cut; D2..D4 are
      // shared with unmarked windows -> kept (conservative boundary)
      (3L, "p q r s t u", "en"),        // nothing duplicated: unchanged
      (4L, "x y", "en")                 // < n tokens: unchanged
    ).toDF("doc_id", "text", "lang")
    val r = Dedup.cutSpans(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("text_clean"), x.getAs[Long]("n_tok"),
          x.getAs[Long]("n_cut_tok")))).toMap
    assert(r == Map(
      0L -> (("z1 z2 D1 D2 D3 D4 D5 D6 z3 z4", 10L, 0L)),
      1L -> (("", 6L, 6L)),
      2L -> (("D2 D3 D4 u1 u2 u3 u4 u5", 9L, 1L)),
      3L -> (("p q r s t u", 6L, 0L)),
      4L -> (("x y", 2L, 0L))), s"got $r")
  }

  test("cutSpans: cut token counts reconcile with the corpus (no token invented)") {
    val r = Dedup.cutSpans(docs).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val clean = x.getAs[String]("text_clean")
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept + x.getAs[Long]("n_cut_tok") == x.getAs[Long]("n_tok"),
        s"doc ${x.getAs[Long]("doc_id")}")
    }
  }

  test("dupSpanMerge: hashed-gram scale path matches the exact-string path") {
    def res(hash: Boolean) = Dedup.dupSpanMerge(docs, hashGrams = hash)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("tok_start"),
        x.getAs[Long]("n_span_tok"), x.getAs[Long]("n_windows"))).toSet
    val exact = res(hash = false)
    assert(exact.nonEmpty)
    assert(res(hash = true) == exact)
  }

  test("dupSpan: hashed-gram scale path matches the exact-string path") {
    def res(hash: Boolean) = Dedup.dupSpan(docs, hashGrams = hash)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_windows"), x.getAs[Long]("n_dup_windows"))))
      .toMap
    val exact = res(hash = false)
    assert(exact.nonEmpty)
    assert(res(hash = true) == exact)
  }

  test("jaccardPairs survives docs shorter than the shingle length") {
    val d = Seq(
      (0L, "one two", "en"), // < 3 tokens: no shingles, must not throw
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "alpha beta gamma delta zeta", "en")
    ).toDF("doc_id", "text", "lang")
    val r = Dedup.jaccardPairs(d, bound = 10, threshold = 0.1, shingleLen = 3)
      .collect()
    assert(r.forall(x => x.getAs[Long]("a_id") != 0L))
  }

  test("jaccard pairs: exact value on crafted overlap") {
    val d = Seq(
      (0L, "alpha beta gamma delta", "en"),
      (1L, "alpha beta gamma epsilon", "en"),
      (2L, "zeta eta theta iota", "en")
    ).toDF("doc_id", "text", "lang")
    val r = Dedup.jaccardPairs(d, bound = 10, threshold = 0.5).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("a_id") == 0L && r.head.getAs[Long]("b_id") == 1L)
    assert(r.head.getAs[Double]("jaccard") == 3.0 / 5.0)
  }

  test("sourceOverlap: counts distinct shared n-grams per source pair") {
    val d = Seq(
      (0L, "alpha beta gamma delta tail", "crawl"),
      // shares "alpha beta gamma delta" AND "beta gamma delta tail"
      (1L, "x alpha beta gamma delta tail", "mirror"),
      // the same two grams AGAIN within mirror: distinct counts once
      (2L, "y alpha beta gamma delta tail", "mirror"),
      // shares only "alpha beta gamma delta" (tail diverges)
      (3L, "alpha beta gamma delta other", "wiki"),
      (4L, "completely different words here now", "crawl")
    ).toDF("doc_id", "text", "source")
    val r = Dedup.sourceOverlap(d).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
        x.getAs[Long]("n_shared")).toMap
    assert(r == Map(
      ("crawl", "mirror") -> 2L,
      ("crawl", "wiki") -> 1L,
      ("mirror", "wiki") -> 1L))
  }

  test("winnowGroups: overlap chains collapse transitively; matches a union-find model") {
    // A shares run1 with B, B shares run2 with C, A and C share
    // nothing directly — the chain must still be ONE group
    val run1 = (1 to 20).map(i => s"p$i").mkString(" ")
    val run2 = (1 to 20).map(i => s"q$i").mkString(" ")
    val chain = Seq(
      (0L, s"a b c d $run1 e f g"),
      (1L, s"$run1 h i j k $run2"),
      (2L, s"l m n o $run2 r s t"),
      (3L, "totally unrelated words about nothing shared with others here")
    ).toDF("doc_id", "text")
    val g = graft.operators.Dedup.winnowGroups(chain).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
    assert(g == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L), s"got $g")
    // gate corpus: labels must equal a local union-find over the
    // operator's own pair view (shared edge definition, so this pins
    // the component engine, not the pairs)
    val corpus = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val pairs = graft.operators.TextOps.winnowPairs(corpus).collect()
      .map(r => r.getAs[Long]("doc_a") -> r.getAs[Long]("doc_b"))
    val ids = corpus.collect().map(_.getAs[Long]("doc_id"))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = graft.operators.Dedup.winnowGroups(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
    assert(got == expected)
  }

  test("simhashGroups: rep-reduced components equal a local union-find over the per-doc pairs") {
    val corpus = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.simhashPairs(corpus).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val ids = corpus.select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    // canonical label = min id in component (two find passes: unions
    // above may leave stale roots on the first)
    ids.foreach(find)
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Dedup.simhashGroups(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
    assert(got == expected)
  }

  test("simhashGroups: identical texts share a group even with zero band edges") {
    val d = Seq(
      (7L, "alpha beta gamma delta epsilon zeta"),
      (9L, "alpha beta gamma delta epsilon zeta"), // exact clone of 7
      (11L, "utterly disjoint vocabulary everywhere")
    ).toDF("doc_id", "text")
    val g = Dedup.simhashGroups(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
    assert(g(7L) == 7L && g(9L) == 7L, "clones collapse to the min id rep")
    assert(g(11L) == 11L)
  }

  test("gramNovelty: canonical copy owns its grams, clones score zero, partial overlap fractional") {
    val d = Seq(
      (0L, "a b c d e f"),      // grams: "a b c d","b c d e","c d e f" — all first here
      (1L, "a b c d e f"),      // exact clone: every gram first in doc 0
      (2L, "x y z a b c d w"),  // 5 grams, one ("a b c d") first in doc 0
      (3L, "p q r")             // < 4 tokens: no gram row
    ).toDF("doc_id", "text")
    val r = Dedup.gramNovelty(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_novel"),
          x.getAs[Double]("novel_frac")))).toMap
    assert(r.keySet == Set(0L, 1L, 2L))
    assert(r(0L) == ((3L, 3L, 1.0)))
    assert(r(1L) == ((3L, 0L, 0.0)))
    assert(r(2L) == ((5L, 4L, 0.8)))
  }

  test("minhashEstError: estimates/truth consistent with the verified ops; " +
      "errors inside the binomial bound on the real corpus") {
    val corpus = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    def byPair(df: org.apache.spark.sql.DataFrame, c: String) =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double](c)).toMap
    val audit = Dedup.minhashEstError(corpus).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Double]("est_jaccard"), r.getAs[Double]("true_jaccard"),
          r.getAs[Double]("abs_err"))).toMap
    assert(audit.nonEmpty)
    // cross-operator consistency: at threshold 0 the verified ops emit
    // the same candidate set with the same numbers
    val est = byPair(Dedup.minhashVerifiedPairs(corpus, threshold = 0.0),
      "est_jaccard")
    val truth = byPair(
      Dedup.minhashExactVerifiedPairs(corpus, threshold = 0.0), "jaccard")
    assert(audit.keySet == est.keySet && audit.keySet == truth.keySet)
    audit.foreach { case (p, (e, t, err)) =>
      assert(e == est(p) && t == truth(p), s"drift at $p")
      assert(math.abs(err - math.abs(e - t)) < 1e-12)
    }
    // binomial estimator: σ ≤ 0.5/√64 = 0.0625 per pair; the MEAN
    // absolute error over the candidate set sits well inside 2σ, and
    // no pair strays past 6σ (both deterministic on this fixed corpus)
    val errs = audit.values.map(_._3)
    assert(errs.sum / errs.size <= 0.125,
      s"mean |est-true| = ${errs.sum / errs.size}")
    assert(errs.max <= 0.375, s"max |est-true| = ${errs.max}")
  }

  test("sourceOverlapHll: every pair estimated within the sketch error bound of exact") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.{shingleFromStruct, shingleStructs, tokenize}
    val corpus = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = Dedup.sourceOverlap(corpus).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
        x.getAs[Long]("n_shared")).toMap
    // exact per-source distinct-gram cardinalities, for the bound: the
    // inclusion-exclusion error scales with the SET sizes, not the
    // overlap (operator scaladoc)
    val card = corpus
      .withColumn("toks", tokenize(col("text")))
      .where(size(col("toks")) >= 4)
      .select(col("source"), explode(shingleStructs(col("toks"), 4)).as("z"))
      .select(col("source"), shingleFromStruct(col("z"), 4).as("gram"))
      .groupBy("source").agg(countDistinct(col("gram")).as("c"))
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Long]("c")).toMap
    val est = Dedup.sourceOverlapHll(corpus).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
        x.getAs[Long]("n_shared_est"))
    val nSources = card.size.toLong
    assert(est.length == nSources * (nSources - 1) / 2,
      "one row per unordered source pair")
    est.foreach { case ((a, b), e) =>
      val ex = exact.getOrElse((a, b), 0L)
      val bound = math.max(5.0, 0.02 * (card(a) + card(b)))
      assert(math.abs(e - ex) <= bound,
        s"($a,$b): est $e vs exact $ex exceeds ±$bound")
    }
  }

  test("dedupSweep: monotone non-increasing curve, one row per " +
      "threshold incl. zero tails, counts agree with jaccardPairs") {
    val rows = Dedup.dedupSweep(docs).collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(0.5, 0.6, 0.7, 0.8, 0.9, 0.95),
      s"one row per threshold, zero tails kept: $rows")
    rows.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3,
        s"curve must be non-increasing in threshold: $lo -> $hi")
    }
    rows.foreach { case (t, np, nd) =>
      assert(nd <= 2 * np, s"at $t: $nd docs from $np pairs")
      assert(np == 0L || nd >= 2, s"at $t: a pair needs two docs")
    }
    // cross-check one point against the pair operator itself
    val at08 = Dedup.jaccardPairs(docs, bound = 300, threshold = 0.8,
      shingleLen = 1).collect()
    val ids = at08.flatMap(r =>
      Seq(r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).distinct
    val row08 = rows.find(_._1 == 0.8).get
    assert(row08._2 == at08.length && row08._3 == ids.length,
      s"sweep row at 0.8 $row08 vs jaccardPairs ${at08.length}/${ids.length}")
  }

  test("dedupSweep on an empty corpus: the full zero curve, not an " +
      "empty frame (a report always has its rows)") {
    val none = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "lang")
    val r = Dedup.dedupSweep(none).collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).sortBy(_._1).toSeq
    assert(r.map(_._1) == Seq(0.5, 0.6, 0.7, 0.8, 0.9, 0.95))
    assert(r.forall(t => t._2 == 0L && t._3 == 0L), r.toString)
  }

  test("sweepFromPairs: measure-agnostic door with a crafted frame") {
    val pairs = Seq((1L, 2L, 0.96), (1L, 3L, 0.75), (4L, 5L, 0.55))
      .toDF("a_id", "b_id", "score")
    val r = Dedup.sweepFromPairs(pairs, "score").collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).sortBy(_._1).toSeq
    assert(r == Seq((0.5, 3L, 5L), (0.6, 2L, 3L), (0.7, 2L, 3L),
      (0.8, 1L, 2L), (0.9, 1L, 2L), (0.95, 1L, 2L)), r.toString)
  }

  test("sweepFromPairs tunes a winnow-overlap frame — the " +
      "measure-agnostic contract on a real second measure") {
    val wp = graft.operators.TextOps.winnowPairs(docs)
      .selectExpr("doc_a AS a_id", "doc_b AS b_id",
        "CAST(n_shared AS DOUBLE) AS n_shared")
    val raw = wp.collect().map(r => (r.getAs[Long]("a_id"),
      r.getAs[Long]("b_id"), r.getAs[Double]("n_shared")))
    assert(raw.nonEmpty, "the near-dup fixture must share fingerprints")
    val swept = Dedup.sweepFromPairs(wp, "n_shared", Seq(1.0, 2.0, 16.0))
      .collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).sortBy(_._1).toSeq
    swept.foreach { case (t, np, nd) =>
      val hit = raw.filter(_._3 >= t)
      assert(np == hit.length, s"at $t: $np vs ${hit.length}")
      assert(nd == hit.flatMap(p => Seq(p._1, p._2)).distinct.length,
        s"at $t: doc count $nd")
    }
  }
}
