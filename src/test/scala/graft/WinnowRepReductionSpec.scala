package graft

import scala.util.Random

import graft.operators.{Dedup, TextOps}

/** The r9 exact-dedup-first reduction in the winnow chain must be
  * invisible: winnowPairs/winnowGroups with `repReduce = true` (the
  * default) must equal the direct raw-document path bit-for-bit —
  * including the places where a careless reduction would diverge:
  *
  *  - fpCap counts DOCUMENTS, so a fingerprint pushed over the cap
  *    only by verbatim clones must still be excluded;
  *  - within-star pairs carry n_shared = the text's capped fp count,
  *    and a star whose text has fewer than minShared capped fps must
  *    NOT pair (or group) its own clones;
  *  - group_id stays the smallest doc_id in the raw component even
  *    when ids interleave across stars.
  */
class WinnowRepReductionSpec extends SparkSuite {
  import spark.implicits._

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon")

  /** Dup-heavy random corpus: a few base texts with shared runs, each
    * cloned a random number of times, doc ids shuffled so stars
    * interleave.
    */
  private def corpus(seed: Int, nBase: Int, maxClones: Int) = {
    val rnd = new Random(seed)
    val shared = Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")
    val texts = (0 until nBase).map { i =>
      val own = Seq.fill(6 + rnd.nextInt(10))(
        words(rnd.nextInt(words.size)) + "x" + i).mkString(" ")
      if (rnd.nextBoolean()) s"$own $shared" else own
    }
    val cloned = texts.flatMap { t =>
      Seq.fill(1 + rnd.nextInt(maxClones))(t)
    }
    rnd.shuffle(cloned).zipWithIndex
      .map { case (t, id) => (id.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("n_shared"))).toSet

  private def groupMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap

  test("winnowPairs: rep-reduced equals direct on random dup-heavy corpora") {
    for (seed <- 1 to 5) {
      val d = corpus(seed, nBase = 8, maxClones = 5).cache()
      val fast = pairSet(TextOps.winnowPairs(d))
      val slow = pairSet(TextOps.winnowPairs(d, repReduce = false))
      assert(fast == slow,
        s"seed=$seed: rep-reduced pairs diverge; only-fast=${fast -- slow} " +
          s"only-slow=${slow -- fast}")
      d.unpersist()
    }
  }

  test("winnowGroups: rep-reduced equals direct on random dup-heavy corpora") {
    for (seed <- 6 to 10) {
      val d = corpus(seed, nBase = 8, maxClones = 5).cache()
      val fast = groupMap(Dedup.winnowGroups(d))
      val slow = groupMap(Dedup.winnowGroups(d, repReduce = false))
      assert(fast == slow, s"seed=$seed: rep-reduced groups diverge")
      d.unpersist()
    }
  }

  test("fpCap counts documents: clones alone push a fingerprint over the cap") {
    // one 12-token text cloned 4x: its fps appear in 4 DOCS / 1 rep.
    // fpCap=3 must exclude them (no pairs at all); fpCap=4 must keep
    // them (all 6 clone pairs). A rep-count cap would get the first
    // case wrong.
    val t = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = (0L to 3L).map(id => (id, t)).toDF("doc_id", "text")
    assert(pairSet(TextOps.winnowPairs(d, fpCap = 3)).isEmpty,
      "clone-saturated fingerprints must stay excluded under the doc cap")
    val kept = pairSet(TextOps.winnowPairs(d, fpCap = 4))
    assert(kept.map(p => (p._1, p._2)) ==
      (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)).toSet,
      s"under the cap every clone pair surfaces, got $kept")
    // and the direct path agrees on both settings
    assert(pairSet(TextOps.winnowPairs(d, fpCap = 3, repReduce = false)).isEmpty)
    assert(pairSet(TextOps.winnowPairs(d, fpCap = 4, repReduce = false)) == kept)
  }

  test("a star below the within-bond leaves its clones as singletons") {
    // 4 tokens = exactly one 4-gram = one fingerprint: n_self = 1 <
    // minShared = 2, no cross overlaps -> clones must NOT pair or
    // group together (the raw graph has no qualifying edge).
    val d = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "a b c d"),
      (3L, "p q r s t u v w x y z aa bb cc")
    ).toDF("doc_id", "text")
    assert(pairSet(TextOps.winnowPairs(d)).isEmpty,
      "one shared fingerprint < minShared must not pair clones")
    val g = groupMap(Dedup.winnowGroups(d))
    assert(g == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"sub-bond clones must stay singletons, got $g")
    assert(groupMap(Dedup.winnowGroups(d, repReduce = false)) == g)
  }

  test("winnowAgainst: round-trip equals the joint run's " +
      "at-least-one-new-side subset on random dup-heavy corpora") {
    import org.apache.spark.sql.functions.col
    for (seed <- 11 to 13) {
      val d = corpus(seed, nBase = 8, maxClones = 5).cache()
      val cut = d.agg(org.apache.spark.sql.functions
        .floor(org.apache.spark.sql.functions.max(col("doc_id")) / 2.0))
        .collect()(0).getLong(0)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-winnowidx").toString
      TextOps.writeWinnowIndex(d.where(col("doc_id") < cut), dir)
      val inc = pairSet(TextOps.winnowAgainst(spark, dir,
        d.where(col("doc_id") >= cut)))
      val joint = pairSet(TextOps.winnowPairs(d))
        .filter { case (a, b, _) => a >= cut || b >= cut }
      assert(inc == joint,
        s"seed $seed: missing=${joint -- inc} extra=${inc -- joint}")
      // never indexed-vs-indexed
      assert(!inc.exists { case (a, b, _) => a < cut && b < cut })
      d.unpersist()
    }
  }

  test("winnowAgainst: fpCap counts over the UNION — a fingerprint " +
      "saturated only by the join of both snapshots is excluded") {
    import org.apache.spark.sql.functions.col
    // three old + one new doc all share one passage; fpCap = 3 admits
    // the old trio alone but the union of four crosses the cap
    val run = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, s"a0 b0 c0 d0 e0 $run"), (1L, s"a1 b1 c1 d1 e1 $run"),
      (2L, s"a2 b2 c2 d2 e2 $run"), (10L, s"a9 b9 c9 d9 e9 $run")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-winnowidx-cap").toString
    TextOps.writeWinnowIndex(d.where(col("doc_id") < 10), dir)
    val inc = pairSet(TextOps.winnowAgainst(spark, dir,
      d.where(col("doc_id") >= 10), fpCap = 3))
    val joint = pairSet(TextOps.winnowPairs(d, fpCap = 3))
      .filter { case (a, b, _) => a >= 10 || b >= 10 }
    assert(inc == joint, s"missing=${joint -- inc} extra=${inc -- joint}")
    // the shared-run fingerprints sit in 4 > 3 docs on the union:
    // the new doc must NOT pair into the old trio through them
    assert(inc.isEmpty, s"union-saturated fps must be excluded: $inc")
    // ...while the prior epoch (old trio alone, 3 <= 3) did pair
    val withinOld = pairSet(TextOps.winnowPairs(
      d.where(col("doc_id") < 10), fpCap = 3))
    assert(withinOld.nonEmpty)
  }

  test("clone stars bridged by a shared passage collapse to one group") {
    // two distinct texts sharing a long run, each cloned; ids
    // interleaved so the star minimum is not the corpus minimum
    val run = (1 to 20).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (5L, s"a b c d e $run x y z"), (0L, s"p q r $run m n o"),
      (3L, s"a b c d e $run x y z"), (1L, s"p q r $run m n o"),
      (2L, "totally unrelated words here about nothing shared at all ok")
    ).toDF("doc_id", "text")
    val g = groupMap(Dedup.winnowGroups(d))
    assert(g == Map(0L -> 0L, 1L -> 0L, 3L -> 0L, 5L -> 0L, 2L -> 2L),
      s"bridged clone stars must share the smallest raw doc_id, got $g")
    assert(groupMap(Dedup.winnowGroups(d, repReduce = false)) == g)
  }
}
