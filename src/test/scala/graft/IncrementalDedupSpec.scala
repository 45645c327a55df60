package graft

import graft.operators.Dedup

/** Cross-snapshot incremental dedup (r9): snapshot A is indexed once
  * (writeBandIndex), snapshot B dedups against the stored index
  * (dedupAgainst) without recomputing A's sketches — and the result,
  * unioned with A's own candidate set, must equal the joint-corpus
  * run bit-for-bit, including under a tight bucketCap whose counts
  * only trip on the UNION.
  */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private def base(i: Int) =
    s"snapshot text number $i with a long shared run of tokens " +
      s"alpha beta gamma delta epsilon zeta eta theta iota kappa v$i"

  // snapshot A: ids 0-5, two near-dup families
  private lazy val snapA = Seq(
    (0L, base(0)), (1L, base(0) + " tail"), (2L, base(1)),
    (3L, "totally unrelated content about distributed query planning engines"),
    (4L, base(2)), (5L, base(2) + " coda")
  ).toDF("doc_id", "text")

  // snapshot B: ids 100+, near-dups of A docs, an internal dup pair,
  // and a fresh unique doc
  private lazy val snapB = Seq(
    (100L, base(0) + " extra"), // near-dup of A's 0/1 family
    (101L, base(3)), (102L, base(3) + " tail"), // internal near-dup pair
    (103L, "completely fresh material sharing nothing with any snapshot at all")
  ).toDF("doc_id", "text")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet

  private def roundTrip(bucketCap: Int): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandindex")
      .toString
    Dedup.writeBandIndex(snapA, dir)
    val inc = pairSet(Dedup.dedupAgainst(spark, dir, snapB,
      bucketCap = bucketCap))
    val withinA = pairSet(Dedup.minhashCandidates(snapA,
      bucketCap = bucketCap))
    val joint = pairSet(Dedup.minhashCandidates(
      snapA.unionByName(snapB), bucketCap = bucketCap))
    assert((inc & withinA).isEmpty,
      s"indexed-vs-indexed pairs must not be recomputed: ${inc & withinA}")
    // the EXACT contract: dedupAgainst == the joint run's
    // at-least-one-new-side subset, bit-for-bit
    val jointNew = joint.filter { case (a, b) => a >= 100L || b >= 100L }
    assert(inc == jointNew,
      s"incremental must equal the joint run's new-involving subset; " +
        s"missing=${jointNew -- inc} extra=${inc -- jointNew}")
    assert((inc | withinA) == joint,
      s"on this corpus (no cap trips on the union alone) the union " +
        s"equality also holds; missing=${joint -- (inc | withinA)} " +
        s"extra=${(inc | withinA) -- joint}")
    assert(inc.exists { case (a, b) => a < 100L && b >= 100L },
      s"cross-snapshot near-dups must surface, got $inc")
    assert(inc.contains((101L, 102L)),
      s"within-new near-dups must surface, got $inc")
    assert(!inc.exists { case (a, b) => a == 103L || b == 103L },
      s"the fresh unique doc pairs with nothing, got $inc")
  }

  test("round trip: index A, dedup B against it, equals the joint-corpus run") {
    roundTrip(bucketCap = 10000)
  }

  test("bucketCap counts over the union frame, exactly like the joint run") {
    // cap = 2: the 0/1/100 family saturates only when B joins the
    // bucket — the incremental run must see union counts, not
    // stored-only counts
    roundTrip(bucketCap = 2)
  }

  test("old-old pairs are NOT retracted when the union alone trips the cap (documented asymmetry)") {
    // snapA: two identical docs -> every bucket holds 2 <= cap, so the
    // prior run emitted (0,1). snapB adds a third identical doc: every
    // bucket now holds 3 > cap, so the joint rerun emits NOTHING — but
    // the incremental model keeps each epoch's pairs as-of its epoch.
    val text = "the same exact document text repeated across snapshots " +
      "with enough tokens for shingling to engage"
    val a = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
    val b = Seq((100L, text)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bandindex")
      .toString
    Dedup.writeBandIndex(a, dir)
    val inc = pairSet(Dedup.dedupAgainst(spark, dir, b, bucketCap = 2))
    val withinA = pairSet(Dedup.minhashCandidates(a, bucketCap = 2))
    val joint = pairSet(Dedup.minhashCandidates(a.unionByName(b),
      bucketCap = 2))
    assert(inc.isEmpty, s"union buckets of 3 exceed cap 2: $inc")
    assert(withinA == Set((0L, 1L)), s"the prior epoch saw buckets of 2: $withinA")
    assert(joint.isEmpty, "a joint rerun drops the saturated bucket")
    // i.e. (inc | withinA) != joint here — exactly the divergence the
    // dedupAgainst scaladoc declares; the exact subset contract still
    // holds (both sides empty)
    assert(inc == joint.filter { case (x, y) => x >= 100L || y >= 100L })
  }

  test("dedupAgainst reads the stored bands, never the indexed snapshot's text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandindex")
      .toString
    Dedup.writeBandIndex(snapA, dir)
    val plan = Dedup.dedupAgainst(spark, dir, snapB)
      .queryExecution.optimizedPlan.toString
    // exactly one sketch aggregate subtree (the NEW snapshot's);
    // the stored side must be a parquet scan of the band rows
    val sketches = "minhash_sketch".r.findAllIn(plan).length
    assert(sketches == 2, // self-join: the new side appears on both sides
      s"only the new snapshot may be sketched, found $sketches sketch aggs:\n$plan")
  }

  test("noveltyAgainst: equals the joint-corpus gramNovelty restricted to the new snapshot") {
    // the append-only contract: every indexed id below every new id
    val joint = snapA.unionByName(snapB)
    val expected = Dedup.gramNovelty(joint).collect()
      .filter(_.getAs[Long]("doc_id") >= 100L)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novel_frac"))).toSet
    val got = Dedup.noveltyAgainst(Dedup.gramIndex(snapA), snapB).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novel_frac"))).toSet
    assert(got == expected, s"incremental vs joint:\n$got\n$expected")
    assert(got.nonEmpty)
    // the persisted round trip produces the same frame as the
    // in-memory index
    val dir = java.nio.file.Files.createTempDirectory("graft-gramindex").toString
    Dedup.writeGramIndex(snapA, dir)
    val viaDisk = Dedup.noveltyAgainst(spark.read.parquet(dir), snapB).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novel_frac"))).toSet
    assert(viaDisk == expected)
    // the fresh doc is fully novel; the near-dup of an indexed family
    // is mostly not
    val byId = got.map(t => t._1 -> t._4).toMap
    assert(byId(103L) == 1.0, "fresh content must score 1.0")
    assert(byId(100L) < 0.5, "a near-dup of indexed content must score low")
  }
}
