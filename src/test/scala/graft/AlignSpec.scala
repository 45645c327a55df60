package graft

import graft.operators.TextOps

/** Gale-Church alignment ([[TextOps.galeChurchAlign]]): the DP against
  * an exhaustive-search reference built on the SAME cost model, known
  * merge/deletion/insertion plants, the tiling invariant (beads
  * partition both sequences exactly, in order), and the DataFrame leg
  * over a planted two-doc fixture.
  */
class AlignSpec extends SparkSuite {
  import spark.implicits._

  // exhaustive minimum alignment cost over the same moves/costs — the
  // independent reference the DP must match
  private def bruteCost(a: Seq[Long], b: Seq[Long]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else TextOps.gcMoves.collect {
      case (da, db, pen) if a.length >= da && b.length >= db =>
        pen + TextOps.gcMatchCost(a.take(da).sum, b.take(db).sum) +
          bruteCost(a.drop(da), b.drop(db))
    }.min

  private def beads(a: Seq[Long], b: Seq[Long]) =
    TextOps.galeChurchBeads(a.toArray, b.toArray)

  test("galeChurchBeads: equal-length documents align as all 1-1 " +
      "beads; beads tile both sides exactly and in order") {
    val a = Seq(100L, 80L, 120L, 60L)
    val out = beads(a, a)
    assert(out.forall(_._5 == "1-1"), s"got $out")
    assert(out.length == 4)
    var ea = 0L; var eb = 0L
    out.foreach { case (af, na, bf, nb, _, _) =>
      assert(af == ea && bf == eb, s"non-contiguous at $af/$bf")
      ea += na; eb += nb
    }
    assert(ea == 4L && eb == 4L)
  }

  test("galeChurchBeads: a merged pair yields a 2-1 bead, a deleted " +
      "neighbor ABSORBS as 2-1 (the published constants make a lone " +
      "mid-doc 1-0 dearer than absorption), bare insert/delete with " +
      "no absorbing neighbor yield 0-1/1-0") {
    // B merges A's first two sentences (100+80 ≈ 185)
    val merge = beads(Seq(100L, 80L, 120L), Seq(185L, 118L))
    assert(merge.head._5 == "2-1" && merge.last._5 == "1-1", s"$merge")
    // B drops A's middle sentence: absorbed into a 2-1, never a 1-0 —
    // 450 + an outlier length cost always loses to 230 + a mild one
    val del = beads(Seq(100L, 80L, 120L), Seq(98L, 121L))
    assert(del.map(_._5) == Seq("1-1", "2-1"), s"$del")
    assert(del.map(_._2).sum == 3 && del.map(_._4).sum == 2)
    // no neighbor to absorb: the bare beads appear
    assert(beads(Seq(100L), Seq.empty).map(_._5) == Seq("1-0"))
    assert(beads(Seq.empty, Seq(77L)).map(_._5) == Seq("0-1"))
  }

  test("galeChurchBeads: DP total cost equals the exhaustive-search " +
      "minimum on randomized small inputs, and beads always tile") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
      val a = Seq.fill(1 + rnd.nextInt(5))(20L + rnd.nextInt(180).toLong)
      val b = Seq.fill(1 + rnd.nextInt(5))(20L + rnd.nextInt(180).toLong)
      val out = beads(a, b)
      val total = out.map(_._6).sum.toDouble
      val ref = bruteCost(a, b)
      // bead costs are rounded per step; allow half-a-centinat each
      assert(math.abs(total - ref) <= 0.5 * out.length + 1e-6,
        s"a=$a b=$b: dp=$total brute=$ref beads=$out")
      assert(out.map(_._2).sum == a.length && out.map(_._4).sum == b.length)
    }
  }

  test("galeChurchAlign: the DataFrame leg aligns a planted two-doc " +
      "corpus — doc 1 all 1-1 under length noise, doc 2 carries the " +
      "deletion bead") {
    val sa = Seq(
      (1L, 0L, "The first sentence here."),
      (1L, 1L, "A second one follows it."),
      (2L, 0L, "Opening line of doc two."),
      (2L, 1L, "Middle line that B will drop entirely."),
      (2L, 2L, "Closing line of doc two."))
      .toDF("doc_id", "sent_id", "sentence")
    val sb = Seq(
      (1L, 0L, "The first sentence here, ok."),
      (1L, 1L, "A second one follows it, ok."),
      (2L, 0L, "Opening line of doc two!"),
      (2L, 1L, "Closing line of doc two?"))
      .toDF("doc_id", "sent_id", "sentence")
    val got = TextOps.galeChurchAlign(sa, sb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._6).toSeq == Seq("1-1", "1-1"), s"${d1.toSeq}")
    // the dropped middle sentence is absorbed: beads tile 3 A- and
    // 2 B-sentences with exactly one absorption bead (n_a > n_b)
    val d2 = got.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(_._3).sum == 3L && d2.map(_._5).sum == 2L, s"${d2.toSeq}")
    assert(d2.count(x => x._3 > x._5) == 1, s"${d2.toSeq}")
  }
}
