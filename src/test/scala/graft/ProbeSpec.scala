package graft

import java.nio.file.Files

import graft.operators.Curation
import graft.sources.Tables

/** The quality-probe serve family: persisted classifier artifacts
  * (writeProbeIndex / probeScoreFrom), the accuracy audit (probeEval)
  * and the calibration audit (probeCalibration).
  */
class ProbeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def scoreTriples(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_target"),
        r.getAs[Double]("score"))).sortBy(_._1)

  test("writeProbeIndex/probeScoreFrom: served scores equal the " +
      "self-trained probeScore bit-for-bit (round-trip)") {
    val dir = Files.createTempDirectory("graft-probeidx").toString
    Curation.writeProbeIndex(docs, dir)
    val served = scoreTriples(Curation.probeScoreFrom(spark, dir, docs))
    val self = scoreTriples(Curation.probeScore(docs))
    assert(served.nonEmpty && served.sameElements(self),
      "frozen-artifact serving must reproduce the in-memory model exactly")
  }

  test("probeScoreFrom: two snapshots served against ONE index share " +
      "the model — a doc present in both scores identically") {
    val dir = Files.createTempDirectory("graft-probeidx2").toString
    Curation.writeProbeIndex(docs, dir)
    val snapA = docs.where("doc_id < 300")
    val snapB = docs.where("doc_id >= 200")
    val a = scoreTriples(Curation.probeScoreFrom(spark, dir, snapA))
      .filter(t => t._1 >= 200 && t._1 < 300)
    val b = scoreTriples(Curation.probeScoreFrom(spark, dir, snapB))
      .filter(t => t._1 >= 200 && t._1 < 300)
    assert(a.nonEmpty && a.sameElements(b),
      "the frozen model must put both snapshots on one scale")
  }

  test("readProbeArtifacts: a weight frame disagreeing with meta's " +
      "dim fails loudly (partial-write guard)") {
    val dir = Files.createTempDirectory("graft-probebad").toString
    Curation.writeProbeIndex(docs, dir)
    Seq((0, 0.1), (1, -0.2), (2, 0.3)).toDF("feature", "weight")
      .write.mode("overwrite").parquet(s"$dir/weights")
    val e = intercept[IllegalArgumentException] {
      Curation.probeScoreFrom(spark, dir, docs)
    }
    assert(e.getMessage.contains("partial write"), e.getMessage)
  }

  test("probeEval: hand-computed confusion counts and tie-averaged " +
      "rank AUC") {
    // ascending: 0.1(+) 0.2(-) 0.4(-) 0.7(+) 0.9(+,-) tie across
    // classes at 0.9 -> avg ranks (5.5, 5.5); AUC = 4.5/9 = 0.5
    val scored = Seq(
      (1L, true, 0.9), (2L, false, 0.9), (3L, true, 0.7),
      (4L, false, 0.4), (5L, false, 0.2), (6L, true, 0.1))
      .toDF("doc_id", "is_target", "score")
    val r = Curation.probeEval(scored, threshold = 0.5).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_pos") == 3 && row.getAs[Long]("n_neg") == 3)
    assert(row.getAs[Long]("tp") == 2 && row.getAs[Long]("fp") == 1)
    assert(row.getAs[Long]("fn") == 1 && row.getAs[Long]("tn") == 2)
    assert(row.getAs[Long]("precision_ppm") == 666666L)
    assert(row.getAs[Long]("recall_ppm") == 666666L)
    // F1 = 2tp / (2tp + fp + fn) = 4/6
    assert(row.getAs[Long]("f1_ppm") == 666666L)
    assert(row.getAs[Double]("auc") == 0.5)
  }

  test("probeEval: perfect ranking gives AUC 1.0, inverted gives 0.0") {
    val perfect = Seq((1L, true, 0.9), (2L, true, 0.8),
      (3L, false, 0.2), (4L, false, 0.1))
      .toDF("doc_id", "is_target", "score")
    assert(Curation.probeEval(perfect).collect()(0)
      .getAs[Double]("auc") == 1.0)
    val inverted = Seq((1L, false, 0.9), (2L, false, 0.8),
      (3L, true, 0.2), (4L, true, 0.1))
      .toDF("doc_id", "is_target", "score")
    assert(Curation.probeEval(inverted).collect()(0)
      .getAs[Double]("auc") == 0.0)
  }

  test("probeEval: degenerate frames stay defined — one-class input " +
      "yields NULL auc/recall, an empty positive prediction set " +
      "yields NULL precision") {
    val oneClass = Seq((1L, false, 0.9), (2L, false, 0.1))
      .toDF("doc_id", "is_target", "score")
    val r = Curation.probeEval(oneClass).collect()(0)
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.isNullAt(r.fieldIndex("recall_ppm")))
    val noPosPred = Seq((1L, true, 0.2), (2L, false, 0.1))
      .toDF("doc_id", "is_target", "score")
    val r2 = Curation.probeEval(noPosPred).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("precision_ppm")))
    assert(r2.getAs[Long]("tp") == 0)
  }

  test("probeCalibration: buckets partition the frame, top edge " +
      "clamps, rates and means are exact ppm") {
    val scored = Seq(
      (1L, true, 0.95), (2L, false, 0.85), (3L, true, 0.85),
      (4L, false, 0.05))
      .toDF("doc_id", "is_target", "score")
    val r = Curation.probeCalibration(scored).collect()
      .map(x => x.getAs[Int]("bucket") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("n_pos"),
          x.getAs[Long]("mean_score_ppm"), x.getAs[Long]("pos_rate_ppm"))))
      .toMap
    assert(r == Map(
      9 -> ((1L, 1L, 950000L, 1000000L)),
      8 -> ((2L, 1L, 850000L, 500000L)),
      0 -> ((1L, 0L, 50000L, 0L))), s"got $r")
    assert(r.values.map(_._1).sum == 4L)
    // the clamped score ceiling (1 - 1e-6) lands in the LAST bucket
    val top = Curation.probeCalibration(
      Seq((1L, true, 1.0 - 1e-6)).toDF("doc_id", "is_target", "score"))
      .collect()(0)
    assert(top.getAs[Int]("bucket") == 9)
  }

  test("probeEval AUC equals a brute-force pairwise reference over " +
      "randomized scored frames (ties included)") {
    val rnd = new scala.util.Random(20260815)
    (0 until 8).foreach { trial =>
      val n = 5 + rnd.nextInt(40)
      // coarse score grid forces ties across and within classes
      val rows = (0 until n).map { i =>
        (i.toLong, rnd.nextBoolean(),
          math.round(rnd.nextDouble() * 8) / 8.0)
      }
      val nPos = rows.count(_._2)
      val auc = Curation.probeEval(rows.toDF("doc_id", "is_target", "score"))
        .collect()(0).getAs[java.lang.Double]("auc")
      if (nPos == 0 || nPos == n) assert(auc == null, s"trial $trial")
      else {
        // Mann-Whitney by enumeration: wins + half-ties over pos×neg
        var num = 0.0
        for ((_, ta, sa) <- rows if ta; (_, tb, sb) <- rows if !tb)
          num += (if (sa > sb) 1.0 else if (sa == sb) 0.5 else 0.0)
        val want = num / (nPos.toDouble * (n - nPos))
        assert(math.abs(auc - want) < 1e-12,
          s"trial $trial: auc $auc != brute-force $want over $rows")
      }
    }
  }

  test("probeEval over the served registry frame: counts reconcile " +
      "with the scored frame itself") {
    val dir = Files.createTempDirectory("graft-probeeval").toString
    Curation.writeProbeIndex(docs, dir)
    val scored = Curation.probeScoreFrom(spark, dir, docs)
    val r = Curation.probeEval(scored).collect()(0)
    val rows = scored.collect()
    assert(r.getAs[Long]("n_pos") == rows.count(_.getAs[Boolean]("is_target")))
    assert(r.getAs[Long]("n_neg") == rows.count(!_.getAs[Boolean]("is_target")))
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == r.getAs[Long]("n_pos"))
    assert(r.getAs[Long]("fp") + r.getAs[Long]("tn") == r.getAs[Long]("n_neg"))
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
