package graft

import org.apache.spark.sql.Encoders

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaFeatures, MediaRow}

class MultimodalOpsSpec extends SparkSuite {

  private lazy val media = {
    implicit val enc = Encoders.product[MediaRow]
    spark.createDataset(
      (0L until 100L).map(i =>
        MediaRow(i, s"payload-$i-${"x" * (i % 17).toInt}".getBytes("UTF-8"),
          if (i % 3 == 0) "video" else "image")))
      .repartition(4)
  }

  test("extractFeatures: typed batch decode preserves rows and is deterministic") {
    val f1 = MultimodalOps.extractFeatures(media, batchSize = 8).collect()
    val f2 = MultimodalOps.extractFeatures(media, batchSize = 32).collect()
    assert(f1.length == 100)
    // batch size must not change results — decode is per-row semantically
    assert(f1.sortBy(_.docId).map(_.feature.toSeq).toSeq ==
      f2.sortBy(_.docId).map(_.feature.toSeq).toSeq)
    assert(f1.forall(f => f.width >= 320 && f.height >= 240 && f.feature.length == 8))
    assert(f1.filter(_.nFrames > 1).forall(_.docId % 3 == 0))
  }

  test("resize: typed output carries target dims, deterministic payload") {
    val r1 = MultimodalOps.resize(media, 64, 64).collect().sortBy(_.docId)
    val r2 = MultimodalOps.resize(media, 64, 64).collect().sortBy(_.docId)
    assert(r1.length == 100)
    assert(r1.forall(m => m.width == 64 && m.height == 64 && m.payload.nonEmpty))
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
  }

  private def testImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 37 + y * 91 + 123) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("real PNG/JPEG payloads decode to their true dimensions") {
    implicit val enc = Encoders.product[MediaRow]
    val m = spark.createDataset(Seq(
      MediaRow(0L, testImage(5, 7, "png"), "image"),
      MediaRow(1L, testImage(6, 4, "jpg"), "image"),
      MediaRow(2L, "definitely not an image".getBytes("UTF-8"), "image")))
    val f = MultimodalOps.extractFeatures(m).collect().sortBy(_.docId)
    assert(f(0).width == 5 && f(0).height == 7 && f(0).nFrames == 1)
    assert(f(1).width == 6 && f(1).height == 4)
    // undecodable bytes degrade to the deterministic stub, not an error
    assert(f(2).width >= 320 && f(2).height >= 240)
    // luminance histogram is a probability distribution over 8 bins
    assert(math.abs(f(0).feature.sum - 1f) < 1e-3)
    assert(f(0).feature.forall(v => v >= 0f && v <= 1f))
  }

  test("resize re-rasters decodable images to the target dimensions") {
    implicit val enc = Encoders.product[MediaRow]
    val m = spark.createDataset(Seq(MediaRow(0L, testImage(10, 8, "png"), "image")))
    val r = MultimodalOps.resize(m, 4, 3).collect().head
    assert(r.width == 4 && r.height == 3)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    assert(back != null, "resize output must itself be a decodable image")
    assert(back.getWidth == 4 && back.getHeight == 3)
  }

  test("empty payloads do not crash resize/frameSample") {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val m = spark.createDataset(Seq(
      MediaRow(0L, Array.emptyByteArray, "image"),
      MediaRow(1L, Array.emptyByteArray, "video"),
      MediaRow(2L, "x".getBytes, "image")))
    assert(MultimodalOps.resize(m, 32, 32).collect().length == 3)
    // empty payloads produce no frames; non-empty image produces one
    assert(MultimodalOps.frameSample(m).collect().map(_.docId).toSeq == Seq(2L))
    assert(MultimodalOps.extractFeatures(m).collect().length == 3)
  }

  test("pixel budget: over-budget declared dimensions degrade to the stub") {
    val png = testImage(8, 8, "png") // 64 pixels, decodes fine normally
    val rows = Seq(MediaRow(0L, png, "image"))
    val real = MultimodalOps.decodeBatch(rows).head
    assert(real.width == 8 && real.height == 8)
    // with a 32-pixel budget the SAME payload is rejected at the
    // header read (no raster allocation) and falls back to the stub —
    // the mechanism that keeps a decompression-bomb header from
    // OOM-ing an executor
    val guarded = MultimodalOps.decodeBatch(rows, maxPixels = 32L).head
    assert(guarded.width >= 320 && guarded.height >= 240,
      "over-budget image must take the stub path")
    // at the default budget the cap is far above any legitimate image
    assert(MultimodalOps.DefaultMaxPixels == 32L * 1024 * 1024)
  }

  test("frameSample: every-Nth frame for videos, single frame for images") {
    val frames = MultimodalOps.frameSample(media, everyN = 4).collect()
    val byDoc = frames.groupBy(_.docId)
    assert(byDoc.keySet.size == 100)
    // images (docId % 3 != 0) produce exactly one frame at index 0
    assert(byDoc.filter(_._1 % 3 != 0).values.forall(f =>
      f.length == 1 && f.head.frameIdx == 0))
    // sampled indices step by 4
    assert(frames.forall(_.frameIdx % 4 == 0))
  }

  /** Gray-gradient PNG: v = (x·53 + y·97) mod 256 in all channels —
    * luminance spreads across the full 8-bin histogram (high entropy),
    * deterministically.
    */
  private def grayImage(w: Int, h: Int, flat: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = if (flat) 128 else (x * 53 + y * 97) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  test("imageFilter: one named reason per failure mode, entropy emitted for re-cutting") {
    implicit val enc = Encoders.product[MediaRow]
    val m = spark.createDataset(Seq(
      MediaRow(0L, grayImage(128, 128), "image"),              // keep
      MediaRow(1L, grayImage(8, 8), "image"),                  // too_small
      MediaRow(2L, grayImage(512, 64), "image"),               // extreme_aspect
      MediaRow(3L, grayImage(128, 128, flat = true), "image"), // low_entropy
      MediaRow(4L, "not an image".getBytes("UTF-8"), "image"), // undecodable
      MediaRow(5L, grayImage(128, 128), "video")))             // not_image
    val g = MultimodalOps.imageFilter(m).collect().sortBy(_.docId)
    assert(g.map(_.failReasons).toSeq == Seq("", "too_small", "extreme_aspect",
      "low_entropy", "undecodable", "not_image"))
    assert(g.map(_.keep).toSeq == Seq(true, false, false, false, false, false))
    // the keep image's dimensions come from the real bitstream
    assert(g(0).width == 128 && g(0).height == 128)
    // entropy is the audit column: gradient near ln(8), flat exactly 0
    assert(g(0).entropy > 1.8 && g(3).entropy == 0.0)
    // thresholds are knobs: lowering minEntropy re-admits the flat image
    val relaxed = MultimodalOps.imageFilter(m, minEntropy = 0.0)
      .collect().sortBy(_.docId)
    assert(relaxed(3).keep)
  }

  test("imageProfile: one decode yields exactly imageFilter's gate AND " +
      "imageHashes' dhash") {
    implicit val enc = Encoders.product[MediaRow]
    val m = spark.createDataset(Seq(
      MediaRow(0L, grayImage(128, 128), "image"),
      MediaRow(1L, grayImage(8, 8), "image"),
      MediaRow(2L, grayImage(128, 128, flat = true), "image"),
      MediaRow(3L, "not an image".getBytes("UTF-8"), "image"),
      MediaRow(4L, grayImage(64, 64), "video")))
    val p = MultimodalOps.imageProfile(m).collect()
      .map(r => r.docId -> r).toMap
    val g = MultimodalOps.imageFilter(m).collect()
      .map(r => r.docId -> r).toMap
    val h = MultimodalOps.imageHashes(m).collect()
      .map(r => r.docId -> r).toMap
    (0L to 4L).foreach { id =>
      assert((p(id).width, p(id).height, p(id).entropy, p(id).keep,
        p(id).failReasons) ==
        (g(id).width, g(id).height, g(id).entropy, g(id).keep,
          g(id).failReasons), s"gate drift at $id")
      assert(p(id).decoded == h(id).decoded, s"decoded drift at $id")
      if (h(id).decoded)
        assert(p(id).dhash == h(id).dhash, s"dhash drift at $id")
    }
  }

  test("profile projections: gateFromProfiles / imageHashesFromProfiles " +
      "/ imageAnnFromProfiles equal the standalone decode ops " +
      "(incl. the stub features of undecodable payloads)") {
    implicit val enc = Encoders.product[MediaRow]
    val m = spark.createDataset(Seq(
      MediaRow(0L, grayImage(128, 128), "image"),
      MediaRow(1L, grayImage(8, 8), "image"),
      MediaRow(2L, grayImage(128, 128, flat = true), "image"),
      MediaRow(3L, "not an image".getBytes("UTF-8"), "image"),
      MediaRow(4L, grayImage(64, 64), "video"),
      MediaRow(5L, grayImage(96, 48), "image")))
    val profiles = MultimodalOps.imageProfile(m)
    def gateRows(ds: org.apache.spark.sql.Dataset[MultimodalOps.ImageGate]) =
      ds.collect().map(g => (g.docId, g.width, g.height, g.entropy,
        g.keep, g.failReasons)).sortBy(_._1).toSeq
    assert(gateRows(MultimodalOps.gateFromProfiles(profiles)) ==
      gateRows(MultimodalOps.imageFilter(m)))
    def hashRows(ds: org.apache.spark.sql.Dataset[MultimodalOps.ImageHash]) =
      ds.collect().map(x => (x.docId, x.dhash, x.decoded)).sortBy(_._1).toSeq
    assert(hashRows(MultimodalOps.imageHashesFromProfiles(profiles)) ==
      hashRows(MultimodalOps.imageHashes(m)))
    // the profile's feature column IS extractFeatures' (stub included)
    val pf = profiles.collect().map(p => p.docId -> p.feature.toSeq).toMap
    val ef = MultimodalOps.extractFeatures(m).collect()
      .map(f => f.docId -> f.feature.toSeq).toMap
    assert(pf == ef, "profile features must equal extractFeatures'")
    def annRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Long]("rnk"))).sortBy(t => (t._1, t._3)).toSeq
    assert(annRows(MultimodalOps.imageAnnFromProfiles(profiles,
        nQueries = 3, k = 2)) ==
      annRows(MultimodalOps.imageAnnTopK(m, nQueries = 3, k = 2)))
  }
}
