package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, Encoders}

/** Typed multimodal pipeline plumbing: opaque binary payloads +
  * metadata in, per-batch decoded features out, via `mapPartitions`
  * over case-class rows — the Scala shape of a batched decode stage
  * (a native decoder wants contiguous batches, not row-at-a-time
  * calls).
  *
  * Image payloads (PNG/JPEG/BMP/GIF — whatever the JDK's
  * `javax.imageio` service registry provides, zero external
  * dependencies) are decoded for REAL: dimensions from the actual
  * bitstream, an 8-bin luminance histogram as the feature vector, and
  * a real raster rescale for [[resize]]. Video payloads remain a
  * deterministic STUB (the JDK ships no video codec); undecodable
  * bytes degrade to the same stub rather than failing the batch
  * (poison-pill tolerance — one corrupt file must not kill a 100 TB
  * decode pass).
  */
object MultimodalOps {

  case class MediaRow(docId: Long, payload: Array[Byte], format: String)
  case class MediaFeatures(docId: Long, width: Int, height: Int,
      nFrames: Int, feature: Array[Float])

  /** Stub frame count shared by decodeBatch and frameSample so a real
    * codec binding replaces ONE formula, not two drifting copies.
    */
  private[operators] def frameCount(payload: Array[Byte], format: String): Int =
    if (format == "video") 1 + (payload.length % 16) else 1

  /** STUB features (video / undecodable payloads): deterministic in
    * the payload bytes.
    */
  private def stubFeatures(m: MediaRow): MediaFeatures = {
    val n = m.payload.length
    val sum = m.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeatures(m.docId,
      width = 320 + (n * 7) % 1600,
      height = 240 + (n * 13) % 840,
      nFrames = frameCount(m.payload, m.format),
      feature = Array.tabulate(8)(i => ((sum + i * 31) % 997).toFloat / 997f))
  }

  /** Pixel budget for a full decode: 32 Mpixel ≈ 128 MB of ARGB
    * raster. A decompression-bomb payload (tiny bytes, huge DECLARED
    * dimensions) would otherwise make `ImageIO.read` allocate the full
    * raster and OOM the executor — the one failure mode the
    * poison-pill catch cannot contain, because OutOfMemoryError is not
    * an Exception. The guard reads width/height from the header via
    * the `ImageReader` API (no raster allocation) and rejects
    * over-budget images to the stub path BEFORE decoding.
    */
  private[graft] val DefaultMaxPixels: Long = 32L * 1024 * 1024

  /** Header-first bounded read: dimensions come from the format header
    * (cheap); the full raster is decoded only when width×height fits
    * the pixel budget. None on unreadable bytes OR over-budget
    * dimensions — the caller degrades to the stub either way.
    */
  private def readImageBounded(payload: Array[Byte],
      maxPixels: Long): Option[java.awt.image.BufferedImage] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      if (iis == null) None
      else try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0); val h = r.getHeight(0)
            if (w.toLong * h > maxPixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Real image decode via the JDK registry: None when the bytes are
    * not a readable image or declare over-budget dimensions (caller
    * falls back to the stub). Features = 8-bin luminance histogram
    * over a bounded probe grid (≤64×64 samples), so cost is constant
    * in the image size.
    */
  private def decodeImage(m: MediaRow, maxPixels: Long): Option[MediaFeatures] =
    try {
      val img = readImageBounded(m.payload, maxPixels).orNull
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val hist = new Array[Float](8)
        // ceil division keeps the probe grid genuinely <= 64x64 (floor
        // would sample up to 127 per axis for sizes in [65, 127])
        val sx = math.max(1, (w + 63) / 64); val sy = math.max(1, (h + 63) / 64)
        var n = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1f
            n += 1; x += sx
          }
          y += sy
        }
        if (n > 0) { var i = 0; while (i < 8) { hist(i) /= n; i += 1 } }
        Some(MediaFeatures(m.docId, w, h, 1, hist))
      }
    } catch { case _: Exception => None }

  /** Decode one batch: real image decode (pixel-budget-guarded), stub
    * for video/undecodable/over-budget.
    */
  private[graft] def decodeBatch(batch: Seq[MediaRow],
      maxPixels: Long = DefaultMaxPixels): Seq[MediaFeatures] =
    batch.map { m =>
      if (m.format == "video") stubFeatures(m)
      else decodeImage(m, maxPixels).getOrElse(stubFeatures(m))
    }

  /** Batched feature extraction: payloads stream through the decoder
    * `batchSize` rows at a time, partition-local (no shuffle, no
    * driver involvement — the partitioning of the input is the
    * parallelism of the decode).
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64,
      maxPixels: Long = DefaultMaxPixels): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions(_.grouped(batchSize).flatMap(decodeBatch(_, maxPixels)))
  }

  case class ResizedMedia(docId: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize: REAL raster rescale for decodable images (area-style via
    * `getScaledInstance(SCALE_SMOOTH)` drawn into a fresh RGB raster,
    * re-encoded as PNG — deterministic for a given JDK); the old
    * deterministic byte-stub for video/undecodable payloads. Plumbing
    * (typed schema, partition-local map) unchanged.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions(_.map { m =>
      if (m.payload.isEmpty) ResizedMedia(m.docId, w, h, Array.emptyByteArray)
      else resizeImage(m, w, h).getOrElse {
        val outLen = math.max(1, math.min(m.payload.length, w * h / 64))
        ResizedMedia(m.docId, w, h,
          Array.tabulate(outLen)(i => (m.payload(i % m.payload.length) ^ (w + h)).toByte))
      }
    })
  }

  private def resizeImage(m: MediaRow, w: Int, h: Int): Option[ResizedMedia] =
    if (m.format == "video") None
    else try {
      val img = readImageBounded(m.payload, DefaultMaxPixels).orNull
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img.getScaledInstance(w, h,
          java.awt.Image.SCALE_SMOOTH), 0, 0, null)
        finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        Some(ResizedMedia(m.docId, w, h, bos.toByteArray))
      }
    } catch { case _: Exception => None }

  case class Frame(docId: Long, frameIdx: Int, payload: Array[Byte])

  /** STUB frame sampling for video payloads: emit every `everyN`-th
    * frame index of the (stub-decoded) frame count. Partition-local
    * flatMap — output cardinality scales with frames, input stays
    * opaque bytes until here.
    */
  def frameSample(media: Dataset[MediaRow], everyN: Int = 4): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.mapPartitions(_.flatMap { m =>
      if (m.payload.isEmpty) Iterator.empty // nothing to decode
      else (0 until frameCount(m.payload, m.format) by everyN).iterator.map(i =>
        Frame(m.docId, i, Array(m.payload(i % m.payload.length), i.toByte)))
    })
  }
}
