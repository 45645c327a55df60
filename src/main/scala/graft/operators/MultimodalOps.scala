package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}

/** Typed multimodal pipeline plumbing: opaque binary payloads +
  * metadata in, per-batch decoded features out, via `mapPartitions`
  * over case-class rows — the Scala shape of a batched decode stage
  * (a native decoder wants contiguous batches, not row-at-a-time
  * calls).
  *
  * The decode itself is a STUB (this container has no image/audio
  * libs): `decodeBatch` derives deterministic fake dimensions/features
  * from the payload bytes. Everything around it — the typed schema,
  * the batching, partition preservation, the encoder round-trip — is
  * the real 100 TB plumbing and is what the spec covers.
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

  /** STUB decoder — replace with a real codec binding in production.
    * Deterministic in the payload bytes; one call per batch.
    */
  private[operators] def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val n = m.payload.length
      val sum = m.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(m.docId,
        width = 320 + (n * 7) % 1600,
        height = 240 + (n * 13) % 840,
        nFrames = frameCount(m.payload, m.format),
        feature = Array.tabulate(8)(i => ((sum + i * 31) % 997).toFloat / 997f))
    }

  /** Batched feature extraction: payloads stream through the stub
    * decoder `batchSize` rows at a time, partition-local (no shuffle,
    * no driver involvement — the partitioning of the input is the
    * parallelism of the decode).
    */
  def extractFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }

  case class ResizedMedia(docId: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** STUB resize — a real build binds an image library here. The
    * stub's output payload is a deterministic function of (input
    * bytes, target dims); plumbing (typed schema, partition-local map)
    * is real.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions(_.map { m =>
      if (m.payload.isEmpty) ResizedMedia(m.docId, w, h, Array.emptyByteArray)
      else {
        val outLen = math.max(1, math.min(m.payload.length, w * h / 64))
        ResizedMedia(m.docId, w, h,
          Array.tabulate(outLen)(i => (m.payload(i % m.payload.length) ^ (w + h)).toByte))
      }
    })
  }

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
