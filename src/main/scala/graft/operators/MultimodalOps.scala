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
        nFrames = if (m.format == "video") 1 + (n % 16) else 1,
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
}
