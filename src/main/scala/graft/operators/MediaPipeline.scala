package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The composed MULTIMODAL curation capstone — the media analog of
  * [[Curation.curateCorpus]] (text's composed pipeline): for each
  * modality, the quality gate runs first (cheap, partition-local,
  * named reasons), then the perceptual dedup runs over gate
  * SURVIVORS only (the expensive stage sees the smallest corpus —
  * the same stage order the text pipeline uses), and a keep-first
  * rule drops every clip/image that near-dups a smaller-id survivor.
  * Returns ONE inventory row per (doc_id, modality):
  * (doc_id, modality, keep, reason) with reason = "" for kept rows,
  * the gate's own named reasons for gate drops, or "dup_of:<id>" for
  * dedup drops — the audit frame a 100 TB media-curation run ends
  * with (counts per (modality, reason) are one groupBy away).
  *
  * Keep-first here is the PAIRWISE rule: a row is dropped iff it
  * near-dups a smaller-id gate survivor (its `dup_of` names the
  * smallest such partner). This is the published greedy keep-first,
  * NOT connected-components canonicalization — a chain a~b~c with
  * a≁c keeps a AND c (both drop nothing they pair with) while the
  * component rule would keep only a; the components upgrade is
  * [[Dedup.dedupGroups]]' engine pointed at these pair frames, left
  * composable by design.
  */
object MediaPipeline {

  private def inventory(ids: DataFrame, gate: DataFrame,
      pairs: DataFrame, modality: String): DataFrame = {
    // smallest near-dup partner per dropped doc: pairs carry
    // a_id < b_id, so the b side is the drop candidate
    val dupOf = pairs.groupBy(col("b_id").as("doc_id"))
      .agg(min(col("a_id")).as("dup_src"))
    ids.join(gate, Seq("doc_id"), "left")
      .join(dupOf, Seq("doc_id"), "left")
      .select(col("doc_id"), lit(modality).as("modality"),
        (coalesce(col("keep"), lit(false)) && col("dup_src").isNull)
          .as("keep"),
        when(!coalesce(col("keep"), lit(false)),
            coalesce(col("fail_reasons"), lit("missing")))
          .when(col("dup_src").isNotNull,
            concat(lit("dup_of:"), col("dup_src")))
          .otherwise(lit("")).as("reason"))
  }

  /** Full three-modality run. Image and audio decode exactly ONCE:
    * the fused profile pass ([[MultimodalOps.imageProfile]] /
    * [[AudioOps.audioProfile]]) emits gate fields AND perceptual hash
    * from the same decode, the profile frame persists (small rows,
    * decoupled from payloads), and the dedup consumes gate SURVIVORS'
    * hashes via [[Dedup.perceptualPairsFrom]] — no payload is
    * re-touched after the profile (the first cut ran gate and dedup
    * as separate operators and decoded every surviving raster/clip
    * twice; measured 9.3 s → see SURVEY §5b). Degenerate hashes are
    * excluded twice over (gate + the profile's own validity flag).
    * Video still parses its container in both the meta gate and the
    * frame-hash pass — the expensive per-frame JPEG decode runs once,
    * in the dedup only.
    */
  def curateMedia(images: Dataset[MultimodalOps.MediaRow],
      audio: Dataset[AudioOps.AudioRow],
      videos: Dataset[MultimodalOps.MediaRow],
      imgMinSide: Int = 16, imgMinEntropy: Double = 1.2,
      maxHamming: Int = 5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val imgProfile = MultimodalOps.imageProfile(images,
      minSide = imgMinSide, minEntropy = imgMinEntropy).toDF()
      .persist(lvl)
    imgProfile.count()
    val imgGate = imgProfile
      .select(col("docId").as("doc_id"), col("keep"),
        col("failReasons").as("fail_reasons"))
    val imgIds = imgProfile.select(col("docId").as("doc_id"))
    val imgPairs = Dedup.perceptualPairsFrom(
      imgProfile.where(col("keep") && col("decoded"))
        .select(col("docId"), col("dhash")), maxHamming)

    val audProfile = AudioOps.audioProfile(audio).toDF().persist(lvl)
    audProfile.count()
    val audGate = audProfile
      .select(col("docId").as("doc_id"), col("keep"),
        col("failReasons").as("fail_reasons"))
    val audIds = audProfile.select(col("docId").as("doc_id"))
    val audPairs = Dedup.perceptualPairsFrom(
      audProfile.where(col("keep") && col("hashValid"))
        .select(col("docId"), col("ehash")), maxHamming)

    // video gate = real container parse succeeding with >= 1 frame
    val vidGate = VideoOps.videoMeta(videos).toDF()
      .select(col("docId").as("doc_id"), col("decoded").as("keep"),
        when(col("decoded"), lit("")).otherwise(lit("undecodable"))
          .as("fail_reasons"))
    val vidIds = videos.toDF().select(col("docId").as("doc_id"))
    val vidKeepSet = vidGate.where(col("keep")).select("doc_id")
    val vidPairs = Dedup.videoDedupPairs(
      videos.join(vidKeepSet.withColumnRenamed("doc_id", "docId"), "docId")
        .as(videos.encoder), maxHamming)
      .select("a_id", "b_id")

    inventory(imgIds, imgGate, imgPairs.select("a_id", "b_id"), "image")
      .unionByName(inventory(audIds, audGate,
        audPairs.select("a_id", "b_id"), "audio"))
      .unionByName(inventory(vidIds, vidGate, vidPairs, "video"))
  }
}
