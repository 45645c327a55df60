package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}

/** Streaming corpus intake end-to-end: JSONL document files land in a
  * directory (the collector hand-off), flow through the on-ingest
  * cleaning gate ([[StreamingOps.cleanDocStream]] — token floor,
  * quality floor, watermark-bounded exact dedup) and are written as a
  * lang-partitioned parquet corpus — the streaming counterpart of
  * batch `cleanCorpus` → `CorpusStore.write`.
  *
  * Operational contract mirrors [[PaymentStream.filePipeline]]: the
  * file source's processed-file log lives under the CHECKPOINT dir and
  * the parquet sink's commit log under `<outDir>/_spark_metadata` — a
  * killed query resumes where it stopped and the output is
  * exactly-once across restarts (readers see only committed files),
  * PROVIDED checkpoint and output dirs are lifecycle-managed together:
  * recreating one while keeping the other desynchronizes the two logs
  * (duplicate re-emits or an inconsistent committed-file view).
  */
object DocStream {

  val docSchema: StructType = new StructType()
    .add("doc_id", LongType)
    .add("text", StringType)
    .add("lang", StringType)
    .add("source", StringType)
    .add("ingest_ts", TimestampType)

  /** JSONL file-stream of documents; malformed records are dropped
    * (poison-pill tolerance, same policy as the payment ingest).
    */
  def fromFiles(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("text")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(dir)
      .select(from_json(col("value").cast("string"), docSchema).as("d"))
      .where(col("d.doc_id").isNotNull && col("d.text").isNotNull &&
        col("d.ingest_ts").isNotNull)
      .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"),
        coalesce(col("d.lang"), lit("und")).as("lang"),
        coalesce(col("d.source"), lit("unknown")).as("source"),
        col("d.ingest_ts").as("ingest_ts"))
  }

  /** The full intake pipeline: files → parse → clean → lang-partitioned
    * parquet, checkpointed. Returns the running query; callers own
    * stop().
    */
  def cleanPipeline(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, minTokens: Int = 10,
      minStopRatio: Double = 0.05, watermarkDelay: String = "10 minutes",
      triggerInterval: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val cleaned = StreamingOps.cleanDocStream(
      fromFiles(spark, inDir, maxFilesPerTrigger),
      minTokens, minStopRatio, watermarkDelay)
      // one file per (batch, lang), not (task, lang): the same
      // small-files argument as CorpusStore.write — a long-running
      // intake with frequent triggers must not explode the listing
      .repartition(org.apache.spark.sql.functions.col("lang"))
    val writer = cleaned.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("lang")
      .outputMode("append")
    triggerInterval.foreach(t => writer.trigger(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(t)))
    writer.start()
  }
}
