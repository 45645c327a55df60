package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The outbound confirm leg (kinesis-pay.php:487-509, approvePayment):
  * once a payment resolves `processed`, the reference POSTs a confirm
  * to the payment API and records the paid amount on the invoice as
  * `"<amount> <currency>"` (AMOUNT_PAID, with the amount chosen by
  * currency — paymentKauAmount for KAU, else paymentKagAmount).
  *
  * Here the FSM's outcome stream drives that leg: a `foreachBatch`
  * seam joins each micro-batch of resolved payments against the
  * invoice/amount dimension and lands exactly one confirm record per
  * processed payment in the masked [[graft.sources.InvoiceLog]] audit
  * sink.
  *
  * Exactly-once, by construction, each link spec-asserted:
  *  1. the FSM emits at most one outcome per paymentId (resolved-marker
  *     retention, PaymentMonitor);
  *  2. `confirmRecords` is a projection + broadcast join — one row in,
  *     at most one row out;
  *  3. [[graft.sources.InvoiceLog.writeBatch]] scopes an OVERWRITE to
  *     the micro-batch's own `batch=<id>` directory, so foreachBatch's
  *     at-least-once crash replay (same batchId, same rows) rewrites
  *     the same files instead of appending duplicates.
  *
  * Scale shape: the per-batch work is a broadcast hash join (amounts
  * is the small invoice dimension) plus a partitioned JSON write — no
  * extra shuffle beyond the FSM's own keyed state exchange, and no
  * driver-side row handling at any event rate.
  */
object PaymentConfirm {

  /** One confirm record per `processed` outcome in `outcomes`:
    * `(paymentId, currency, amount, amount_paid, resolvedTs)` with
    * `amount_paid` in the reference's `"<amount> <currency>"` text
    * form and `amount` picked by currency from the dimension's
    * kau/kag columns (kinesis-pay.php:506-508). `amounts` must carry
    * `paymentId, currency, kauAmount, kagAmount`; a processed payment
    * missing from it is a referential break the batch reconcile
    * surfaces (Payments.invoiceReconcile) — the inner join keeps the
    * audit log free of half-formed confirms.
    *
    * Works identically on a static frame or a streaming micro-batch —
    * pure narrow ops plus a broadcast join, no shuffle.
    */
  def confirmRecords(outcomes: DataFrame, amounts: DataFrame): DataFrame =
    outcomes.where(col("status") === "processed")
      .join(broadcast(amounts), "paymentId")
      .withColumn("amount",
        when(col("currency") === "KAU", col("kauAmount"))
          .otherwise(col("kagAmount"))
          // scale-2 DECIMAL canonicalizes the text form (same
          // convention as the batch Payments.confirmAmounts) — a
          // scale-18 input would otherwise render trailing zeros
          .cast("decimal(12,2)"))
      .select(col("paymentId"), col("currency"), col("amount"),
        concat(col("amount").cast("string"), lit(" "), col("currency"))
          .as("amount_paid"),
        col("resolvedTs"))

  /** Run the confirm leg over a live outcome stream: per micro-batch,
    * derive confirm records and land them idempotently in the masked
    * JSONL audit sink (digit runs in `amount_paid` come out masked —
    * the log is the postback log the reference masks at
    * kinesis-pay.php:459; the DECIMAL `amount` column stays exact).
    * Callers own stop().
    */
  def confirmStream(outcomes: Dataset[PaymentOutcome], amounts: DataFrame,
      outDir: String, checkpointDir: String): StreamingQuery = {
    val landBatch: (DataFrame, Long) => Unit = (batch, batchId) =>
      graft.sources.InvoiceLog.writeBatch(
        confirmRecords(batch, amounts), outDir, batchId)
    outcomes.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(landBatch)
      .start()
  }

  /** The full deployment shape of the leg: file-stream ingest → FSM →
    * confirm join → masked idempotent sink, checkpointed end-to-end
    * (the streaming twin of the reference's poll→approve→record loop).
    */
  def filePipeline(spark: org.apache.spark.sql.SparkSession, inDir: String,
      amounts: DataFrame, outDir: String, checkpointDir: String,
      watermarkDelay: String = "10 seconds",
      expiryMs: Long = PaymentMonitor.ExpiryMs): StreamingQuery =
    confirmStream(
      PaymentMonitor.outcomes(PaymentStream.fromFiles(spark, inDir),
        watermarkDelay, expiryMs),
      amounts, outDir, checkpointDir)

  /** The reference's FULL loop as one checkpointed pipeline (r9):
    * `payfeed` connector ingest → JSON parse → payment FSM → confirm
    * join → masked idempotent sink — poll → resolve → approve → record
    * (kinesis-pay.php:232-303 + :487-509) end-to-end. The three seams
    * are the individually-spec'd ones; this method is the composition,
    * and PayFeedPipelineSpec kills and resumes it, asserting exactly
    * one masked confirm per processed payment across the restart (the
    * connector's replayable offsets + the FSM's resolved-marker state
    * + the batch-scoped idempotent sink, composed).
    */
  def feedPipeline(spark: org.apache.spark.sql.SparkSession,
      feedOptions: Map[String, String], amounts: DataFrame, outDir: String,
      checkpointDir: String, watermarkDelay: String = "10 seconds",
      expiryMs: Long = PaymentMonitor.ExpiryMs): StreamingQuery =
    confirmStream(
      PaymentMonitor.outcomes(PaymentStream.fromFeed(spark, feedOptions),
        watermarkDelay, expiryMs),
      amounts, outDir, checkpointDir)
}
