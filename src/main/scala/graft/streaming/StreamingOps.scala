package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming transforms beyond the payment FSM — the reference's poll
  * loop observed as a live stream (kinesis-pay.php:295-303): windowed
  * lifecycle funnels and at-most-once event admission. All are
  * watermark-bounded: state size is O(open windows), never O(stream).
  *
  * Each takes/returns a streaming DataFrame (readStream-sourced); the
  * same code also runs on batch frames, which is how the batch oracle
  * cross-checks the semantics.
  */
object StreamingOps {

  /** Per-window lifecycle funnel: event counts + value totals by type
    * in tumbling event-time windows. Watermark bounds state; partial
    * aggregation happens pre-shuffle exactly as in batch.
    */
  def windowedFunnel(events: DataFrame, windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** At-most-once admission: drop duplicate event ids arriving within
    * the watermark horizon (the reference's "transaction already
    * processed" guard, kinesis-pay.php:515-530, as a stream op).
    * State is one key per event inside the horizon — bounded.
    */
  def dedupedEvents(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")
}
