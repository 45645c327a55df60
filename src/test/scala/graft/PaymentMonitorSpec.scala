package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{PaymentEvent, PaymentMonitor}

/** Streaming FSM spec: expiry must fire via the event-time watermark,
  * never wall clock.
  */
class PaymentMonitorSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("processed, watermark-expired, and late-terminal outcomes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val q: StreamingQuery = PaymentMonitor.outcomes(
      input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("pay_outcomes")
      .outputMode("append").start()
    try {
      // p1 resolves in-window; p2 never resolves; the 10:20 event
      // advances the watermark past p2's 10:10:10 deadline.
      input.addData(
        PaymentEvent(1L, ts("2024-01-01 10:00:00"), "create"),
        PaymentEvent(2L, ts("2024-01-01 10:00:10"), "create"),
        PaymentEvent(1L, ts("2024-01-01 10:05:00"), "processed"),
        PaymentEvent(3L, ts("2024-01-01 10:20:00"), "create"))
      q.processAllAvailable()
      // Next batch: p2's event-time timeout fires; p3 resolves; p4 opens.
      input.addData(
        PaymentEvent(3L, ts("2024-01-01 10:21:00"), "rejected"),
        PaymentEvent(4L, ts("2024-01-01 10:22:00"), "create"))
      q.processAllAvailable()
      // p4's terminal arrives 18 min after create -> expired on arrival.
      input.addData(PaymentEvent(4L, ts("2024-01-01 10:40:00"), "processed"))
      q.processAllAvailable()

      val out = spark.table("pay_outcomes").collect()
        .map(r => r.getAs[Long]("paymentId") -> r.getAs[String]("status"))
        .toMap
      assert(out == Map(1L -> "processed", 2L -> "expired",
        3L -> "rejected", 4L -> "expired"))
      val p2 = spark.table("pay_outcomes")
        .where("paymentId = 2").collect().head
      assert(p2.getAs[Timestamp]("resolvedTs") == ts("2024-01-01 10:10:10"))
    } finally q.stop()
  }

  test("duplicate creates and orphan terminals are ignored") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val q = PaymentMonitor.outcomes(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("edge_outcomes")
      .outputMode("append").start()
    try {
      input.addData(
        PaymentEvent(1L, ts("2024-01-01 10:00:00"), "create"),
        PaymentEvent(1L, ts("2024-01-01 10:01:00"), "create"),    // dup: ignored
        PaymentEvent(2L, ts("2024-01-01 10:02:00"), "processed"), // orphan: ignored
        PaymentEvent(1L, ts("2024-01-01 10:03:00"), "processed"))
      q.processAllAvailable()
      val out = spark.table("edge_outcomes").collect()
      assert(out.length == 1)
      assert(out.head.getAs[Long]("paymentId") == 1L)
      // createdTs is the FIRST create, not the duplicate
      assert(out.head.getAs[Timestamp]("createdTs") == ts("2024-01-01 10:00:00"))
    } finally q.stop()
  }
}
