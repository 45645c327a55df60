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

  test("replayed create after resolution emits exactly one outcome (marker retention)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val q = PaymentMonitor.outcomes(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("replay_outcomes")
      .outputMode("append").start()
    try {
      // same-batch replay after the terminal event
      input.addData(
        PaymentEvent(1L, ts("2024-01-01 10:00:00"), "create"),
        PaymentEvent(1L, ts("2024-01-01 10:00:30"), "processed"),
        PaymentEvent(1L, ts("2024-01-01 10:00:40"), "create")) // replay
      q.processAllAvailable()
      // later-batch replay, watermark still inside the marker horizon
      input.addData(PaymentEvent(1L, ts("2024-01-01 10:00:50"), "create"))
      q.processAllAvailable()
      input.addData(PaymentEvent(9L, ts("2024-01-01 10:20:00"), "create"))
      q.processAllAvailable()
      val out = spark.table("replay_outcomes").collect()
        .map(r => r.getAs[Long]("paymentId") -> r.getAs[String]("status"))
      assert(out.toSeq == Seq(1L -> "processed"),
        s"a replayed create must not re-open a resolved payment: ${out.toSeq}")
    } finally q.stop()
  }

  test("post-horizon replayed create opens a new lifecycle (watermark-bounded contract)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    // 1-minute expiry keeps the timeline compact
    val q = PaymentMonitor.outcomes(input.toDS(),
      watermarkDelay = "0 seconds", expiryMs = 60000L)
      .writeStream.format("memory").queryName("horizon_outcomes")
      .outputMode("append").start()
    try {
      input.addData(
        PaymentEvent(1L, ts("2024-01-01 10:00:00"), "create"),
        PaymentEvent(1L, ts("2024-01-01 10:00:30"), "processed"))
      q.processAllAvailable() // marker deadline = 10:01:30
      // watermark passes the marker deadline -> marker dropped SILENTLY
      // (no second outcome for the resolved payment)
      input.addData(PaymentEvent(2L, ts("2024-01-01 10:02:00"), "create"))
      q.processAllAvailable()
      assert(spark.table("horizon_outcomes").count() == 1)
      // post-horizon replay: indistinguishable from a new payment by
      // contract (same horizon as dropDuplicatesWithinWatermark) — it
      // opens a fresh lifecycle, which here expires unresolved
      input.addData(PaymentEvent(1L, ts("2024-01-01 10:02:30"), "create"))
      q.processAllAvailable()
      input.addData(PaymentEvent(3L, ts("2024-01-01 10:10:00"), "create"))
      q.processAllAvailable() // watermark 10:10 > p1's 10:03:30 deadline
      val p1 = spark.table("horizon_outcomes").where("paymentId = 1")
        .collect().map(r => (r.getAs[String]("status"),
          r.getAs[Timestamp]("createdTs"), r.getAs[Timestamp]("resolvedTs"))).toSet
      assert(p1 == Set(
        ("processed", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:30")),
        ("expired", ts("2024-01-01 10:02:30"), ts("2024-01-01 10:03:30"))),
        s"got $p1")
    } finally q.stop()
  }

  test("terminal arriving a batch BEFORE its create still resolves (orphan buffer)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val q = PaymentMonitor.outcomes(input.toDS(), watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("skew_outcomes")
      .outputMode("append").start()
    try {
      // delivery skew: the terminal's file is discovered first
      input.addData(PaymentEvent(9L, ts("2024-01-01 10:00:05"), "processed"))
      q.processAllAvailable()
      input.addData(PaymentEvent(9L, ts("2024-01-01 10:00:00"), "create"))
      q.processAllAvailable()
      val out = spark.table("skew_outcomes").collect()
      assert(out.length == 1, "buffered terminal must resolve the payment")
      assert(out.head.getAs[String]("status") == "processed")
      assert(out.head.getAs[Timestamp]("createdTs") == ts("2024-01-01 10:00:00"))
      assert(out.head.getAs[Timestamp]("resolvedTs") == ts("2024-01-01 10:00:05"))
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
