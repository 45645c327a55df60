package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{PaymentMonitor, PaymentStream}

/** End-to-end ingest pipeline: raw JSON records → typed parse → FSM →
  * sink, the full streaming path a connector-backed deployment runs.
  */
class PaymentStreamSpec extends SparkSuite {
  import spark.implicits._

  test("raw JSON stream drives the FSM; malformed records are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val events = PaymentStream.fromJson(input.toDF(), "value")
    val q = PaymentMonitor.outcomes(events, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("stream_outcomes")
      .outputMode("append").start()
    try {
      input.addData(
        """{"paymentId": 1, "ts": "2024-01-01T10:00:00", "kind": "create"}""",
        """not json at all""",
        """{"paymentId": 1, "ts": "2024-01-01T10:03:00", "kind": "processed"}""")
      q.processAllAvailable()
      val out = spark.table("stream_outcomes").collect()
      assert(out.length == 1)
      assert(out.head.getAs[Long]("paymentId") == 1L)
      assert(out.head.getAs[String]("status") == "processed")
      assert(out.head.getAs[Timestamp]("resolvedTs") ==
        Timestamp.valueOf("2024-01-01 10:03:00"))
    } finally q.stop()
  }
}
