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

  test("file source → FSM → JSONL sink: exactly-once across kill and checkpoint resume") {
    import java.io.File
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-e2e").toFile
    val in = new File(root, "in"); in.mkdirs()
    val out = new File(root, "out").getPath
    val ckpt = new File(root, "ckpt").getPath
    // files land atomically (write outside, rename in), as a real
    // collector would — the file source must never see partial files
    def land(name: String, lines: String*): Unit = {
      val tmp = new File(root, name)
      Files.write(tmp.toPath, lines.mkString("\n").getBytes)
      assert(tmp.renameTo(new File(in, name)))
    }
    land("b1.jsonl",
      """{"paymentId": 1, "ts": "2024-01-01T10:00:00", "kind": "create"}""",
      """{"paymentId": 1, "ts": "2024-01-01T10:03:00", "kind": "processed"}""",
      """{"paymentId": 2, "ts": "2024-01-01T10:04:00", "kind": "create"}""")
    val q1 = graft.streaming.PaymentStream.filePipeline(
      spark, in.getPath, out, ckpt, watermarkDelay = "0 seconds")
    try q1.processAllAvailable() finally q1.stop() // kill mid-stream: p2 still pending
    land("b2.jsonl",
      """{"paymentId": 2, "ts": "2024-01-01T10:06:00", "kind": "rejected"}""",
      """{"paymentId": 3, "ts": "2024-01-01T10:07:00", "kind": "create"}""",
      """{"paymentId": 3, "ts": "2024-01-01T10:08:00", "kind": "processed"}""")
    // resume from the SAME checkpoint: p2's pending state must have
    // survived the restart, b1 must not be reprocessed; the resumed
    // query also exercises the backpressure knob (one file per batch)
    val q2 = graft.streaming.PaymentStream.filePipeline(
      spark, in.getPath, out, ckpt, watermarkDelay = "0 seconds",
      maxFilesPerTrigger = Some(1))
    try q2.processAllAvailable() finally q2.stop()
    val log = graft.sources.InvoiceLog.read(spark, out)
      .select("paymentId", "status").collect()
      .map(r => r.getAs[Long]("paymentId") -> r.getAs[String]("status"))
    assert(log.length == 3, s"each outcome exactly once, got ${log.toSeq}")
    assert(log.toSet == Set(1L -> "processed", 2L -> "rejected", 3L -> "processed"))
  }
}
