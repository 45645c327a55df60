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

  test("raw(): a built-in connector format drives the parse seam end-to-end") {
    import org.apache.spark.sql.functions._
    // the connector seam itself: raw(fmt, opts) is exactly what a
    // Kinesis-style connector swap would call — prove it with a format
    // that actually ships in Spark (`rate`), synthesizing a payload
    // column from the connector's records with every 3rd one malformed
    // (fromJson's poison-pill drop path)
    val rawDf = PaymentStream.raw(spark, "rate",
      Map("rowsPerSecond" -> "100"))
    assert(rawDf.isStreaming, "raw() must return an unstarted streaming frame")
    val payload = rawDf.select(
      when(col("value") % 3 === 0, lit("{not json"))
        .otherwise(to_json(struct(col("value").as("paymentId"),
          col("timestamp").as("ts"), lit("create").as("kind")))).as("data"))
    val q = PaymentStream.fromJson(payload, "data")
      .writeStream.format("memory").queryName("raw_seam")
      .outputMode("append").start()
    try {
      // rate generates continuously; wait until enough rows flowed
      val deadline = System.nanoTime() + 150L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 10 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        n = spark.table("raw_seam").count()
        if (n < 10) Thread.sleep(200)
      }
      val ids = spark.table("raw_seam").collect().map(_.getAs[Long]("paymentId"))
      assert(ids.length >= 10, s"expected >=10 parsed events, got ${ids.length}")
      // every malformed record (value % 3 == 0) was dropped, others kept
      assert(ids.forall(_ % 3 != 0))
      assert(ids.toSet.size == ids.length, "rate ids are unique")
    } finally q.stop()
  }

  test("socket source → parse → FSM: a real TCP stream drives the same pipeline") {
    import java.net.ServerSocket
    import java.nio.charset.StandardCharsets.UTF_8
    // real server socket on an ephemeral port; Spark's socket source
    // CONNECTS to it, then every accepted line flows through the same
    // fromJson parse + FSM as the file/connector paths
    val server = new ServerSocket(0)
    val lines = Seq(
      """{"paymentId": 7, "ts": "2024-01-01T10:00:00", "kind": "create"}""",
      """garbage line""",
      """{"paymentId": 7, "ts": "2024-01-01T10:02:00", "kind": "processed"}""")
    val writer = new Thread(() => {
      val s = server.accept()
      try {
        val outS = s.getOutputStream
        outS.write((lines.mkString("\n") + "\n").getBytes(UTF_8))
        outS.flush()
        // keep the connection open until the query is done reading
        Thread.sleep(30000)
      } catch { case _: InterruptedException => () } finally s.close()
    })
    writer.setDaemon(true); writer.start()
    val events = PaymentStream.fromSocket(spark, "localhost", server.getLocalPort)
    val q = PaymentMonitor.outcomes(events, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("socket_outcomes")
      .outputMode("append").start()
    try {
      // the socket source buffers lines as they arrive; poll until the
      // resolved outcome lands (bounded — the data is 3 lines)
      val deadline = System.currentTimeMillis() + 90000
      var out = Array.empty[org.apache.spark.sql.Row]
      while (out.isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        out = spark.table("socket_outcomes").collect()
        if (out.isEmpty) Thread.sleep(200)
      }
      assert(out.length == 1, "expected exactly one resolved outcome")
      assert(out.head.getAs[Long]("paymentId") == 7L)
      assert(out.head.getAs[String]("status") == "processed")
    } finally {
      q.stop(); writer.interrupt(); server.close()
    }
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
