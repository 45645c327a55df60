package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.sources.InvoiceLog
import graft.streaming.{PaymentConfirm, PaymentMonitor, PaymentStream}

/** The outbound confirm leg (kinesis-pay.php:487-509): exactly one
  * AMOUNT_PAID record per FSM-resolved payment through the masked
  * InvoiceLog sink, surviving kill + checkpoint resume.
  */
class PaymentConfirmSpec extends SparkSuite {
  import spark.implicits._

  private def amounts = Seq(
    (1L, "KAU", BigDecimal("12.34"), BigDecimal("987.65")),
    (2L, "KAG", BigDecimal("55.00"), BigDecimal("44.10")),
    (3L, "KAU", BigDecimal("7.77"), BigDecimal("1.23")),
    (4L, "KAG", BigDecimal("9.99"), BigDecimal("3.21")))
    .toDF("paymentId", "currency", "kauAmount", "kagAmount")

  test("confirmRecords: processed only, amount picked by currency, reference text form") {
    val outcomes = Seq(
      (1L, "processed", Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:03:00")),
      (2L, "processed", Timestamp.valueOf("2024-01-01 10:01:00"),
        Timestamp.valueOf("2024-01-01 10:04:00")),
      (3L, "rejected", Timestamp.valueOf("2024-01-01 10:02:00"),
        Timestamp.valueOf("2024-01-01 10:05:00")),
      (4L, "expired", Timestamp.valueOf("2024-01-01 10:02:30"),
        Timestamp.valueOf("2024-01-01 10:12:30")))
      .toDF("paymentId", "status", "createdTs", "resolvedTs")
    val got = PaymentConfirm.confirmRecords(outcomes, amounts)
      .select("paymentId", "amount_paid").collect()
      .map(r => r.getAs[Long]("paymentId") -> r.getAs[String]("amount_paid"))
      .toMap
    // only terminal `processed` payments confirm; KAU rows take the
    // kau amount, KAG rows the kag amount (kinesis-pay.php:506-508)
    assert(got == Map(1L -> "12.34 KAU", 2L -> "44.10 KAG"))
  }

  test("confirm stream: exactly one masked confirm per resolved payment across kill/resume") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-confirm").toFile
    val out = new java.io.File(root, "out").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val input = MemoryStream[String]
    def start() = PaymentConfirm.confirmStream(
      PaymentMonitor.outcomes(PaymentStream.fromJson(input.toDF(), "value"),
        watermarkDelay = "0 seconds"),
      amounts, out, ckpt)
    val q1 = start()
    try {
      input.addData(
        """{"paymentId": 1, "ts": "2024-01-01T10:00:00", "kind": "create"}""",
        """{"paymentId": 1, "ts": "2024-01-01T10:03:00", "kind": "processed"}""",
        """{"paymentId": 2, "ts": "2024-01-01T10:04:00", "kind": "create"}""")
      q1.processAllAvailable()
    } finally q1.stop() // kill: p1 confirmed, p2 still pending
    // resume from the SAME checkpoint: p2's pending state survived;
    // p1 must NOT confirm again; a rejection must never confirm
    val q2 = start()
    try {
      input.addData(
        """{"paymentId": 2, "ts": "2024-01-01T10:06:00", "kind": "rejected"}""",
        """{"paymentId": 3, "ts": "2024-01-01T10:07:00", "kind": "create"}""",
        """{"paymentId": 3, "ts": "2024-01-01T10:08:00", "kind": "processed"}""")
      q2.processAllAvailable()
    } finally q2.stop()
    val log = spark.read.schema(
      "paymentId LONG, currency STRING, amount DECIMAL(12,2), " +
        "amount_paid STRING, resolvedTs TIMESTAMP").json(out)
      .where(col("paymentId").isNotNull) // empty replayed batches leave no rows
      .collect()
    val byId = log.groupBy(_.getAs[Long]("paymentId"))
    assert(byId.keySet == Set(1L, 3L),
      s"confirms for processed payments only, got ${log.toSeq}")
    assert(byId.values.forall(_.length == 1), "exactly one confirm each")
    val p1 = byId(1L).head
    // the audit sink masks digit runs in string columns
    // (kinesis-pay.php:459); the DECIMAL amount stays exact
    assert(p1.getAs[String]("amount_paid") == "***.*** KAU")
    assert(p1.getAs[java.math.BigDecimal]("amount").toPlainString == "12.34")
    assert(p1.getAs[String]("currency") == "KAU")
  }

  test("a replayed micro-batch overwrites its own output — no duplicate confirms") {
    val root = Files.createTempDirectory("graft-confirm-idem").toFile.getPath
    val outcomes = Seq((1L, "processed",
      Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-01 10:03:00")))
      .toDF("paymentId", "status", "createdTs", "resolvedTs")
    val confirms = PaymentConfirm.confirmRecords(outcomes, amounts)
    // crash-replay: foreachBatch delivers the SAME batchId twice
    InvoiceLog.writeBatch(confirms, root, batchId = 42L)
    InvoiceLog.writeBatch(confirms, root, batchId = 42L)
    val back = spark.read.schema(
      "paymentId LONG, currency STRING, amount DECIMAL(12,2), " +
        "amount_paid STRING, resolvedTs TIMESTAMP").json(root)
    assert(back.count() == 1, "same batch id must not append a second copy")
  }
}
