package graft

import java.nio.file.Files

import graft.sources.InvoiceLog

class InvoiceLogSpec extends SparkSuite {
  import spark.implicits._

  test("JSONL round-trip with secret masking on write") {
    val dir = Files.createTempDirectory("invlog").toString + "/log"
    val df = Seq(
      (1L, "card 4111111111111111 ok", 10.5),
      (2L, "token=9999 paid", 20.0)
    ).toDF("invoice_id", "note", "amount")
    InvoiceLog.write(df, dir)
    val back = InvoiceLog.read(spark, dir, schemaOf = Some(df))
    val rows = back.orderBy("invoice_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("note") == "card *** ok")
    assert(rows(1).getAs[String]("note") == "token=*** paid")
    assert(rows(1).getAs[Double]("amount") == 20.0)
  }

  test("streaming JSONL sink appends redacted records") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("invstream").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val df = input.toDF().toDF("invoice_id", "note")
    val q = InvoiceLog.writeStream(df, s"$base/log", s"$base/ckpt")
    try {
      input.addData((1L, "card 4111 paid"), (2L, "ok"))
      q.processAllAvailable()
      val back = InvoiceLog.read(spark, s"$base/log", schemaOf = Some(df))
        .orderBy("invoice_id").collect()
      assert(back.length == 2)
      assert(back(0).getAs[String]("note") == "card *** paid")
    } finally q.stop()
  }
}
