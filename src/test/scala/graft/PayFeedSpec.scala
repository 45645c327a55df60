package graft

import java.nio.file.Files

import graft.sources.{PayFeedConfig, PayFeedMicroBatchStream, PayFeedOffset, PayFeedPartition, PayFeedPartitionReader}
import graft.streaming.PaymentStream

/** The `payfeed` DataSourceV2 connector binding: short-name
  * resolution, option pass-through, malformed-record behavior, and
  * the offset/replay contract that makes checkpoint recovery
  * exactly-once.
  */
class PayFeedSpec extends SparkSuite {

  private def drain(p: PayFeedPartition): Seq[String] = {
    val r = new PayFeedPartitionReader(p)
    val out = Seq.newBuilder[String]
    while (r.next()) out += r.get().getString(0)
    out.result()
  }

  test("short format name resolves through raw(); options pass through to the records") {
    // 3 shards x 4 records x 2 rounds, set ONLY via .options(...): the
    // row count and dense id coverage prove each option reached the
    // partition planner and reader through the DSv2 chain
    val events = PaymentStream.fromFeed(spark, Map(
      "shards" -> "3", "recordsPerRound" -> "4", "rounds" -> "2"))
    val q = events.writeStream.format("memory").queryName("payfeed_opts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("payfeed_opts").collect()
        .map(_.getAs[Long]("paymentId")).sorted
      assert(ids.toSeq == (0L until 24L), s"expected ids 0..23, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("injected malformed records are dropped by the parse seam, others kept") {
    val events = PaymentStream.fromFeed(spark, Map(
      "shards" -> "2", "recordsPerRound" -> "10", "rounds" -> "1",
      "malformedEvery" -> "5"))
    val q = events.writeStream.format("memory").queryName("payfeed_poison")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("payfeed_poison").collect()
        .map(_.getAs[Long]("paymentId")).sorted
      // seqs 0,5,10,15 were corrupt → dropped; the remaining 16 parsed
      assert(ids.toSeq == (0L until 20L).filter(_ % 5 != 0),
        s"poison pills must vanish, the rest survive: got ${ids.toSeq}")
    } finally q.stop()
  }

  test("checkpoint resume reads only new rounds — no duplicates, no gaps") {
    val root = Files.createTempDirectory("payfeed-resume").toFile
    val out = new java.io.File(root, "out").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    def run(rounds: Int): Unit = {
      val q = PaymentStream.fromFeed(spark, Map(
        "shards" -> "2", "recordsPerRound" -> "3", "rounds" -> rounds.toString))
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(rounds = 2) // rounds 0-1 → ids 0..11
    run(rounds = 4) // feed advanced; resumed query must read ONLY rounds 2-3
    val ids = spark.read
      .schema("paymentId LONG, ts TIMESTAMP, kind STRING").json(out)
      .collect().map(_.getAs[Long]("paymentId")).sorted
    assert(ids.toSeq == (0L until 24L),
      s"each record exactly once across the restart, got ${ids.length} ids")
  }

  test("offsets round-trip their JSON form; replaying a range is bitwise identical") {
    val cfg = PayFeedConfig(shards = 2, recordsPerRound = 4, rounds = 8,
      malformedEvery = 3)
    val stream = new PayFeedMicroBatchStream(cfg)
    assert(stream.deserializeOffset("3").json() == "3")
    assert(stream.initialOffset().json() == "0")
    assert(stream.latestOffset().json() == "8")
    // the replayability contract behind checkpoint recovery: planning
    // the same (start, end] twice yields the same partitions and the
    // same bytes
    def plan(): Seq[Seq[String]] =
      stream.planInputPartitions(PayFeedOffset(2), PayFeedOffset(5))
        .map(p => drain(p.asInstanceOf[PayFeedPartition])).toSeq
    val (a, b) = (plan(), plan())
    assert(a == b, "same offset range must replay identical records")
    assert(a.map(_.size).sum == 2 * 4 * 3) // shards x rpr x rounds(2,5]
  }

  test("bad options fail loudly at planning, not silently default") {
    val props = new java.util.HashMap[String, String]()
    props.put("shards", "0")
    intercept[IllegalArgumentException](PayFeedConfig.from(props))
  }
}
