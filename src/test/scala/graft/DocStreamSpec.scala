package graft

import java.io.File
import java.nio.file.Files

import graft.streaming.DocStream

/** End-to-end streaming corpus intake: JSONL files → cleaning gate →
  * lang-partitioned parquet, including kill + checkpoint resume.
  */
class DocStreamSpec extends SparkSuite {

  private val good =
    "the quick brown fox is one of the animals in the list of words"

  private def json(id: Long, text: String, lang: String,
      ts: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "$lang", """ +
      s""""source": "s0", "ingest_ts": "$ts"}"""

  test("clean pipeline: files through the gate into partitioned parquet, resume-safe") {
    val root = Files.createTempDirectory("graft-docstream").toFile
    val in = new File(root, "in"); in.mkdirs()
    val out = new File(root, "out").getPath
    val ckpt = new File(root, "ckpt").getPath
    def land(name: String, lines: String*): Unit = {
      val tmp = new File(root, name)
      Files.write(tmp.toPath, lines.mkString("\n").getBytes)
      assert(tmp.renameTo(new File(in, name)))
    }
    land("b1.jsonl",
      json(1, good, "en", "2024-01-01T10:00:00"),
      json(2, "too short", "en", "2024-01-01T10:00:01"), // token floor
      json(3, good, "en", "2024-01-01T10:00:02"),        // dup of 1
      "not json at all")                                  // poison pill
    val q1 = DocStream.cleanPipeline(spark, in.getPath, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    val first = spark.read.parquet(out)
    assert(first.collect().map(_.getAs[Long]("doc_id")).toSet == Set(1L))
    // kill + resume from the checkpoint: only the NEW file is processed
    land("b2.jsonl",
      json(4, good + " but a genuinely new variant of it", "fr",
        "2024-01-01T10:00:10"))
    val q2 = DocStream.cleanPipeline(spark, in.getPath, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val back = spark.read.parquet(out)
    assert(back.collect().map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L))
    // the sink is lang-partitioned: directories prune on read
    val dirs = new File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(dirs == Set("lang=en", "lang=fr"))
  }
}
