package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CorpusStore, Tables}

class CorpusStoreSpec extends SparkSuite {

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("write/read round-trips and prunes partitions on the read side") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    CorpusStore.write(docs, dir)
    val back = CorpusStore.read(spark, dir)
    // round trip preserves every row (lang comes back as a partition col)
    assert(back.count() == docs.count())
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val backLang = back.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(backLang == perLang)
    // a lang filter becomes a PARTITION filter — whole directories are
    // skipped at planning, the 100 TB read-path contract
    val en = back.where(col("lang") === "en")
    val p = en.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"lang filter must prune partitions:\n$p")
    assert(en.count() == perLang("en"))
  }

  test("one file per partition value (no small-files explosion)") {
    val dir = Files.createTempDirectory("graft-corpus2").toString
    CorpusStore.write(docs, dir)
    val langDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    langDirs.foreach { d =>
      val parquets = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parquets.length == 1,
        s"${d.getName}: expected 1 file, got ${parquets.length}")
    }
  }
}
