package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CorpusStore, Tables}

class CorpusStoreSpec extends SparkSuite {

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def leafDirs(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
      .flatMap(_.listFiles())
      .filter(f => f.isDirectory && f.getName.startsWith("split=")).toSeq

  test("write/read round-trips and prunes lang AND split partitions") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    CorpusStore.write(CorpusStore.withSplit(docs), dir)
    val back = CorpusStore.read(spark, dir)
    // round trip preserves every row (lang/split come back as partition cols)
    assert(back.count() == docs.count())
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val backLang = back.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(backLang == perLang)
    // the stored split sizes equal TextOps.trainSplit's report — one
    // shared splitOf definition, asserted
    val stored = back.groupBy("split", "lang").count().collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("lang")) ->
        r.getAs[Long]("count")).toMap
    val reported = graft.operators.TextOps.trainSplit(docs).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("lang")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(stored == reported)
    // lang and split filters become PARTITION filters — whole
    // directories skipped at planning, the 100 TB read-path contract
    val pruned = back.where(col("lang") === "en" && col("split") === "train")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang") &&
      p.contains("split"), s"lang+split filters must prune partitions:\n$p")
    assert(pruned.count() == reported(("train", "en")))
  }

  test("one file per partition value (no small-files explosion)") {
    val dir = Files.createTempDirectory("graft-corpus2").toString
    CorpusStore.write(CorpusStore.withSplit(docs), dir)
    val leaves = leafDirs(dir)
    assert(leaves.nonEmpty)
    leaves.foreach { d =>
      val parquets = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parquets.length == 1,
        s"${d.getParentFile.getName}/${d.getName}: expected 1 file, got ${parquets.length}")
    }
  }

  test("salt fans a hot partition over up to `salt` files, no extra dirs") {
    val dir = Files.createTempDirectory("graft-corpus3").toString
    CorpusStore.write(CorpusStore.withSplit(docs), dir, salt = 3)
    val leaves = leafDirs(dir)
    assert(leaves.nonEmpty)
    // salt is a shuffle key, never a directory: layout is unchanged
    leaves.foreach { d =>
      assert(!d.listFiles().exists(_.isDirectory),
        s"salt must not create directories under ${d.getName}")
    }
    val counts = leaves.map(d =>
      d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(counts.forall(c => c >= 1 && c <= 3),
      s"each leaf has 1..salt files, got $counts")
    // the big partitions actually fan out (that is the point of salt)
    assert(counts.exists(_ > 1), s"expected some multi-file leaf, got $counts")
    // and the data still round-trips
    assert(CorpusStore.read(spark, dir).count() == docs.count())
  }

  test("writeWithManifest: counts match the data; data reads skip it") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val dir = Files.createTempDirectory("graft-corpus4").toString
    val split = CorpusStore.withSplit(docs)
    CorpusStore.writeWithManifest(split, dir)
    // data read is unchanged by the underscore-prefixed manifest dir
    val back = CorpusStore.read(spark, dir)
    assert(back.count() == docs.count())
    val manifest = CorpusStore.readManifest(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("split")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    val expected = split
      .select(col("lang"), col("split"),
        asize(graft.functions.TextFunctions.tokenize(col("text")))
          .cast("long").as("n"))
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rows) => k -> ((rows.length.toLong, rows.map(_.getAs[Long]("n")).sum)) }
    assert(manifest == expected,
      s"manifest must equal the written data's counts")
    // one coalesced manifest file
    val mFiles = new java.io.File(s"$dir/_manifest")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(mFiles == 1, s"manifest must be one file, got $mFiles")
  }
}
