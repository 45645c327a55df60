package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextOps

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("langId picks the dominant stopword language, unknown without markers") {
    val d = Seq(
      (0L, "the cat is on a mat of straw and wool"),
      (1L, "der hund und die katze ist im garten"),
      (2L, "le chat est dans la maison"),
      (3L, "el perro y los gatos es con nosotros"),
      (4L, "nothing matches these marker words whatsoever")
    ).toDF("doc_id", "text")
    val r = TextOps.langId(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("pred_lang")).toMap
    assert(r == Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "unknown"))
  }

  test("BPE-ish tokenizer: letter runs, digit runs, single symbols") {
    val n = Seq("ab 12 cd!").toDF("text")
      .select(size(TextFunctions.bpeIshTokens(col("text"))).as("n"))
      .as[Int].head()
    assert(n == 4) // ab, 12, cd, !
  }

  test("piiScrub replaces emails/urls/long digit runs and counts matches") {
    val d = Seq(
      (0L, "contact bob.smith@example.com or see https://example.com/a?b=1 id 12345678 ok"),
      (1L, "plain prose with a small number 42 in it")
    ).toDF("doc_id", "text")
    val r = TextOps.piiScrub(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("scrubbed"), x.getAs[Long]("n_email"),
          x.getAs[Long]("n_url"), x.getAs[Long]("n_num")))).toMap
    assert(r(0L) == (("contact <EMAIL> or see <URL> id <NUM> ok", 1L, 1L, 1L)))
    assert(r(1L) == (("plain prose with a small number 42 in it", 0L, 0L, 0L)))
  }

  test("repetitionRatio: duplicate-bigram fraction, short docs excluded") {
    val d = Seq(
      (0L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
      (1L, "all distinct words here"),
      (2L, "single")       // < 2 tokens: excluded
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionRatio(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_bigrams"), x.getAs[Long]("n_distinct"),
          x.getAs[Double]("rep_ratio")))).toMap
    assert(r(0L) == ((5L, 2L, 1.0 - 2.0 / 5.0)))
    assert(r(1L) == ((3L, 3L, 0.0)))
    assert(!r.contains(2L))
  }

  test("unigramLogProb: rare-token docs score lower than common-token docs") {
    // corpus: x appears 3 times, y once (total 4)
    val d = Seq((0L, "x x"), (1L, "x y")).toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Double]("avg_logprob")))).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lnX = r6(math.log(3.0 / 4.0)); val lnY = r6(math.log(1.0 / 4.0))
    assert(r(0L)._1 == 2L && r6(r(0L)._2) == r6(lnX.toDouble))
    assert(r(1L)._1 == 2L &&
      r6(r(1L)._2) == r6(((lnX + lnY) / 2).toDouble))
    assert(r(1L)._2 < r(0L)._2, "the rare-token doc must score lower")
  }

  test("rolling fingerprint is order-sensitive and deterministic") {
    val fps = Seq((0L, "a b"), (1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextOps.fingerprint(fps).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("fingerprint")).toMap
    assert(r(0L) == r(2L))
    assert(r(0L) != r(1L))
  }

  test("multimodal metadata: byte length and md5 checksum of payload") {
    val d = Seq((7L, "hello")).toDF("doc_id", "text")
    val r = TextOps.multimodalMeta(d).collect().head
    assert(r.getAs[Long]("n_bytes") == 5L)
    assert(r.getAs[String]("checksum") == "5d41402abc4b2a76b9719d911017c592")
    assert(Set("jpeg", "png", "webp").contains(r.getAs[String]("format")))
  }

  test("cleanCorpus: drops short/low-quality docs, keeps first of dups") {
    val longGood = "the cat and the dog of a house is here and the end of it all"
    val d = Seq(
      (0L, longGood, "en", "s1"),
      (1L, longGood, "en", "s2"),                        // exact dup of 0
      (2L, "short text", "en", "s1"),                    // too short
      (3L, "xx yy zz aa bb cc dd ee ff gg hh ii", "en", "s1") // no stopwords
    ).toDF("doc_id", "text", "lang", "source")
    val kept = TextOps.cleanCorpus(d).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(0L))
  }

  test("trainSplit: deterministic, partitions every doc exactly once") {
    val d = (0L until 200L).map(i => (i, s"document number $i with words", "en"))
      .toDF("doc_id", "text", "lang")
    val r1 = TextOps.trainSplit(d).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"))).toMap
    val r2 = TextOps.trainSplit(d).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"))).toMap
    assert(r1 == r2)
    assert(r1.values.sum == 200L)
    assert(r1.keySet.subsetOf(Set("train", "val", "test")))
    assert(r1("train") > r1.getOrElse("val", 0L))
  }

  test("lengthHist: fixed-width buckets account for every doc and token") {
    val d = Seq(
      (0L, "a b c", "en"),                         // 3 tokens -> bucket 0
      (1L, (1 to 17).map(i => s"t$i").mkString(" "), "en"), // 17 -> bucket 16
      (2L, (1 to 16).map(i => s"t$i").mkString(" "), "en"), // 16 -> bucket 16
      (3L, "x y", "de")                            // 2 tokens -> bucket 0
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.lengthHist(d, width = 16).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[Long]("bucket_lo")) ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("sum_tokens")))).toMap
    assert(r == Map(
      ("en", 0L) -> ((1L, 3L)),
      ("en", 16L) -> ((2L, 33L)),
      ("de", 0L) -> ((1L, 2L))))
  }

  test("vocabTopK and bigramTopK count correctly") {
    val d = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val v = TextOps.vocabTopK(d, k = 2).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n"))).toMap
    assert(v == Map("a" -> 3L, "b" -> 2L))
    val b = TextOps.bigramTopK(d, k = 1).collect()
    assert(b.head.getAs[String]("bigram") == "a b" && b.head.getAs[Long]("n") == 2L)
  }

  test("Tables.registerAll exposes the star schema to spark.sql") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM events WHERE value > 0").head().getLong(0) > 0)
  }

  test("maskSecret redacts digit runs") {
    val m = Seq("key=1234 user 56 ok").toDF("s")
      .select(TextFunctions.maskSecret(col("s")).as("m")).as[String].head()
    assert(m == "key=*** user *** ok")
  }
}
