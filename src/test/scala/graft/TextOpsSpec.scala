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

  test("maskSecret redacts digit runs") {
    val m = Seq("key=1234 user 56 ok").toDF("s")
      .select(TextFunctions.maskSecret(col("s")).as("m")).as[String].head()
    assert(m == "key=*** user *** ok")
  }
}
