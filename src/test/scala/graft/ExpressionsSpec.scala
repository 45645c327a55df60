package graft

import org.apache.spark.sql.functions._

/** Known-answer tests for the native codegen expressions. */
class ExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("hmac_sha256_hex matches RFC 4231 vectors, upper-hex (PHP parity)") {
    GraftFunctions.register(spark)
    // RFC 4231 test case 2 (printable key/data).
    val r1 = spark.sql(
      "SELECT hmac_sha256_hex('what do ya want for nothing?', 'Jefe') AS h")
      .as[String].head()
    assert(r1 ==
      "5BDCC146BF60754E6A042426089575C75A003F089D2739839DEC58B964EC3843")
    // RFC 4231 test case 1: key = 20 bytes of 0x0b (valid single-byte
    // UTF-8 chars, so a String key carries the exact key bytes).
    val key = "\u000b" * 20
    val r2 = Seq(("Hi There", key)).toDF("d", "k")
      .select(call_function("hmac_sha256_hex", col("d"), col("k")).as("h"))
      .as[String].head()
    assert(r2 ==
      "B0344C61D8DB38535CA8AFCEAF0BF12B881DC200C9833DA726E9376C2E32CFF7")
  }

  test("hmac_sha256_hex is null-safe and works in whole-stage codegen") {
    GraftFunctions.register(spark)
    val out = Seq(Some("msg"), None).toDF("d")
      .select(call_function("hmac_sha256_hex", col("d"), lit("k")).as("h"))
      .as[Option[String]].collect()
    assert(out.count(_.isDefined) == 1 && out.count(_.isEmpty) == 1)
  }

  test("hmac_sha256_hex: empty key matches PHP hash_hmac semantics") {
    GraftFunctions.register(spark)
    // php: strtoupper(hash_hmac('sha256', '', '')) — HMAC zero-pads
    // the empty key to the block size
    val r = spark.sql("SELECT hmac_sha256_hex('', '') AS h").as[String].head()
    assert(r ==
      "B613679A0814D9EC772F95D778C35FC5FF1697C493715653C6C712144292C5AD")
  }

  test("cosine_sim/dot_f32: null array elements yield NaN, not zero-substitution") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c,
        |        dot_f32(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d
        |""".stripMargin).collect().head
    assert(got.getDouble(0).isNaN && got.getDouble(1).isNaN)
  }

  test("minhash_sketch is safe for raw full-range 64-bit hash inputs") {
    GraftFunctions.register(spark)
    val sig = spark.sql(
      """SELECT minhash_sketch(h1, h2, 8) AS sig
        |FROM (SELECT xxhash64(v) AS h1, xxhash64(41, v) AS h2
        |      FROM VALUES ('a'), ('b'), ('c') AS t(v))""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(sig.length == 8)
    assert(sig.forall(v => v >= 0 && v < 2147483647L),
      s"sketch values must stay in [0, p): $sig")
  }

  test("native expressions: interpreted and codegen paths agree on edge inputs") {
    GraftFunctions.register(spark)
    // The doGenCode implementations are the hot path; the interpreted
    // eval() is the fallback Spark silently switches to (codegen
    // compile failure, FALLBACK mode, expression-tree size limits). A
    // divergence would be a silent wrong-answer, so pin equality on
    // the edge inputs: nulls, null elements, empties, length
    // mismatches, zero norms, unicode/empty strings.
    val rows = Seq(
      (Some(Array(1f, 2f, 3f)), Some(Array(4f, 5f, 6f)), Some("msg"), Some("key")),
      (Some(Array(0f, 0f, 0f)), Some(Array(1f, 1f, 1f)), Some(""), Some("k")),
      (Some(Array(1f, 2f)), Some(Array(1f, 2f, 3f)), Some("mixed \u00e9\u4e2d"), Some("")),
      (Some(Array.empty[Float]), Some(Array.empty[Float]), None, Some("k")),
      (None, Some(Array(1f)), Some("m"), None),
      (Some(Array(1f, Float.NaN)), Some(Array(1f, 1f)), Some("m"), Some("k")))
    def run(): Seq[String] = {
      import spark.implicits._
      rows.toDF("a", "b", "s", "k")
        .selectExpr("cosine_sim(a, b) AS c", "dot_f32(a, b) AS d",
          "hmac_sha256_hex(s, k) AS h", "deflate_len(s) AS z")
        .collect().map(_.toString).toSeq
    }
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = run()
      assert(interpreted == viaCodegen,
        s"interpreted/codegen divergence:\n$interpreted\nvs\n$viaCodegen")
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("deflate_len matches a direct JDK Deflater reference, null-safe") {
    GraftFunctions.register(spark)
    import java.util.zip.Deflater
    def ref(s: String): Long = {
      val d = new Deflater(6)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val inputs = Seq("", "spam " * 500, "unicode é中文 text",
      (0 until 300).map(i => s"w${i * 7919}").mkString(" "))
    val got = inputs.toDF("s")
      .select(call_function("deflate_len", col("s")).as("z"))
      .as[Long].collect().toSeq
    assert(got == inputs.map(ref), "deflate_len must equal the JDK zlib at level 6")
    // repetition compresses far below diversity at equal length
    assert(ref("spam " * 500) < ref((0 until 500).map(i => s"w$i").mkString(" ")))
    val nulls = Seq(Some("x"), None).toDF("s")
      .select(call_function("deflate_len", col("s")).as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(nulls.count(_.isEmpty) == 1 && nulls.count(_.isDefined) == 1)
  }

  test("cosine_sim matches hand-computed value") {
    GraftFunctions.register(spark)
    val got = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
      .as[Double].head()
    val want = 32.0 / math.sqrt(14.0 * 77.0)
    assert(math.abs(got - want) < 1e-15)
  }

  test("cosine_sim: NaN on length mismatch and empty arrays") {
    GraftFunctions.register(spark)
    val got = Seq(
      (Array(1f, 2f), Array(1f, 2f, 3f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(got.forall(_.isNaN))
  }

  test("nfkc_normalize: UAX #15 known answers — ligature, superscript, " +
      "full-width, combining composition; ASCII identity; null-safe") {
    GraftFunctions.register(spark)
    val got = Seq(
      Some("ﬁle x² Ａ"),          // ligature + superscript + full-width
      Some("café"),          // e + combining acute composes to é
      Some("plain ascii 123"),     // fast path: identity
      Some("１２３"),  // full-width digits
      None)
      .toDF("t")
      .select(call_function("nfkc_normalize", col("t")).as("n"))
      .as[Option[String]].collect()
    assert(got(0).contains("file x2 A"), s"got ${got(0)}")
    assert(got(1).contains("café"), s"got ${got(1)}")
    assert(got(2).contains("plain ascii 123"))
    assert(got(3).contains("123"), s"got ${got(3)}")
    assert(got(4).isEmpty, "null must stay null")
  }
}
