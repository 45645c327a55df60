package graft

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the native expressions: the codegen'd kernels
  * must agree with independent JVM reference computations on
  * generated inputs (unicode strings, arbitrary float vectors) — this
  * exercises the UTF8String byte handling and the generated-code path
  * that hand-picked vectors can't cover.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("hmac_sha256_hex agrees with javax.crypto on generated unicode inputs") {
    GraftFunctions.register(spark)
    val gen = for {
      data <- Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
        // incl. an astral-plane codepoint (surrogate pair in UTF-16)
        Gen.listOf(Gen.oneOf("é", "中", "𝄞", "ß", " "))
          .map(_.mkString))
      key <- Gen.asciiPrintableStr.suchThat(_.nonEmpty)
    } yield (data, key)
    val cases = sample(gen, 200)
    def expected(data: String, key: String): String = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key.getBytes("UTF-8"), "HmacSHA256"))
      mac.doFinal(data.getBytes("UTF-8"))
        .map(b => f"$b%02X").mkString
    }
    val got = cases.toDF("d", "k")
      .select(call_function("hmac_sha256_hex", col("d"), col("k")).as("h"))
      .as[String].collect()
    cases.zip(got).foreach { case ((d, k), h) =>
      assert(h == expected(d, k), s"mismatch for data=$d key=$k")
    }
  }

  test("cosine_sim agrees with direct double accumulation on generated vectors") {
    GraftFunctions.register(spark)
    val genVec = Gen.listOfN(16,
      Gen.chooseNum(-1000f, 1000f)).map(_.toArray)
    val cases = sample(Gen.zip(genVec, genVec), 200)
    def expected(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (a, b).zipped.foreach { (x, y) =>
        dot += x.toDouble * y.toDouble
        na += x.toDouble * x.toDouble; nb += y.toDouble * y.toDouble
      }
      dot / math.sqrt(na * nb)
    }
    val got = cases.toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), c) =>
      val e = expected(a, b)
      assert((e.isNaN && c.isNaN) || c == e, s"mismatch: got $c want $e")
    }
  }
}
