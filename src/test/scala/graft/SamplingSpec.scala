package graft

import graft.operators.{Curation, Sampling, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The bounded-deterministic-sampling contract behind every
  * driver-trained model (PQ codebooks, the quality probe): the sample
  * spans the id range (hash order, not an id prefix), is bitwise
  * reproducible, and degrades to empty — never throws — at n <= 0.
  */
class SamplingSpec extends SparkSuite {

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("hashOrdered: sampled ids span the id range — not a prefix") {
    val n: Long = emb.count()
    val sampleN: Int = math.max(8L, n / 4L).toInt // strictly < corpus
    assert(sampleN < n, s"gate corpus too small for a span test: $n")
    val ids: Array[Long] =
      Sampling.hashOrdered(emb.select("vec_id"), "vec_id", sampleN.toLong)
        .collect().map(_.getLong(0)).sorted
    assert(ids.length == sampleN)
    val maxId: Long = emb.agg(max(col("vec_id"))).head().getLong(0)
    info(s"sample max id = ${ids.last}, corpus max id = $maxId")
    // a prefix sample tops out at sampleN-1; a spanning sample's max
    // lands near the corpus max (P(all of the hash-min quartile misses
    // the top decile of ids) is astronomically small)
    assert(ids.last >= (maxId.toDouble * 0.9).toLong,
      s"sample max ${ids.last} does not reach the top of the id range $maxId")
    val prefix: Array[Long] = Array.tabulate(sampleN)(_.toLong)
    assert(!java.util.Arrays.equals(ids, prefix),
      "sample is exactly the id prefix — hash ordering is not in effect")
  }

  test("hashOrdered: bitwise-identical sample across two runs") {
    val s1 = Sampling.hashOrdered(emb.select("vec_id"), "vec_id", 64)
      .collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.hashOrdered(emb.select("vec_id"), "vec_id", 64)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2)
  }

  test("hashOrdered: n <= 0 yields the empty frame, not an exception") {
    assert(Sampling.hashOrdered(emb, "vec_id", 0L).count() == 0L)
    assert(Sampling.hashOrdered(emb, "vec_id", -5L).count() == 0L)
  }

  test("hashOrdered compiles to TakeOrderedAndProject — no global sort") {
    val plan = Sampling.hashOrdered(emb.select("vec_id"), "vec_id", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-N, got:\n$plan")
  }

  test("pqCodebooks: bitwise-identical codebooks across two training runs") {
    val b1 = Similarity.pqCodebooks(emb)
    val b2 = Similarity.pqCodebooks(emb)
    assert(b1 == b2, "codebook training is not deterministic")
  }

  test("trainProbe: bitwise-identical weights across two runs") {
    val (w1, b1) = Curation.trainProbe(docs)
    val (w2, b2) = Curation.trainProbe(docs)
    assert(w1.toSeq == w2.toSeq && b1 == b2,
      "probe training is not deterministic")
    assert(w1.exists(_ != 0.0), "probe failed to train on the gate corpus")
  }

  test("trainProbe: sampleBound <= 0 degrades to the untrained prior") {
    val (w0, b0) = Curation.trainProbe(docs, sampleBound = 0)
    assert(w0.forall(_ == 0.0) && b0 == 0.0)
  }
}
