package graft

import graft.functions.Skew

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain equi-join") {
    // one mega-key (0) plus a uniform tail — the shape salting exists for
    val fact = ((0 until 5000).map(i => (0L, i.toLong)) ++
      (0 until 500).map(i => ((i % 50 + 1).toLong, i.toLong)))
      .toDF("k", "v")
    val dim = (0L until 51L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    val fact = (0 until 1000).map(i => (0L, i.toLong)).toDF("k", "v")
    val dim = Seq((0L, "hot")).toDF("k", "name")
    // distinct salts actually used by the hot key's rows
    val salts = fact.withColumn("_salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.monotonically_increasing_id()),
        org.apache.spark.sql.functions.lit(8)))
      .select("_salt").distinct().count()
    assert(salts > 1, "salting must distribute rows across buckets")
    assert(Skew.saltedJoin(fact, dim, "k", 8).count() == 1000)
  }
}
