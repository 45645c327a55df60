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

  test("skewReport: hot key surfaces with exact integer share/skew and " +
      "the salt factor saltedJoin would want") {
    // key 0 carries 900 of 1000 rows over 11 keys: share 900000 ppm,
    // skew 900*11/1000 = 9.9 -> 9900 milli, salt ceil(9.9) = 10
    val df = ((0 until 900).map(i => (0L, i)) ++
      (0 until 100).map(i => ((i % 10 + 1).toLong, i))).toDF("k", "v")
    val r = Skew.skewReport(df, "k", k = 3).collect()
      .map(x => (x.getAs[String]("key"), x.getAs[Long]("cnt"),
        x.getAs[Long]("share_ppm"), x.getAs[Long]("skew_milli"),
        x.getAs[Long]("salt_factor")))
    assert(r.head == (("0", 900L, 900000L, 9900L, 10L)), s"got ${r.head}")
    // rank ties on cnt=10 break by key string; k bounds the output
    assert(r.length == 3 && r(1)._2 == 10L && r(1)._1 < r(2)._1)
    // the cap: skew = cnt·n_keys/total ≈ 100000·101/101000 ≈ 100 → 32
    val mega = ((0 until 100000).map(i => (0L, i)) ++
      (1 to 100).map(k => (k.toLong, 0))).toDF("k", "v")
    val m = Skew.skewReport(mega, "k", k = 1).collect().head
    assert(m.getAs[Long]("salt_factor") == 32L)
    // empty input: empty report, not a crash
    assert(Skew.skewReport(Seq.empty[(Long, Int)].toDF("k", "v"), "k")
      .count() == 0)
  }
}
