package graft

import org.apache.spark.sql.functions._

/** Proves SURVEY §5's co-located join claim: two tables bucketed on
  * the join key merge with **zero Exchange** in the plan — the layout
  * that turns a daily 100 TB fact-fact join from a full shuffle into
  * a local merge.
  */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle") {
    val n = 1000
    val a = (0 until n).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (0 until n).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bkt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"co-bucketed join must not shuffle:\n$p")
      assert(joined.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
