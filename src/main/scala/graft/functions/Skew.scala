package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins.
  *
  * AQE's runtime skew-join split handles moderately skewed sort-merge
  * joins, but a single mega-key (one customer with 10^9 events) still
  * lands on one task when the build side can't broadcast. The classic
  * fix is salting: spread the probe side over `buckets` pseudo-keys
  * and replicate the build side once per bucket.
  */
object Skew {

  /** Equi-join `fact` (large, possibly skewed) with `dim` (too big to
    * broadcast comfortably, far smaller than fact) on `key`, salted
    * into `buckets` sub-keys: fact rows scatter by a per-row hash, dim
    * rows replicate `buckets`×. Same rows as a plain inner join, but
    * the hot key's work spreads over `buckets` tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
