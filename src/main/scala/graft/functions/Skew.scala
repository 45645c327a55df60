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

  /** Key-skew AUDIT frame — the measurement that decides whether
    * [[saltedJoin]] (or AQE's skew split) is needed at all, published
    * as a query instead of a guess: the top-`k` hottest keys with
    * their share of all rows, their skew factor (count ÷ mean count
    * per key), and the salt factor [[saltedJoin]] would want for them
    * (⌈skew⌉, capped at 32 — beyond that the per-bucket row count is
    * no longer the bottleneck). A run of this on the join key ahead
    * of a 100 TB join is one aggregate over the key column only.
    *
    * Plan: one keyed count aggregate (map-side partial), a single-row
    * totals broadcast, rank-≤-k through WindowGroupLimit (the
    * aggregated key set is the window input, never the corpus).
    * Determinism (§5b): share and skew are emitted as FLOORED integer
    * ppm / milli units — `round()` on a quotient of exact counts hits
    * decimal midpoints where the engines' rounding modes differ
    * (HALF_UP vs half-even: measured on the gate data at the second
    * decimal), while floor of the one IEEE division is bit-identical;
    * rank ties break on the key string.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("cnt").desc, col("key"))
    counts.withColumn("rnk", rank().over(w)).where(col("rnk") <= k)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"),
        // DIVISION FIRST, then scale: the integer products
        // (cnt·n_keys·1000) overflow BIGINT under ANSI at 10^12-row
        // scale, while (cnt/total) is one IEEE division both engines
        // compute identically and the double multiplies that follow
        // are exact-operand IEEE ops — overflow-free at any scale
        floor(col("cnt") / col("total") * lit(1000000L)).cast("long")
          .as("share_ppm"),
        floor(col("cnt") / col("total") * col("n_keys") * lit(1000L))
          .cast("long").as("skew_milli"),
        least(lit(32L),
          ceil(col("cnt") / col("total") * col("n_keys")).cast("long"))
          .as("salt_factor"))
  }
}
