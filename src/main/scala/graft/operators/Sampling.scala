package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded deterministic corpus sampling — the ONE idiom behind every
  * driver-trained model in this library (PQ codebooks, the quality
  * probe): the `n` rows with the smallest `xxhash64(id)`, hash order
  * rather than id order. At 100 TB the low ids are a time/source-
  * ordered PREFIX, so an `id < bound` sample trains on one slice of
  * the corpus while claiming to represent all of it; ordering by a
  * deterministic hash of the id makes the sample span the whole id
  * range (spec-asserted in [[graft.SamplingSpec]]) while staying
  * bitwise reproducible — no RNG, no `sample()` seed drift across
  * partition layouts.
  *
  * Cost shape is the classic top-N: Catalyst compiles the
  * orderBy+limit to TakeOrderedAndProject — per-partition top-`n`
  * then one constant-size driver merge, O(scan) with no global sort
  * materialization. Callers MUST apply this to the cheapest
  * sufficient projection and derive expensive features from the
  * limited result, not before it (sampling a derived frame would run
  * the derivation over the entire corpus just to keep `n` rows —
  * the trap [[graft.operators.Curation.trainProbe]] round 7 shipped
  * and round 8 removed).
  *
  * `n <= 0` clamps to the empty frame (same schema), preserving the
  * loud-but-safe degrade paths of the callers (an empty sample →
  * untrained prior) instead of the AnalysisException a negative
  * `limit` would throw.
  */
object Sampling {
  def hashOrdered(df: DataFrame, idCol: String, n: Long): DataFrame =
    df.orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(n.max(0L).min(Int.MaxValue.toLong).toInt)
}
