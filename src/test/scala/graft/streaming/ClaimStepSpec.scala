package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps.{BandState, ClaimDoc}

/** Unit tests of the composed curation chain's band-claim step
  * (TestGroupState — the NearDupStepSpec rationale): one keyed state
  * subsumes exact dedup AND the near-dup candidate flag.
  */
class ClaimStepSpec extends AnyFunSuite {

  private val ttl = 60000L

  private def doc(id: Long, md5: String) =
    ClaimDoc("b", id, md5, s"text-$id", "en", "s", 10L, 0.5)

  private def fresh = TestGroupState.create[BandState](
    Optional.empty[BandState](), GroupStateTimeout.ProcessingTimeTimeout,
    1000L, Optional.empty[Long](), hasTimedOut = false)

  test("claimant kept; same-md5 later doc is exact_dup; different md5 is near_dup") {
    val st = fresh
    val out = StreamingOps.claimStep("b",
      Iterator(doc(3L, "md5-A"), doc(9L, "md5-B"), doc(11L, "md5-A")),
      st, ttl).toSeq
    assert(out.map(c => c.docId -> c.verdict) ==
      Seq(3L -> "kept", 9L -> "near_dup", 11L -> "exact_dup"))
    // the payload rides through untouched (the sink lands it)
    assert(out.head.text == "text-3" && out.head.lang == "en" &&
      out.head.nTok == 10L)
    assert(st.get == BandState("md5-A"), "band stays claimed by the first doc")
    assert(st.getTimeoutTimestampMs.get() == 1000L + ttl)
  }

  test("claim goes to the LOWEST docId regardless of iterator order " +
      "(replay determinism + the batch keep-first convention)") {
    val st = fresh
    val out = StreamingOps.claimStep("b",
      Iterator(doc(9L, "md5-A"), doc(3L, "md5-A")), st, ttl).toSeq
    assert(out.map(c => c.docId -> c.verdict) ==
      Seq(3L -> "kept", 9L -> "exact_dup"))
  }

  test("TTL fire evicts the claim; a re-arriving doc re-claims fresh") {
    val fired = TestGroupState.create[BandState](
      Optional.of(BandState("md5-A")),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    assert(StreamingOps.claimStep("b", Iterator.empty, fired, ttl).isEmpty)
    assert(!fired.exists, "idle claim must be evicted")
    val st = fresh
    val out = StreamingOps.claimStep("b",
      Iterator(doc(20L, "md5-B")), st, ttl).toSeq
    assert(out.map(c => c.docId -> c.verdict) == Seq(20L -> "kept"))
  }
}
