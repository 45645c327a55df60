package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps.{BandDoc, BandState}

/** Unit tests of the streaming near-dup band step against
  * TestGroupState — TTL eviction and re-admission cannot be
  * orchestrated through MemoryStream (StatusTtlStepSpec's rationale).
  */
class NearDupStepSpec extends AnyFunSuite {

  private val ttl = 60000L

  private def fresh = TestGroupState.create[BandState](
    Optional.empty[BandState](), GroupStateTimeout.ProcessingTimeTimeout,
    1000L, Optional.empty[Long](), hasTimedOut = false)

  test("first claimant is not flagged; later different text is; same text is not") {
    val st = fresh
    val out = StreamingOps.nearDupStep("b",
      Iterator(BandDoc("b", 3L, "md5-A"), BandDoc("b", 9L, "md5-B"),
        BandDoc("b", 11L, "md5-A")), st, ttl).toSeq
    assert(out.map(f => f.docId -> f.isNeardup) ==
      Seq(3L -> false, 9L -> true, 11L -> false))
    assert(st.get == BandState("md5-A"), "band stays claimed by the first doc")
    assert(st.getTimeoutTimestampMs.get() == 1000L + ttl,
      "TTL armed from batch processing time")
  }

  test("claim goes to the LOWEST docId regardless of iterator order (replay determinism)") {
    val st = fresh
    val out = StreamingOps.nearDupStep("b",
      Iterator(BandDoc("b", 9L, "md5-B"), BandDoc("b", 3L, "md5-A")), st, ttl)
      .toSeq
    assert(out.map(f => f.docId -> f.isNeardup) ==
      Seq(3L -> false, 9L -> true))
    assert(st.get == BandState("md5-A"))
  }

  test("TTL fire evicts the band; a re-arriving doc is re-admitted unflagged") {
    val fired = TestGroupState.create[BandState](
      Optional.of(BandState("md5-A")),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    assert(StreamingOps.nearDupStep("b", Iterator.empty, fired, ttl).isEmpty)
    assert(!fired.exists, "idle band must be evicted")
    // re-admission: the SAME near-dup text that would have been
    // flagged before eviction now claims the band fresh
    val st = fresh
    val out = StreamingOps.nearDupStep("b",
      Iterator(BandDoc("b", 20L, "md5-B")), st, ttl).toSeq
    assert(out == Seq(StreamingOps.NearDupFlag(20L, isNeardup = false, "b")))
  }
}
