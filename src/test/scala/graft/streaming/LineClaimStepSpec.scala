package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps.{LineOcc, LineSeen}

/** Unit tests of the streaming line-claim step against TestGroupState
  * — TTL eviction and re-admission cannot be orchestrated through
  * MemoryStream (StatusTtlStepSpec's rationale).
  */
class LineClaimStepSpec extends AnyFunSuite {

  private val ttl = 60000L
  private val h = "linehash"

  private def fresh = TestGroupState.create[LineSeen](
    Optional.empty[LineSeen](), GroupStateTimeout.ProcessingTimeTimeout,
    1000L, Optional.empty[Long](), hasTimedOut = false)

  test("first occurrence claims and keeps; later occurrences drop; " +
      "the claim goes to the LOWEST (docId, lineId) regardless of " +
      "iterator order") {
    val st = fresh
    val out = StreamingOps.lineClaimStep(h, Iterator(
      LineOcc(h, 9L, 0L, "boiler"), LineOcc(h, 3L, 2L, "boiler"),
      LineOcc(h, 3L, 1L, "boiler")), st, ttl).toSeq
    assert(out.map(f => (f.docId, f.lineId) -> f.keep) ==
      Seq((3L, 1L) -> true, (3L, 2L) -> false, (9L, 0L) -> false))
    assert(st.get == LineSeen(3L, 1L), "owner is the lexicographic min")
    assert(st.getTimeoutTimestampMs.get() == 1000L + ttl,
      "TTL armed from batch processing time")
  }

  test("a replayed OWNER occurrence keeps again (retry idempotence); " +
      "a new occurrence against the held claim drops") {
    val held = TestGroupState.create[LineSeen](
      Optional.of(LineSeen(3L, 1L)),
      GroupStateTimeout.ProcessingTimeTimeout,
      2000L, Optional.empty[Long](), hasTimedOut = false)
    val out = StreamingOps.lineClaimStep(h, Iterator(
      LineOcc(h, 3L, 1L, "boiler"), LineOcc(h, 12L, 0L, "boiler")),
      held, ttl).toSeq
    assert(out.map(f => (f.docId, f.lineId) -> f.keep) ==
      Seq((3L, 1L) -> true, (12L, 0L) -> false))
    assert(held.get == LineSeen(3L, 1L), "the claim never migrates")
  }

  test("TTL fire evicts the line; a re-arriving copy re-claims fresh") {
    val fired = TestGroupState.create[LineSeen](
      Optional.of(LineSeen(3L, 1L)),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    assert(StreamingOps.lineClaimStep(h, Iterator.empty, fired, ttl)
      .isEmpty)
    assert(!fired.exists, "idle line must be evicted")
    val st = fresh
    val out = StreamingOps.lineClaimStep(h,
      Iterator(LineOcc(h, 20L, 5L, "boiler")), st, ttl).toSeq
    assert(out.map(f => (f.docId, f.lineId) -> f.keep) ==
      Seq((20L, 5L) -> true))
    assert(st.get == LineSeen(20L, 5L))
  }
}
