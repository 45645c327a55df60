package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps.{RawEv, UserStatus}

/** Direct unit tests of the TTL latest-status step against Spark's
  * TestGroupState — the eviction/re-admission protocol cannot be
  * orchestrated through MemoryStream (PaymentStepSpec's rationale:
  * data is processed before timeouts, and processAllAvailable runs
  * its own extra micro-batches).
  */
class StatusTtlStepSpec extends AnyFunSuite {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val ttl = 60000L

  test("first event creates state and arms the TTL") {
    val st = TestGroupState.create[UserStatus](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty(), hasTimedOut = false)
    val out = StreamingOps.statusTtlStep(7L,
      Iterator(RawEv(7L, "pending", ts("2024-01-01 10:00:00"), 1L)), st, ttl).toSeq
    assert(out.map(_.lastStatus) == Seq("pending"))
    assert(st.get.lastStatus == "pending")
    assert(st.getTimeoutTimestampMs.get() == 1000L + ttl,
      "TTL armed from batch processing time")
  }

  test("activity renews the TTL and applies the same event-time argmax as batch") {
    val prior = UserStatus(7L, "pending", ts("2024-01-01 10:00:00"), 1L)
    val st = TestGroupState.create[UserStatus](
      Optional.of(prior), GroupStateTimeout.ProcessingTimeTimeout,
      30000L, Optional.empty(), hasTimedOut = false)
    val out = StreamingOps.statusTtlStep(7L,
      Iterator(RawEv(7L, "processed", ts("2024-01-01 10:05:00"), 2L),
        RawEv(7L, "rejected", ts("2024-01-01 10:01:00"), 3L)), st, ttl).toSeq
    assert(out.map(_.lastStatus) == Seq("processed"),
      "event-time argmax, not arrival order")
    assert(st.getTimeoutTimestampMs.get() == 30000L + ttl, "activity renews TTL")
  }

  test("idle past TTL: evicted silently; re-appearing key re-admits fresh") {
    val prior = UserStatus(7L, "processed", ts("2024-01-01 10:05:00"), 2L)
    val fired = TestGroupState.create[UserStatus](
      Optional.of(prior), GroupStateTimeout.ProcessingTimeTimeout,
      30000L + ttl + 1, Optional.empty(), hasTimedOut = true)
    assert(StreamingOps.statusTtlStep(7L, Iterator.empty, fired, ttl).isEmpty)
    assert(fired.isRemoved, "idle key must be evicted")
    // re-admission: fresh state, pre-eviction history forgotten — an
    // event OLDER than the evicted status still re-creates the key
    val st = TestGroupState.create[UserStatus](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      200000L, Optional.empty(), hasTimedOut = false)
    val out = StreamingOps.statusTtlStep(7L,
      Iterator(RawEv(7L, "create", ts("2024-01-01 09:00:00"), 4L)), st, ttl).toSeq
    assert(out.map(_.lastStatus) == Seq("create"))
    assert(st.get.lastStatus == "create")
    assert(st.getTimeoutTimestampMs.get() == 200000L + ttl)
  }
}
