package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit tests of the FSM step against Spark's TestGroupState —
  * the only way to pin the timeout-clamp regression: data is processed
  * before timeouts fire, so a replayed event can arrive in the very
  * micro-batch in which the key's stored deadline has already fallen
  * below the watermark, and an unclamped setTimeoutTimestamp throws
  * IllegalArgumentException and kills the query.
  */
class PaymentStepSpec extends AnyFunSuite {

  private val expiry = 60000L

  test("replay after the marker deadline passed the watermark: clamped, no crash, no output") {
    // resolved at t=100s, marker deadline = 160s; watermark already 200s
    val st = TestGroupState.create[PaymentState](
      Optional.of(PaymentState(50000L, Some(100000L))),
      GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(200000L), hasTimedOut = false)
    // replayed create with event time >= watermark (not late-filtered)
    val out = PaymentMonitor.step(1L,
      Iterator(PaymentEvent(1L, new Timestamp(210000L), "create")), st, expiry)
    assert(out.isEmpty, "marker must swallow the replayed create")
    // unclamped would have thrown on setTimeoutTimestamp(160000 < wm)
    assert(st.getTimeoutTimestampMs.get() == 200001L,
      "timeout must clamp to watermark + 1 so it fires next batch")
  }

  test("pending payment past its deadline in the same batch: clamped, expiry still fires") {
    // created at t=100s, deadline 160s; watermark already 200s; a dup
    // create (ignored) arrives — state must survive with a firable timeout
    val st = TestGroupState.create[PaymentState](
      Optional.of(PaymentState(100000L, None)),
      GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(200000L), hasTimedOut = false)
    val out = PaymentMonitor.step(1L,
      Iterator(PaymentEvent(1L, new Timestamp(205000L), "create")), st, expiry)
    assert(out.isEmpty)
    assert(st.getTimeoutTimestampMs.get() == 200001L)
    // the timeout then fires: unresolved -> expired at created + expiry
    val fired = TestGroupState.create[PaymentState](
      Optional.of(st.get), GroupStateTimeout.EventTimeTimeout,
      2000L, Optional.of(200002L), hasTimedOut = true)
    val outcome = PaymentMonitor.step(1L, Iterator.empty, fired, expiry).toSeq
    assert(outcome.map(o => (o.status, o.resolvedTs.getTime)) ==
      Seq(("expired", 160000L)))
    assert(fired.isRemoved)
  }

  test("in-window deadline is NOT clamped (normal path unchanged)") {
    val st = TestGroupState.create[PaymentState](
      Optional.empty[PaymentState](), GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(100000L), hasTimedOut = false)
    val out = PaymentMonitor.step(1L,
      Iterator(PaymentEvent(1L, new Timestamp(120000L), "create")), st, expiry)
    assert(out.isEmpty)
    assert(st.getTimeoutTimestampMs.get() == 180000L, "created + expiry")
  }
}
