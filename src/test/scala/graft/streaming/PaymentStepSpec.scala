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

  test("random dup/late/replay sequences: exactly one outcome per lifecycle (property)") {
    // Simulates the micro-batch protocol around step() for one key:
    // data is processed with the PREVIOUS batch's watermark, then the
    // watermark advances to the max delivered event time (delay 0) and
    // any due timeout fires. Delivery is in event-time order (so no
    // event is late-filtered), batch boundaries are random.
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 40) {
      val c = 100000L
      // dup creates stay inside [c, c+expiry): within every retention
      // horizon by construction (post-horizon re-open has its own spec)
      val dupCreates = Seq.fill(rnd.nextInt(3))(
        c + 1 + rnd.nextInt(expiry.toInt - 2))
      val termKinds = Seq("processed", "rejected")
      val terminals = Seq.fill(rnd.nextInt(3))(
        (c + 1 + rnd.nextInt(2 * expiry.toInt - 2),
          termKinds(rnd.nextInt(2))))
        .filter(_._1 != c + expiry) // avoid the exact-boundary tie
      val events = ((c, "create") +: dupCreates.map(t => (t, "create"))
        ++: terminals.map { case (t, k) => (t, k) })
        .sortBy(_._1)
        .map { case (t, k) => PaymentEvent(1L, new Timestamp(t), k) }
      // random order-preserving batch split
      val batches = events.foldLeft(List(List.empty[PaymentEvent])) {
        (acc, e) =>
          if (rnd.nextBoolean() && acc.head.nonEmpty) List(e) :: acc
          else (acc.head :+ e) :: acc.tail
      }.reverse
      var stateOpt: Option[PaymentState] = None
      var timeoutMs: Option[Long] = None
      var wm = 0L
      val outs = scala.collection.mutable.ListBuffer.empty[PaymentOutcome]
      def call(evs: Seq[PaymentEvent], timedOut: Boolean): Unit = {
        val st = TestGroupState.create[PaymentState](
          stateOpt.map(Optional.of[PaymentState])
            .getOrElse(Optional.empty[PaymentState]()),
          GroupStateTimeout.EventTimeTimeout, 1000L, Optional.of(wm),
          hasTimedOut = timedOut)
        outs ++= PaymentMonitor.step(1L, evs.iterator, st, expiry)
        stateOpt = if (st.isRemoved || !st.exists) None else Some(st.get)
        timeoutMs =
          if (st.isRemoved) None
          else if (st.getTimeoutTimestampMs.isPresent)
            Some(st.getTimeoutTimestampMs.get)
          else timeoutMs
      }
      batches.foreach { b =>
        call(b, timedOut = false)
        wm = math.max(wm, b.map(_.ts.getTime).max)
        while (stateOpt.isDefined && timeoutMs.exists(_ < wm))
          call(Nil, timedOut = true)
      }
      wm = Long.MaxValue // final flush: every horizon passes
      while (stateOpt.isDefined && timeoutMs.exists(_ < wm))
        call(Nil, timedOut = true)
      // the contract: exactly ONE outcome, resolved by the FIRST
      // terminal if it was in-window, expired otherwise
      val ctx = s"trial=$trial events=${events.map(e => (e.ts.getTime, e.kind))}"
      assert(outs.size == 1, s"$ctx got $outs")
      val o = outs.head
      assert(o.createdTs.getTime == c, ctx)
      terminals.sortBy(_._1).headOption match {
        case Some((t, k)) if t - c <= expiry =>
          assert(o.status == k && o.resolvedTs.getTime == t, s"$ctx got $o")
        case _ =>
          assert(o.status == "expired" &&
            o.resolvedTs.getTime == c + expiry, s"$ctx got $o")
      }
      assert(stateOpt.isEmpty, s"$ctx state must drain after the flush")
    }
  }

  test("equal-timestamp terminal arriving BEFORE its create in one batch resolves") {
    val st = TestGroupState.create[PaymentState](
      Optional.empty[PaymentState](), GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(0L), hasTimedOut = false)
    // arrival order: terminal first — the (ts, kind) sort must put the
    // create ahead so the terminal is not buffered past it
    val out = PaymentMonitor.step(1L, Iterator(
      PaymentEvent(1L, new Timestamp(100000L), "processed"),
      PaymentEvent(1L, new Timestamp(100000L), "create")), st, expiry).toSeq
    assert(out.map(o => (o.status, o.resolvedTs.getTime)) ==
      Seq(("processed", 100000L)))
  }

  test("orphan buffer with no create drains silently at its horizon") {
    val st = TestGroupState.create[PaymentState](
      Optional.empty[PaymentState](), GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(0L), hasTimedOut = false)
    val out1 = PaymentMonitor.step(1L,
      Iterator(PaymentEvent(1L, new Timestamp(100000L), "processed")), st, expiry)
    assert(out1.isEmpty, "orphan terminal buffers, emits nothing")
    assert(st.get.createdMs == PaymentState.OrphanOnly)
    assert(st.getTimeoutTimestampMs.get() == 100000L + expiry)
    val fired = TestGroupState.create[PaymentState](
      Optional.of(st.get), GroupStateTimeout.EventTimeTimeout,
      2000L, Optional.of(100000L + expiry + 1), hasTimedOut = true)
    val out2 = PaymentMonitor.step(1L, Iterator.empty, fired, expiry)
    assert(out2.isEmpty, "unclaimed orphan drains with no outcome")
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
