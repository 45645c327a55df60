package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A payment lifecycle event on the stream: `kind` is one of
  * `create | processed | rejected` (the reference's poll statuses,
  * kinesis-pay.php:239-249).
  */
case class PaymentEvent(paymentId: Long, ts: Timestamp, kind: String)

/** Terminal outcome of one payment: status is
  * `processed | rejected | expired`.
  */
case class PaymentOutcome(paymentId: Long, status: String,
    createdTs: Timestamp, resolvedTs: Timestamp)

/** State for one payment: `resolvedMs` is None while pending (awaiting
  * a terminal event or expiry) and Some(t) once a terminal outcome was
  * emitted at event-time t. The resolved marker is retained until the
  * watermark passes t + expiry so a duplicate/replayed `create` cannot
  * re-open an already-resolved payment (and emit a second outcome);
  * replays arriving later than that horizon are indistinguishable from
  * new payments — the same watermark-bounded contract as
  * `dropDuplicatesWithinWatermark`.
  *
  * A terminal event whose `create` has NOT arrived yet (cross-batch
  * delivery skew inside the watermark allowance) is BUFFERED rather
  * than dropped: `createdMs = PaymentState.OrphanOnly` with
  * orphanKind/orphanMs holding the earliest such terminal. When the
  * create lands, the buffered terminal resolves the payment exactly as
  * if it had arrived after it; if no create arrives before the
  * watermark passes orphanMs + expiry, the buffer is dropped silently
  * (a terminal with no lifecycle is unattributable).
  */
case class PaymentState(createdMs: Long, resolvedMs: Option[Long],
    orphanKind: Option[String] = None, orphanMs: Option[Long] = None)

object PaymentState {
  /** `createdMs` sentinel: state holds only a buffered orphan terminal. */
  val OrphanOnly: Long = Long.MinValue
}

/** Structured Streaming payment state machine — the reference's poll
  * loop re-expressed as distributed event-time state:
  * create → pending; processed/rejected event → terminal outcome;
  * no terminal event within `expiryMs` of creation → `expired`, fired
  * by an **event-time timeout** (the watermark, not wall clock) —
  * mirroring the 10-minute expiry + failsafe (kinesis-pay.php:210,
  * :264-268).
  *
  * Scale shape: state is partitioned by paymentId (one shuffle), a few
  * bytes per in-flight payment, and the watermark bounds state
  * retention — no unbounded growth at 100 TB/day event rates.
  */
object PaymentMonitor {

  val ExpiryMs: Long = 10 * 60 * 1000

  def outcomes(events: Dataset[PaymentEvent],
      watermarkDelay: String = "10 seconds",
      expiryMs: Long = ExpiryMs): Dataset[PaymentOutcome] = {
    implicit val outcomeEnc = Encoders.product[PaymentOutcome]
    implicit val stateEnc = Encoders.product[PaymentState]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.paymentId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (id: Long, evs: Iterator[PaymentEvent], state: GroupState[PaymentState]) =>
          step(id, evs, state, expiryMs))
  }

  /** One FSM step for one key. Visible for unit tests. */
  private[streaming] def step(id: Long, evs: Iterator[PaymentEvent],
      state: GroupState[PaymentState], expiryMs: Long): Iterator[PaymentOutcome] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return s.resolvedMs match {
        // Resolved-marker or orphan-buffer retention horizon passed:
        // drop silently (an orphan terminal with no create inside the
        // horizon is unattributable — no lifecycle to report on).
        case _ if s.createdMs == PaymentState.OrphanOnly => Iterator.empty
        case Some(_) => Iterator.empty
        // Watermark passed created+expiry with no terminal event: the
        // reference's failsafe expiry.
        case None => Iterator(PaymentOutcome(id, "expired",
          new Timestamp(s.createdMs), new Timestamp(s.createdMs + expiryMs)))
      }
    }
    // Tie-break at equal event time: a create processes BEFORE a
    // terminal — without it, arrival order (which carries no guarantee
    // across source files/partitions) would decide whether an
    // equal-timestamp terminal resolves the payment or gets buffered.
    val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, if (e.kind == "create") 0 else 1))
    var cur = state.getOption
    val out = Seq.newBuilder[PaymentOutcome]
    def resolve(created: Long, kind: String, termMs: Long): PaymentState = {
      if (termMs - created <= expiryMs)
        out += PaymentOutcome(id, kind,
          new Timestamp(created), new Timestamp(termMs))
      else // terminal event arrived after the window: expired
        out += PaymentOutcome(id, "expired",
          new Timestamp(created), new Timestamp(created + expiryMs))
      PaymentState(created, Some(termMs))
    }
    sorted.foreach { e =>
      e.kind match {
        case "create" if cur.forall(_.createdMs == PaymentState.OrphanOnly) =>
          val buffered = cur.flatMap(s => s.orphanKind.zip(s.orphanMs))
          cur = buffered match {
            // a buffered terminal at/after the create resolves it now
            // (cross-batch delivery skew inside the watermark horizon);
            // one strictly BEFORE the create is unattributable — drop
            case Some((k, oms)) if oms >= e.ts.getTime =>
              Some(resolve(e.ts.getTime, k, oms))
            case _ => Some(PaymentState(e.ts.getTime, None))
          }
        case "processed" | "rejected" =>
          cur match {
            case Some(s) if s.createdMs != PaymentState.OrphanOnly &&
                s.resolvedMs.isEmpty =>
              cur = Some(resolve(s.createdMs, e.kind, e.ts.getTime))
            case Some(s) if s.createdMs == PaymentState.OrphanOnly =>
              // keep the EARLIEST buffered terminal (the one a present
              // create would have resolved with)
              if (s.orphanMs.forall(_ > e.ts.getTime))
                cur = Some(s.copy(orphanKind = Some(e.kind),
                  orphanMs = Some(e.ts.getTime)))
            case None => // terminal before its create: buffer, don't drop
              cur = Some(PaymentState(PaymentState.OrphanOnly, None,
                Some(e.kind), Some(e.ts.getTime)))
            case _ => // resolved: dup terminal ignored
          }
        case _ => // dup create (pending OR resolved)
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        val deadline =
          if (s.createdMs == PaymentState.OrphanOnly)
            // orphan-buffer retention: wait up to expiry for the create
            s.orphanMs.get + expiryMs
          else s.resolvedMs match {
            // marker retention: replayed creates are ignored until the
            // watermark passes resolution + expiry
            case Some(r) => r + expiryMs
            case None => s.createdMs + expiryMs
          }
        // Clamp below by watermark+1: data is processed before timeouts
        // fire, so a replayed event arriving in the very micro-batch in
        // which the key's deadline falls below the watermark would
        // otherwise make setTimeoutTimestamp throw and kill the query.
        // The clamped timeout fires on the next watermark advance.
        state.setTimeoutTimestamp(
          math.max(deadline, state.getCurrentWatermarkMs() + 1))
      case None => // key never had and never gained state: nothing to do
    }
    out.result().iterator
  }
}
