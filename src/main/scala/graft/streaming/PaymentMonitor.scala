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
  */
case class PaymentState(createdMs: Long, resolvedMs: Option[Long])

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
        // Resolved-marker retention horizon passed: drop silently.
        case Some(_) => Iterator.empty
        // Watermark passed created+expiry with no terminal event: the
        // reference's failsafe expiry.
        case None => Iterator(PaymentOutcome(id, "expired",
          new Timestamp(s.createdMs), new Timestamp(s.createdMs + expiryMs)))
      }
    }
    val sorted = evs.toSeq.sortBy(_.ts.getTime)
    var cur = state.getOption
    val out = Seq.newBuilder[PaymentOutcome]
    sorted.foreach { e =>
      e.kind match {
        case "create" if cur.isEmpty =>
          cur = Some(PaymentState(e.ts.getTime, None))
        case ("processed" | "rejected") if cur.exists(_.resolvedMs.isEmpty) =>
          val created = cur.get.createdMs
          if (e.ts.getTime - created <= expiryMs)
            out += PaymentOutcome(id, e.kind,
              new Timestamp(created), new Timestamp(e.ts.getTime))
          else // terminal event arrived after the window: expired
            out += PaymentOutcome(id, "expired",
              new Timestamp(created), new Timestamp(created + expiryMs))
          cur = Some(PaymentState(created, Some(e.ts.getTime)))
        case _ => // dup create (pending OR resolved) / orphan or dup terminal
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        val deadline = s.resolvedMs match {
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
      case None =>
        if (state.exists) state.remove()
    }
    out.result().iterator
  }
}
