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

/** In-flight state for one pending payment. */
case class PendingPayment(createdMs: Long)

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
    implicit val stateEnc = Encoders.product[PendingPayment]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.paymentId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (id: Long, evs: Iterator[PaymentEvent], state: GroupState[PendingPayment]) =>
          step(id, evs, state, expiryMs))
  }

  /** One FSM step for one key. Visible for unit tests. */
  private[streaming] def step(id: Long, evs: Iterator[PaymentEvent],
      state: GroupState[PendingPayment], expiryMs: Long): Iterator[PaymentOutcome] = {
    if (state.hasTimedOut) {
      // Watermark passed created+expiry with no terminal event: the
      // reference's failsafe expiry.
      val created = state.get.createdMs
      state.remove()
      return Iterator(PaymentOutcome(id, "expired",
        new Timestamp(created), new Timestamp(created + expiryMs)))
    }
    val sorted = evs.toSeq.sortBy(_.ts.getTime)
    var pending = state.getOption
    val out = Seq.newBuilder[PaymentOutcome]
    sorted.foreach { e =>
      e.kind match {
        case "create" if pending.isEmpty =>
          pending = Some(PendingPayment(e.ts.getTime))
        case ("processed" | "rejected") if pending.isDefined =>
          val created = pending.get.createdMs
          if (e.ts.getTime - created <= expiryMs)
            out += PaymentOutcome(id, e.kind,
              new Timestamp(created), new Timestamp(e.ts.getTime))
          else // terminal event arrived after the window: expired
            out += PaymentOutcome(id, "expired",
              new Timestamp(created), new Timestamp(created + expiryMs))
          pending = None
        case _ => // duplicate create / orphan terminal: ignore
      }
    }
    pending match {
      case Some(p) =>
        state.update(p)
        state.setTimeoutTimestamp(p.createdMs + expiryMs)
      case None =>
        if (state.exists) state.remove()
    }
    out.result().iterator
  }
}
