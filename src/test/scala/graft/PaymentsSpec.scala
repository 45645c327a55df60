package graft

import java.sql.Timestamp

import graft.operators.Payments

class PaymentsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // events schema: event_id, ts, user_id, event_type, value, props
  private def ev(rows: (Long, String, Long, String, Double)*) =
    rows.map { case (id, t, u, k, v) => (id, ts(t), u, k, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("expiryOutcomes: processed within 10 min, expired after, orphan without signup") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 10:05:00", 1L, "purchase", 10.0), // 300s -> processed
      (3L, "2024-01-01 10:20:00", 1L, "purchase", 20.0), // 1200s -> expired
      (4L, "2024-01-01 11:00:00", 2L, "purchase", 30.0)) // no signup -> orphan
    val r = Payments.expiryOutcomes(e).collect()
      .map(x => x.getAs[String]("status") -> x.getAs[Long]("n")).toMap
    assert(r == Map("processed" -> 1L, "expired" -> 1L, "orphan" -> 1L))
  }

  test("xrateAsof: purchase gets most recent prior tick of its own currency") {
    val e = ev(
      (2L, "2024-01-01 10:00:00", 1L, "click", 5.0),    // KAU tick @5
      (1L, "2024-01-01 10:00:00", 1L, "click", 2.0),    // KAG tick @2
      (4L, "2024-01-01 10:10:00", 1L, "purchase", 10.0), // KAU -> rate 5, amt 2
      (3L, "2024-01-01 10:10:00", 1L, "purchase", 4.0),  // KAG -> rate 2, amt 2
      (6L, "2024-01-01 10:20:00", 1L, "click", 8.0),     // KAU tick @8 (later)
      (8L, "2024-01-01 10:30:00", 1L, "purchase", 16.0)) // KAU -> rate 8, amt 2
    val r = Payments.xrateAsof(e).collect()
      .map(x => (x.getAs[Long]("event_id"),
        x.getAs[String]("currency"), x.getAs[Double]("rate"),
        x.getAs[Double]("pay_amount"))).toSet
    assert(r == Set(
      (4L, "KAU", 5.0, 2.0), (3L, "KAG", 2.0, 2.0), (8L, "KAU", 8.0, 2.0)))
  }

  test("xrateAsof: carry-forward crosses bucket boundaries, incl. tickless buckets") {
    // bucketSec=600 puts each timestamp below in its own bucket; the
    // 10:3x purchases sit in buckets with NO tick, so their rate must
    // come from the bucket-spine carry (KAU close @8 from 10:20), and
    // a purchase in a tick's own bucket still sees only PRIOR ticks.
    val e = ev(
      (2L, "2024-01-01 10:00:00", 1L, "click", 5.0),     // KAU tick @5
      (6L, "2024-01-01 10:20:00", 1L, "click", 8.0),     // KAU tick @8
      (8L, "2024-01-01 10:21:00", 1L, "purchase", 16.0), // same bucket as @8
      (10L, "2024-01-01 10:35:00", 1L, "purchase", 24.0), // tickless bucket -> @8
      (12L, "2024-01-01 10:45:00", 1L, "purchase", 40.0)) // another tickless -> @8
    val r = Payments.xrateAsof(e, bucketSec = 600).collect()
      .map(x => (x.getAs[Long]("event_id"), x.getAs[Double]("rate"),
        x.getAs[Double]("pay_amount"))).toSet
    assert(r == Set((8L, 8.0, 2.0), (10L, 8.0, 3.0), (12L, 8.0, 5.0)))
  }

  test("xrateAsof: purchase before any tick in bucket 0 is dropped") {
    val e = ev(
      (1L, "2024-01-01 09:00:00", 1L, "purchase", 4.0),  // KAG, no prior tick
      (3L, "2024-01-01 10:00:00", 1L, "click", 2.0),     // KAG tick @2
      (5L, "2024-01-01 10:05:00", 1L, "purchase", 6.0))  // KAG -> rate 2
    val r = Payments.xrateAsof(e, bucketSec = 600).collect()
      .map(x => (x.getAs[Long]("event_id"), x.getAs[Double]("rate"))).toSet
    assert(r == Set((5L, 2.0)))
  }

  test("sessionStats: 30-min gap splits sessions") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "view", 0.0))
    val r = Payments.sessionStats(e).collect().head
    assert(r.getAs[Long]("n_sessions") == 2L)
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Long]("max_session_events") == 2L)
  }

  test("pricingSummary: exact decimal money math on a tiny lineitem") {
    val li = Seq(
      (1.0, 100.0, 0.1, 0.05, "A", "F", ts("1995-01-01 00:00:00")),
      (2.0, 200.0, 0.0, 0.10, "A", "F", ts("1995-01-02 00:00:00")),
      (3.0, 300.0, 0.2, 0.00, "R", "O", ts("1999-01-01 00:00:00"))) // after cutoff
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Payments.pricingSummary(li).collect()
    assert(r.length == 1)
    val x = r.head
    assert(x.getAs[Double]("sum_qty") == 3.0)
    assert(x.getAs[Double]("sum_base_price") == 300.0)
    // 100*0.9 + 200*1.0 = 290; charge: 90*1.05 + 200*1.10 = 314.5
    assert(x.getAs[Double]("sum_disc_price") == 290.0)
    assert(x.getAs[Double]("sum_charge") == 314.5)
    assert(x.getAs[Long]("count_order") == 2L)
  }

  test("retention: users counted in their cohort week offsets") {
    // week boundaries are epoch/604800; use epoch-aligned dates
    val e = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (2L, "2024-01-10 00:00:00", 1L, "view", 0.0), // +1 week
      (3L, "2024-01-01 00:00:00", 2L, "view", 0.0)) // cohort only
    val r = Payments.retention(e).collect()
      .map(x => (x.getAs[Long]("week_offset"), x.getAs[Long]("n_active"))).toMap
    assert(r(0L) == 2L) // both users active in their cohort week
    assert(r(1L) == 1L) // only user 1 returned the next week
  }

  test("activeUsers: distinct users per day") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 11:00:00", 1L, "view", 0.0), // same user, same day
      (3L, "2024-01-01 12:00:00", 2L, "view", 0.0))
    val r = Payments.activeUsers(e).collect().head
    assert(r.getAs[Long]("dau") == 2L && r.getAs[Long]("n_events") == 3L)
  }

  // parameterized over BOTH gate scales: sketch parameters (HLL++
  // register count, GK compression) interact with cardinality, so a
  // bound that holds at sf0.01 can hide an edge case 10× up
  for (sf <- Seq("sf0.01", "sf0.1"))
    test(s"approx variants stay within their error bounds vs exact ($sf)") {
      val events = graft.sources.Tables(spark, s"/root/testdata/$sf", "events")
      // HLL++ rsd 0.02: assert <= 5% per day
      val exactDau = Payments.activeUsers(events).collect()
        .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("dau")).toMap
      val approxDau = Payments.activeUsers(events, approx = true).collect()
        .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("dau")).toMap
      assert(approxDau.keySet == exactDau.keySet)
      approxDau.foreach { case (day, a) =>
        val e = exactDau(day)
        assert(math.abs(a - e).toDouble / e <= 0.05, s"DAU off >5% on $day: $a vs $e")
      }
      // Greenwald-Khanna accuracy 10000: assert <= 5% relative per quantile
      def quants(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[String]("event_type") ->
          Seq(r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))).toMap
      val exactQ = quants(Payments.valueQuantiles(events))
      val approxQ = quants(Payments.valueQuantiles(events, approx = true))
      assert(approxQ.keySet == exactQ.keySet)
      approxQ.foreach { case (t, as) =>
        as.zip(exactQ(t)).foreach { case (a, e) =>
          assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1e-6),
            s"quantile off >5% for $t: $a vs $e")
        }
      }
    }

  test("rateOhlc: first/last tick by (ts, event_id) bound the day's range") {
    val e = ev(
      (2L, "2024-01-01 10:00:00", 1L, "click", 5.0),  // KAU open
      (4L, "2024-01-01 11:00:00", 1L, "click", 9.0),  // KAU high
      (6L, "2024-01-01 12:00:00", 1L, "click", 4.0),  // KAU low
      (8L, "2024-01-01 13:00:00", 1L, "click", 7.0),  // KAU close
      (10L, "2024-01-02 09:00:00", 1L, "click", 6.0), // KAU next day
      (1L, "2024-01-01 10:30:00", 1L, "click", 2.0),  // KAG open=close
      (3L, "2024-01-01 10:30:00", 1L, "click", 3.0),  // KAG same ts: id wins
      (5L, "2024-01-01 09:00:00", 1L, "purchase", 99.0), // not a tick
      (7L, "2024-01-01 09:00:00", 1L, "click", 0.0))  // zero quote: invalid
    val r = Payments.rateOhlc(e).collect()
      .map(x => (x.getAs[String]("currency"), x.getAs[java.sql.Date]("day")) ->
        (x.getAs[Double]("open_rate"), x.getAs[Double]("high_rate"),
          x.getAs[Double]("low_rate"), x.getAs[Double]("close_rate"),
          x.getAs[Long]("n_ticks"))).toMap
    assert(r == Map(
      ("KAU", java.sql.Date.valueOf("2024-01-01")) -> ((5.0, 9.0, 4.0, 7.0, 4L)),
      ("KAU", java.sql.Date.valueOf("2024-01-02")) -> ((6.0, 6.0, 6.0, 6.0, 1L)),
      ("KAG", java.sql.Date.valueOf("2024-01-01")) -> ((2.0, 3.0, 2.0, 3.0, 2L))), s"got $r")
  }

  test("hmacSign emits 64-char upper-hex signatures") {
    val e = ev((1L, "2024-01-01 10:00:00", 7L, "purchase", 1.0))
    val sig = Payments.hmacSign(e).collect().head.getAs[String]("signature")
    assert(sig.matches("[0-9A-F]{64}"))
  }

  test("suppressedRevenue: small cells masked entirely, large cells exact") {
    val nation = Seq((1, "GERMANY", 1), (2, "FRANCE", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((1L, 1), (2L, 1), (3L, 2))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (10L, 1L, 100.0), (11L, 2L, 50.0), // GERMANY: 2 customers
      (12L, 3L, 75.0), (13L, 3L, 25.0)   // FRANCE: 1 customer
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = Payments.suppressedRevenue(orders, customer, nation, k = 2)
      .collect().map(x => x.getAs[String]("n_name") ->
        ((x.getAs[Boolean]("suppressed"), Option(x.get(2)),
          Option(x.get(3)), Option(x.get(4))))).toMap
    assert(r("GERMANY") == ((false, Some(2L), Some(2L), Some(150.0))),
      s"got $r")
    // the one-customer cell leaks nothing — not even its counts
    assert(r("FRANCE") == ((true, None, None, None)), s"got $r")
  }

  test("dataQuality equals a local rule model on randomized corpora") {
    val rnd = new scala.util.Random(6161)
    (0 until 4).foreach { trial =>
      val customers = (1L to (3 + rnd.nextInt(4))).map(i => (i, 1)).toSeq
      val custKeys = customers.map(_._1)
      val orders = (10L until (10L + 6 + rnd.nextInt(8))).map { o =>
        // ~1 in 4 orders points at a missing customer
        val c = if (rnd.nextInt(4) == 0) 900L + rnd.nextInt(5)
        else custKeys(rnd.nextInt(custKeys.size))
        (o, c)
      }.toSeq
      val orderKeys = orders.map(_._1)
      val lineitem = (0 until 12 + rnd.nextInt(10)).map { _ =>
        val o = if (rnd.nextInt(5) == 0) 800L + rnd.nextInt(3)
        else orderKeys(rnd.nextInt(orderKeys.size))
        // duplicate keys arise naturally from the small linenumber range
        (o, 1 + rnd.nextInt(3),
          (rnd.nextInt(9) - 2).toDouble) // some nonpositive prices
      }.toSeq
      val events = (0 until 8 + rnd.nextInt(8)).map { i =>
        (i.toLong,
          if (rnd.nextInt(4) == 0) Option.empty[Long] else Some(rnd.nextInt(5).toLong),
          (rnd.nextInt(7) - 2).toDouble)
      }.toSeq
      val want = Map(
        "orphan_lineitem" ->
          lineitem.count(l => !orderKeys.contains(l._1)).toLong,
        "orphan_order_customer" ->
          orders.count(o => !custKeys.contains(o._2)).toLong,
        "dup_lineitem_key" -> lineitem.groupBy(l => (l._1, l._2))
          .values.map(g => (g.size - 1).toLong).sum,
        "nonpositive_price" -> lineitem.count(_._3 <= 0).toLong,
        "negative_event_value" -> events.count(_._3 < 0).toLong,
        "null_event_user" -> events.count(_._2.isEmpty).toLong)
      val got = Payments.dataQuality(
        orders.toDF("o_orderkey", "o_custkey"),
        lineitem.toDF("l_orderkey", "l_linenumber", "l_extendedprice"),
        customers.toDF("c_custkey", "c_nationkey"),
        events.toDF("event_id", "user_id", "value")).collect()
        .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations"))
        .toMap
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("dataQuality: every rule counts exactly its planted violations; clean rules report zero") {
    val customer = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (10L, 1L), (11L, 2L),
      (12L, 9L) // customer 9 missing → orphan_order_customer
    ).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (10L, 1, 5.0), (10L, 2, 7.5),
      (11L, 1, 7.5), (11L, 1, 2.0), (11L, 1, 3.0), // key triplicated → 2 excess
      (99L, 1, 1.0), // order 99 missing → orphan_lineitem
      (12L, 1, -4.0), (12L, 2, 0.0) // two nonpositive prices
    ).toDF("l_orderkey", "l_linenumber", "l_extendedprice")
    val events = Seq(
      (Some(1L), 1.0), (Some(2L), -2.5), (None, 3.0), (None, -1.0)
    ).map { case (u, v) => (u, v) }
      .toDF("user_id", "value")
    val r = Payments.dataQuality(orders, lineitem, customer, events)
      .collect().map(x => x.getAs[String]("rule") ->
        x.getAs[Long]("n_violations")).toMap
    assert(r == Map(
      "orphan_lineitem" -> 1L,
      "orphan_order_customer" -> 1L,
      "dup_lineitem_key" -> 2L,
      "nonpositive_price" -> 2L,
      "negative_event_value" -> 2L,
      "null_event_user" -> 2L), s"got $r")
    // a clean corpus reports six zeros, never an empty frame
    val clean = Payments.dataQuality(
      Seq((10L, 1L)).toDF("o_orderkey", "o_custkey"),
      Seq((10L, 1, 5.0)).toDF("l_orderkey", "l_linenumber", "l_extendedprice"),
      customer, ev((1L, "2024-01-01 10:00:00", 7L, "purchase", 1.0)))
      .collect()
    assert(clean.length == 6 && clean.forall(_.getAs[Long]("n_violations") == 0L))
  }
}
