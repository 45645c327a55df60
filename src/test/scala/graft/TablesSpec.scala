package graft

import org.apache.spark.sql.types.TimestampType

import graft.sources.Tables

/** Loader contract around the nanos-timestamp events table: Spark 4
  * has no per-read escape hatch for TIMESTAMP(NANOS) (the execution
  * path overwrites the relation hadoopConf from session SQLConf), so
  * the loader's documented behavior is: set the session flag when
  * unset, REFUSE to override an explicit user `false`.
  */
class TablesSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("events refuses to override an explicit nanosAsLong=false") {
    val s2 = spark.newSession()
    s2.conf.set(Tables.NanosFlag, "false")
    val e = intercept[IllegalStateException](Tables(s2, dir, "events"))
    assert(e.getMessage.contains(Tables.NanosFlag))
    // the refusal must not have flipped the user's setting
    assert(s2.conf.get(Tables.NanosFlag) == "false")
  }

  test("events loads with ts normalized to micros TimestampType") {
    val events = Tables(spark, dir, "events")
    assert(events.schema("ts").dataType == TimestampType)
    val r = events.selectExpr("min(cast(ts as long)) AS lo",
      "max(cast(ts as long)) AS hi").collect().head
    assert(r.getLong(0) > 631152000L, "ts must be after 1990")
    assert(r.getLong(1) < 4102444800L, "ts must be before 2100")
  }

  test("events loads on a session that NEVER set the nanos flag") {
    // The advertised fallback path: a fresh session (driver-built, no
    // pre-set conf). newSession() inherits the suite builder's =true,
    // so unset restores the never-explicitly-set state; the registered
    // SQLConf default ("false") must NOT trip the refusal guard.
    val s2 = spark.newSession()
    s2.conf.unset(Tables.NanosFlag)
    assert(s2.conf.get(Tables.NanosFlag, null) == null, "flag must read as unset")
    val events = Tables(s2, dir, "events")
    assert(events.schema("ts").dataType == TimestampType)
    assert(events.limit(1).count() == 1)
  }

  test("non-events tables never touch the nanos session conf") {
    val s2 = spark.newSession()
    // "false" is the observable canary: events would refuse, and any
    // loader write would change it
    s2.conf.set(Tables.NanosFlag, "false")
    assert(Tables(s2, dir, "orders").limit(1).count() == 1)
    assert(s2.conf.get(Tables.NanosFlag) == "false")
  }
}
