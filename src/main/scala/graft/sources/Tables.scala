package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet star-schema loader.
  *
  * Reads the driver-generated TPC-H-ish tables (see TESTDATA.md).
  * Declarative `spark.read.parquet` so Catalyst gets full pushdown /
  * pruning; at 100 TB these would be partitioned/bucketed tables and
  * the same code holds — filters and column selection reach the scan.
  *
  * `events.ts` has shipped in two parquet generations: TIMESTAMP
  * (NANOS) (surfaced as nanos-long under the legacy flag; normalized
  * by `div 1000` — integral TRUNCATION toward zero, matching DuckDB's
  * own nanos→micros conversion; truncation and floor coincide for all
  * post-epoch timestamps, and the test data has no pre-1970 events)
  * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaced as
  * TIMESTAMP_NTZ; cast to the instant type, value-preserving under
  * the UTC session every entry point pins). Both normalize to one
  * micros TimestampType `ts` so operators and oracles never see the
  * writer generation.
  */
object Tables {
  /** Session conf required (=true) to read the nanos-timestamped
    * `events` table; see the loud note in [[apply]].
    */
  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name),
      s"unknown table '$name'; expected one of: ${names.mkString(", ")}")
    if (name == "events") {
      // LOUD SIDE EFFECT — events.ts is parquet TIMESTAMP(NANOS), which
      // Spark 4 reads ONLY when the SESSION conf
      // `spark.sql.legacy.parquet.nanosAsLong` is true: a per-read
      // option cannot work because ParquetFileFormat overwrites the
      // relation hadoopConf entry from the session SQLConf at execution
      // (verified against the 4.1.2 bytecode — there is no per-read
      // escape hatch). The loader therefore sets the session conf as a
      // convenience for driver-built sessions, but REFUSES to override
      // an explicit user `false` — that would silently change the
      // meaning of the user's other nanos-parquet reads.
      // NOTE: must distinguish "user explicitly set false" from "unset":
      // nanosAsLong is a REGISTERED SQLConf entry, so getOption returns
      // Some("false") (the default) even when never set. The two-arg get
      // returns the null fallback only when unset — that is the probe.
      requireNanosAllowed(spark)
      spark.conf.set(NanosFlag, "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so plain `spark.sql` users
    * can query the star schema directly (the SQL front door, paired
    * with `GraftExtensions` for the native functions).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    // validate the events nanos conf BEFORE registering anything: a
    // mid-loop refusal would leave the session half-registered (views
    // after 'events' silently absent)
    requireNanosAllowed(spark)
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
  }

  /** Refuses to proceed when the user has EXPLICITLY set the nanos
    * flag to false (see the loud note in [[apply]]).
    */
  private def requireNanosAllowed(spark: SparkSession): Unit =
    if (spark.conf.get(NanosFlag, null) == "false")
      throw new IllegalStateException(
        s"loading 'events' requires session conf $NanosFlag=true " +
          "(its ts column is parquet TIMESTAMP(NANOS)); the session " +
          "sets it to false explicitly, refusing to override")

  /** events with `ts` as TimestampType (micros, truncated from ns). */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case TimestampType => df
      case LongType => // nanosAsLong mode: ns epoch → micros timestamp
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4
        // surfaces it as TIMESTAMP_NTZ. Every session this library
        // builds pins spark.sql.session.timeZone=UTC, where the
        // NTZ→instant cast is value-preserving (identical micros), so
        // downstream operators and the DuckDB oracle (which reads the
        // same file as its plain TIMESTAMP) keep one ts semantics
        // across both writer generations of the test data.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
}
