package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. One JVM runs every suite (Test/fork
  * := true forks once), so the session is getOrCreate'd and never
  * stopped by a suite.
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .config("spark.ui.enabled", "false")
    // match Bench/Verify (r14 opt): AQE partitioning across the
    // cached-plan boundary — specs exercise the plans the bench times
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      "true")
    .getOrCreate()
}
