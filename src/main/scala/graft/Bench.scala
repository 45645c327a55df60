package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // r14 opt round (guide §2): let AQE re-plan partitioning across
      // the InMemoryRelation boundary. The engine leans on memoized
      // persisted fixtures/index frames (the compute-once discipline),
      // and with Spark's default `false` every stage DOWNSTREAM of a
      // cached frame is pinned to the static shuffle partition count —
      // AQE's size-based coalescing never fires, at ANY scale, for
      // exactly the operators that reuse data. Measured at sf0.1:
      // q_crawl_budget 488→26 tasks (85→0.4 summed task-seconds),
      // q_mine_bitext_sent_ann 686→35 tasks, q_pagerank 357→20, with
      // no regression on the compute-heavy keys (partition targets
      // stay size-derived, so real data keeps its parallelism). Env
      // knob so the driver's A/B stays one flag away.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: exercises parquet reader, codegen, shuffle and
    // the noop sink once so the first timed query doesn't absorb JVM
    // warmup (~7s otherwise).
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // noop sink: fully materializes every output column (count() would
    // let Catalyst prune the expensive projections — HMAC, cosine,
    // regexp — and under-measure the hot kernels).
    def timeOnce(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0 // sentinel: a failed query must not masquerade as a timing
      }
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-2 per query: the shared host shows ±40% per-run noise on
    // unchanged code; the min of two passes is the steady-state number
    // SPARK_GRAFT_ONLY=q_a,q_b is a dev knob for focused scale-ratio
    // runs (the driver never sets it, so round artifacts stay complete)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val pass1 = ordered.map { case (n, f) => n -> timeOnce(n, f) }.toMap
    val results = ordered.map { case (n, f) =>
      val t1 = pass1(n)
      val t2 = if (t1 < 0) -1.0 else timeOnce(n, f)
      // a transient pass-2 failure must not discard a valid pass-1 time
      n -> (if (t1 < 0) -1.0 else if (t2 < 0) t1 else math.min(t1, t2))
    }
    // kernel micro-bench folded in (SPARK_GRAFT_MICRO=0 skips): the
    // native-vs-UDF ratios ride the per-round artifact so a kernel
    // regression shows up round-over-round, not only on demand
    val micro =
      if (sys.env.get("SPARK_GRAFT_MICRO").contains("0")) Seq.empty
      else try MicroBench.kernels(spark, MicroBench.rowsFor(spark))
      catch { case e: Throwable =>
        // a transient micro-kernel failure must not destroy the query
        // timings already measured — emit without ratios
        System.err.println(s"[bench] micro kernels failed: ${e.getMessage}")
        Seq.empty
      }
    val ratios = micro.groupBy(_.kernel).toSeq.sortBy(_._1).flatMap {
      case (k, ts) =>
        for (n <- ts.find(_.variant == "native");
             a <- ts.find(_.variant != "native"))
          yield k -> a.sec / n.sec
    }
    def r4(v: Double): String = // fixed-width values; Locale.ROOT: a
      if (v < 0) "-1" // comma-decimal default locale would emit
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v)) // invalid JSON
    val total = results.map(_._2).filter(_ >= 0).sum
    // the dev filter must leave a trace in the artifact: a focused run
    // that silently reports a tiny "total" reads as a 60x speedup
    val onlyField = only.map(s =>
      s""""only":${s.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""")
      .getOrElse("")
    def mapJson(entries: Seq[(String, Double)], fmt: Double => String) =
      entries.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    // full-precision per-query twin: the complete record lives in a
    // file artifact, where no capture window can cut it. A dev
    // SUBSET run (SPARK_GRAFT_ONLY) writes a SEPARATE default file —
    // bench_full.json is the committed whole-suite round record, and
    // a focused run silently overwriting it with 3 queries reads as
    // a 60× regression-or-speedup in the next diff (bit this once)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "bench_subset.json" else "bench_full.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (s"""{"metric":"total","value":$total,"unit":"sec",$onlyField""" +
        s""""queries":${mapJson(results, _.toString)},""" +
        s""""kernel_ratios":${mapJson(ratios, _.toString)},"sf":"$sfDir"}""")
        .getBytes("UTF-8"))
    // stdout: ONE line, emitted LAST, sized to survive the driver's
    // bounded tail capture (measured: the captured tail is 2000 chars
    // and also holds sbt's trailing "[success]" line, while all ~99
    // per-query entries need ~2.5KB even at 2 decimals — a complete
    // inline map CANNOT fit, which is exactly how rounds 6/7 shipped
    // a truncated, unparseable artifact). The line carries the
    // headline metric + the slowest queries; the full map is in
    // `queries_file`.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
    val failed = results.filter(_._2 < 0).map(_._1)
    val failedField =
      if (failed.isEmpty) ""
      else s""""failed":${failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"""
    System.out.flush()
    // env-provided strings (outPath, sfDir) must be JSON-escaped — a
    // path containing a quote/backslash would otherwise corrupt the
    // one bounded stdout line the driver parses
    def jstr(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    println(
      s"""{"metric":"total","value":${r4(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},$onlyField$failedField""" +
        s""""queries_file":"${jstr(outPath)}",""" +
        s""""slowest":${mapJson(slowest, r4)},""" +
        s""""kernel_ratios":${mapJson(ratios, r4)},"sf":"${jstr(sfDir)}"}""")
    System.out.flush()
    spark.stop()
  }
}
