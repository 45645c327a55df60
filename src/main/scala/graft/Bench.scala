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
    def r4(v: Double): String = // fixed-width values keep the stdout
      if (v < 0) "-1" // line inside the driver's capture; Locale.ROOT:
      // a comma-decimal default locale would emit invalid JSON
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val total = results.map(_._2).filter(_ >= 0).sum
    def line(fmt: Double => String): String = {
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val kr = ratios.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"kernel_ratios":$kr,"sf":"$sfDir"}"""
    }
    // stdout: ONE rounded line (the driver captures a bounded tail —
    // full-precision values overflow it and truncate the JSON); the
    // full-precision twin goes to a file artifact
    println(line(r4))
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      line(_.toString).getBytes("UTF-8"))
    spark.stop()
  }
}
