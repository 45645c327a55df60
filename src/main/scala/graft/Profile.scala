package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only per-query profiler (guide §1 "measure first"): runs the
  * named queries through the bench's exact noop-sink methodology and
  * reports, per query and per pass, the wall seconds plus the Spark
  * job / stage / task counts and the summed task time — the numbers
  * that separate "compute-bound" from "scheduling-bound" at bench
  * scale, which the one-line bench total cannot. Never run by the
  * driver; the bench contract is untouched.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.Profile q_a q_b ..."`
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // A/B knobs for the AQE coalesce experiment (guide §2.2)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64MB"))
      // match Bench (r14 opt): AQE across the cached-plan boundary
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED", "true"))
    // generic dev pass-through: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b = b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    // per-stage task-time attribution: (stage name, tasks, taskMs)
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    val stageOfTask = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        stageOfTask.put(s.stageInfo.stageId,
          s.stageInfo.name.takeWhile(_ != '(').trim + " @ " +
            s.stageInfo.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("Profile"))
              .getOrElse("").trim.take(80))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) {
          taskMs += t.taskInfo.duration
          val key = "stage-" + t.stageId
          stageAgg.merge(key, (1, t.taskInfo.duration),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // same warmup as Bench
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-34s pass  wall_s   jobs stages  tasks task_s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          (1 to 2).foreach { pass =>
            // drain listener queue so counts attribute to this pass
            Thread.sleep(300)
            jobs = 0; stages = 0; tasks = 0; taskMs = 0L
            stageAgg.clear(); stageOfTask.clear()
            val t0 = System.nanoTime()
            try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              System.err.println(s"[profile] $name failed: ${e.getMessage}")
            }
            val wall = (System.nanoTime() - t0) / 1e9
            Thread.sleep(300)
            println(f"$name%-34s $pass%4d ${wall}%7.2f $jobs%6d $stages%6d " +
              f"$tasks%6d ${taskMs / 1e3}%6.1f")
            if (sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")) {
              import scala.jdk.CollectionConverters._
              stageAgg.asScala.toSeq.sortBy(-_._2._2).take(6).foreach {
                case (sid, (n, ms)) =>
                  val id = sid.stripPrefix("stage-").toInt
                  println(f"    ${ms / 1e3}%7.2fs $n%5d tasks  " +
                    stageOfTask.getOrDefault(id, sid))
              }
            }
          }
      }
    }
    spark.stop()
  }
}
