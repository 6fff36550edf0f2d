package graft

import org.apache.spark.sql.SparkSession
import java.util.Locale

/** Dev profiling tool (round 17): per-key wall time decomposed into
  * driver-side query planning (QueryPlanningTracker phases) vs job
  * execution (listener-summed job wall), plus job/stage/task counts.
  * The bench's per-key seconds mix the two; optimizing the wrong side
  * wastes a round (guide §1: measure first, §7.3: the driver can be
  * the bottleneck). Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Profile key1,key2 [sfDir] [passes]"
  */
object Profile {
  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.3f", v)

  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
    builder.config("spark.serializer",
      "org.apache.spark.serializer.KryoSerializer") // round 17, see Bench
    val spark = builder.getOrCreate()
    // Arbitrary session-conf overrides for A/B runs:
    //   SPARK_GRAFT_PROF_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try Tables.table(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    // job/stage accounting listener
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskTime = new java.util.concurrent.atomic.AtomicLong // ms
    val jobWall = new java.util.concurrent.atomic.AtomicLong // ms
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val jobStart =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); jobStart.put(e.jobId, e.time)
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStart.remove(e.jobId)
          if (st != 0L) {
            jobWall.addAndGet(e.time - st)
            if (sys.env.contains("SPARK_GRAFT_PROF_JOBS"))
              println(s"PROFJOB ${e.jobId} ${e.time - st}ms")
          }
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
          val m = e.stageInfo.taskMetrics
          if (m != null) taskTime.addAndGet(m.executorRunTime)
          if (sys.env.contains("SPARK_GRAFT_PROF_JOBS"))
            println(s"PROFSTAGE ${e.stageInfo.stageId} " +
              s"name=${e.stageInfo.name.takeWhile(_ != '\n').take(60)} " +
              s"tasks=${e.stageInfo.numTasks} " +
              s"run=${if (m != null) m.executorRunTime else -1}ms " +
              s"gc=${if (m != null) m.jvmGCTime else -1}ms")
        }
      })
    def drain(): Unit =
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    println("PROF key pass wall planMs jobs jobWallMs stages tasks taskTimeMs")
    keys.foreach { key =>
      (1 to passes).foreach { pass =>
        drain()
        val j0 = jobs.get(); val s0 = stages.get(); val t0c = tasks.get()
        val tt0 = taskTime.get(); val jw0 = jobWall.get()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(key)(spark, sfDir)
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        drain()
        // planning phases of the FINAL count() query (the earlier jobs
        // of multi-job keys each have their own tracker; the listener
        // jobWall picks up everything, so planMs here is a lower bound
        // on total driver planning)
        val phases = df.queryExecution.tracker.phases
        val planMs = phases.values.map(p => p.endTimeMs - p.startTimeMs).sum
        println(s"PROF $key $pass ${fmt(wall)} $planMs " +
          s"${jobs.get() - j0} ${jobWall.get() - jw0} ${stages.get() - s0} " +
          s"${tasks.get() - t0c} ${taskTime.get() - tt0}")
        // Round 18 block hygiene, outside the timed region (see Bench)
        Ckpt.releaseScratch()
      }
    }
    spark.stop()
  }
}
