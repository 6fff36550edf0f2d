package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one declared query, print row count, wall time, and the
  * final (AQE-finalized) physical plan. Usage:
  *   sbt "runMain graft.RunOne <key> [sfDir] [explain]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer") // round 17, see Bench
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try Tables.table(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () } // events: ns timestamps (Tables.events handles)
    }
    val df = SparkEntry.queries(key)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[runone] $key rows=$n time=$sec%.2fs")
    if (args.length > 2 && args(2) == "explain")
      println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
