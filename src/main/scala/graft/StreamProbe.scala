package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Cluster streaming failure-injection probe (round 10).
  *
  * Re-runs StreamingSpec's 100-batch watermarked-dedup soak as a
  * spark-submit main against a real cluster manager, with the RocksDB
  * state store and a durable `checkpointLocation` — the production
  * configuration SCALE.md claims. The in-JVM soaks can bound state
  * growth but can never LOSE an executor; this main exists so an
  * external script can `kill -9` an executor mid-soak and the
  * changelog/snapshot recovery path actually executes: the
  * rescheduled state-store tasks must reload from the checkpoint and
  * the stream must still emit exactly the 1000 unique ids with the
  * same bounded state high-water mark as an intact run.
  *
  * Protocol: touches a `B<n>` marker FILE in the checkpoint dir's
  * parent every 10 batches (spark-submit's redirected stdout is
  * block-buffered, so stdout markers appear only at exit — files are
  * the race-free signal for the external killer), then prints one
  * `PROBE_RESULT out=<rows> maxState=<rows>` line. Exit 0 iff the
  * output count is exactly 1000 and the state bound held — the same
  * assertions as the in-JVM soak.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val ckpt = args(0)
    val markerDir = java.nio.file.Paths.get(ckpt).getParent
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long)]
    val dedup = in.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("probe_dd").start()
    var maxState = 0L
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for (b <- 0 until 100) {
      val t = new Timestamp(base + b * 5L * 60 * 1000)
      // 10 fresh ids per batch + 1 in-horizon duplicate (must drop)
      val rows = (0 until 10).map(i => (t, b * 10L + i)) :+
        ((t, math.max(0, b - 1) * 10L))
      in.addData(rows: _*)
      q.processAllAvailable()
      val st = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
      maxState = math.max(maxState, st)
      if (b % 10 == 0) {
        println(s"PROBE_B$b state=$st")
        java.nio.file.Files.write(markerDir.resolve(s"B$b"),
          s"$st\n".getBytes("UTF-8"))
      }
    }
    val out = spark.sql("SELECT count(*) FROM probe_dd").head().getLong(0)
    println(s"PROBE_RESULT out=$out maxState=$maxState")
    q.stop()
    spark.stop()
    if (out == 1000L && maxState <= 100L) sys.exit(0) else sys.exit(2)
  }
}
