package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for the named keys to
  * plans/<tag>/<key>_<suffix>.txt (the optimization-round evidence
  * files). Usage:
  *   sbt "runMain graft.Explain <tag> <suffix> key1,key2,... [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    keys.foreach { key =>
      val df = SparkEntry.queries(key)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(dir, s"${key}_$suffix.txt"), "UTF-8")
      try w.println(txt) finally w.close()
      println(s"[explain] wrote plans/$tag/${key}_$suffix.txt " +
        s"(${txt.count(_ == '\n')} lines)")
    }
    spark.stop()
  }
}
