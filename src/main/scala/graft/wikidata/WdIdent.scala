package graft.wikidata

import org.apache.spark.sql.SparkSession

/** Dev-tool main (round-17 verdict 6): row-identity check of one
  * declared wd-family key across TWO dump layouts of the same entities
  * — plain NDJSON vs array-wrapped, or a direct read vs its
  * [[Wd.rechunk]] output. EXCEPT ALL in both directions must be zero;
  * counts are printed so an empty-vs-empty false pass is visible.
  *
  * Usage: runMain graft.wikidata.WdIdent <key> <confKey> <dirA> <dirB>
  *   confKey: the family's dump override conf —
  *     spark.graft.wd.path | spark.graft.wd.lexemes |
  *     spark.graft.wd.mediainfo
  * The override conf is read at DataFrame CONSTRUCTION time, so one
  * session builds frame A, re-points the conf, builds frame B, and
  * diffs them in a single plan.
  */
object WdIdent {
  def main(args: Array[String]): Unit = {
    val Array(key, confKey, dirA, dirB) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(key)
    spark.conf.set(confKey, dirA)
    val a = q(spark, "/root/testdata/sf0.001")
    spark.conf.set(confKey, dirB)
    val b = q(spark, "/root/testdata/sf0.001")
    val (na, nb) = (a.count(), b.count())
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    println(s"""{"probe":"wdident","key":"$key","rows_a":$na,""" +
      s""""rows_b":$nb,"only_a":$onlyA,"only_b":$onlyB,""" +
      s""""match":${na == nb && onlyA == 0 && onlyB == 0}}""")
    spark.stop()
    if (!(na == nb && onlyA == 0 && onlyB == 0)) sys.exit(1)
  }
}
