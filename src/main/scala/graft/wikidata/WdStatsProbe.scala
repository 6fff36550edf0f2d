package graft.wikidata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-tool main (round 14, verdict 2 follow-up): the zipf skew twin
  * showed wd_property_stats bending — e(1M→3M) ≈ 1.22 under zipf
  * properties vs 1.02 under the default 80/20 split, solo-confirmed
  * ×1.36 at 3M. The executed plan explains it: the two countDistinct
  * columns (id, dv_type) make Catalyst plan Expand(×3 gid arms) +
  * SORT-based aggregation — every statement row triples and the map
  * side SORTS ~117M wide rows on (pid, dv_type, id, gid) before the
  * partial aggregate; a 2000-value zipf pid distribution sorts slower
  * than 9-hot and degrades with per-task volume.
  *
  * Candidate rewrite (the text_tfidf materialize-once pattern): ONE
  * corpus pass into a (pid, id) hash aggregate — count/sums plus the
  * ≤7-element collect_set(dv_type), all hash/object-hash friendly,
  * keys spread over entities so no hot reducer — localCheckpointed at
  * pair size, then two cheap derivations (per-pid foldable rollup +
  * exploded dv-set distinct) joined on the 2k pids. No Expand, no
  * corpus sort, the dump parsed exactly once.
  *
  * This main times current-vs-rewrite on a GenWd fixture and asserts
  * row-identical results. Usage:
  *   runMain graft.wikidata.WdStatsProbe <wdBz2Dir> [passes]
  */
object WdStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.wd.path", dir)
    spark.conf.set("spark.graft.wd.bz2", dir)

    def current(): DataFrame = graft.SparkEntry.queries("wd_property_stats")(
      spark, "/root/testdata/sf0.001")

    def rewrite(): DataFrame = {
      val cf = Wd.claimsFlatten(Wd.entities(spark))
      val lvl1 = cf.groupBy(col("pid"), col("id"))
        .agg(count(lit(1)).as("n_st"),
          sum(col("n_qualifier_props").cast(LongType)).as("q"),
          sum(col("n_refs").cast(LongType)).as("r"),
          collect_set(col("dv_type")).as("dvs"))
        .localCheckpoint()
      val main = lvl1.groupBy(col("pid"))
        .agg(sum(col("n_st")).as("n_statements"),
          count(lit(1)).as("n_entities"),
          sum(col("q")).as("total_qualifier_props"),
          sum(col("r")).as("total_refs"))
      val dv = lvl1.select(col("pid"), explode(col("dvs")).as("dv_type"))
        .groupBy(col("pid"))
        .agg(countDistinct(col("dv_type")).as("n_dv_types"),
          min(col("dv_type")).as("rep_dv_type"))
      main.join(dv, Seq("pid"), "left")
        .select(col("pid"), col("n_statements"), col("n_entities"),
          coalesce(col("n_dv_types"), lit(0L)).as("n_dv_types"),
          col("rep_dv_type"), col("total_qualifier_props"), col("total_refs"))
        .orderBy("pid")
    }

    def time(name: String, mk: () => DataFrame): Seq[Double] =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }

    val cur = time("current", current)
    val rw = time("rewrite", rewrite)
    val a = current().collect().map(_.toString)
    val b = rewrite().collect().map(_.toString)
    require(a.sameElements(b),
      s"rewrite diverged: ${a.length} vs ${b.length} rows, first diff: " +
        a.zip(b).find { case (x, y) => x != y }.map(_.toString).getOrElse("len"))
    def f(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    println(s"""{"probe":"wdstats","dir":"$dir","current":[${f(cur)}],""" +
      s""""rewrite":[${f(rw)}],"rows":${a.length}}""")
    spark.stop()
  }
}
