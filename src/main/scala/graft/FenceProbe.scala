package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.wikidata.{EntitySchema, Wd}

/** Dev-tool main (round-17 verdict 2): measure the array-dump read
  * formulations against each other on a wrapped 1M-entity dump, under
  * the downstream shapes the wd family actually runs — a pruned
  * profile projection (+ global sort) and the Generate-heavy claims
  * flatten. Modes:
  *
  *  - `shipped`  — Wd.readDump: the native json file source with a
  *    corrupt-record column filtering the `[`/`]` wrapper lines; the
  *    optimizer's json schema pruning and the batched reader apply.
  *  - `text`     — the round-16 formulation, reconstructed inline:
  *    text scan → wrapper filter → full-schema from_json → e.*; the
  *    optimizer pushes downstream/inferred predicates below the parse
  *    as EXTRA from_json evaluations (2 on the profile shape, 4 on
  *    the claims shape).
  *
  * A third formulation — a custom identity Expression marked
  * non-deterministic, fencing the pushdown so the text path parses
  * ONCE — was built, measured, and REJECTED: one parse, but hidden
  * from the optimizer's json schema pruning, it converts every
  * statement body even for a profile scan (flat ~4.6–5.0 s at 1M on
  * every shape, 4.3× native on the profile — SCALE.md round-17).
  *
  * Prints one JSON line per (mode, shape): rows, from_json count in
  * the optimized plan, warm seconds (2nd of 2 passes).
  *
  * Usage: runMain graft.FenceProbe <wrappedDumpDir>
  */
object FenceProbe {
  def main(args: Array[String]): Unit = {
    val dump = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def textPath(): DataFrame = {
      val lines = spark.read.textFile(dump)
      val w = trim(col("value"))
      lines.toDF()
        .filter(w =!= "[" && w =!= "]" && w =!= "")
        .select(from_json(col("value"), EntitySchema.entity).as("e"))
        .select(col("e.*"))
    }

    def profile(df: DataFrame): DataFrame =
      df.filter(col("redirect").isNull)
        .select(col("id"), col("type"),
          coalesce(size(col("labels")), lit(0)).as("n_labels"),
          coalesce(size(col("claims")), lit(0)).as("n_claim_props"),
          coalesce(size(col("sitelinks")), lit(0)).as("n_sitelinks"),
          col("lastrevid"))

    def claims(df: DataFrame): DataFrame =
      df.filter(col("redirect").isNull)
        .select(col("id"), explode(col("claims")).as(Seq("pid", "stmts")))
        .select(col("id"), col("pid"), explode(col("stmts")).as("st"))
        .select(col("id"), col("pid"), col("st.id").as("statement_id"),
          col("st.rank").as("rank"),
          col("st.mainsnak.datavalue.type").as("dv_type"))

    val modes: Seq[(String, () => DataFrame)] = Seq(
      "shipped" -> (() => Wd.readDump(spark, dump, EntitySchema.entity)),
      "text" -> (() => textPath()))

    modes.foreach { case (mode, mk0) =>
      def run(shape: String, mk: => DataFrame): Unit = {
        var rows = 0L
        var sec = 0.0
        (1 to 2).foreach { _ =>
          val df = mk
          val t0 = System.nanoTime()
          rows = df.count()
          sec = (System.nanoTime() - t0) / 1e9
        }
        val nParse = "from_json".r
          .findAllIn(mk.queryExecution.optimizedPlan.toString).size
        println(s"""{"probe":"fence","mode":"$mode","shape":"$shape",""" +
          s""""rows":$rows,"from_json":$nParse,"warm_sec":${f"$sec%.2f"}}""")
      }
      run("profile_sort", profile(mk0()).orderBy("id"))
      run("claims_agg", claims(mk0()).groupBy().agg(
        count(lit(1)), sum(length(col("dv_type")))))
    }
    spark.stop()
  }
}
