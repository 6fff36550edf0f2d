package graft
import org.apache.spark.sql.SparkSession
import java.util.Locale

object Bench {
  // All numeric formatting goes through Locale.ROOT: under a comma-decimal
  // default locale (de_DE etc.) f"%.3f" would emit "0,123" and corrupt the
  // machine-readable JSON summary.
  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.3f", v)

  // Round 18 (VERDICT item 2): the final one-line JSON's per-query set
  // is PINNED to this committed list — exactly the 55 keys visible in
  // round 17's line (BENCH_r17.json) — instead of "slowest keys that
  // fit 1500 chars". The old rule made the driver's round-over-round
  // per-query comparison a moving, biased sample: when the visible
  // cutoff drifted 0.80→1.02 s with box mood, 12 keys "dropped" and 14
  // appeared without any code change (two of the phantom drops were
  // the round's biggest WINS, leaving the line by getting fast).
  // Membership now only changes by editing this list at a rebaseline;
  // ordering stays slowest-first (human-readable) and the 1500-char
  // budget guard stays as a backstop (worst case trims the FASTEST
  // pinned keys, deterministically). Full per-key data is always in
  // bench_detail.json regardless.
  private val PinnedLineKeys: Set[String] = Set(
    "agg_approx_quantile", "agg_assoc_rules", "agg_grouping_sets",
    "agg_ks_test", "dedup_components", "dedup_embedding",
    "dedup_incremental", "dedup_near_minhash", "dedup_semantic_apply",
    "dedup_simhash", "etl_corpus_curate", "etl_quarantine",
    "etl_shard_manifest", "etl_wikidata_pg", "graph_adamic_adar",
    "graph_bipartite_project", "graph_kcore", "graph_khop",
    "graph_link_predict", "graph_random_walk", "graph_sssp",
    "join_asof_nearest", "join_bloom_pruned", "join_full_outer",
    "join_geo_nearest", "join_lateral", "join_skew_salted",
    "join_star_5way", "multimodal_dedup", "multimodal_phash",
    "sim_ann_ivf", "sim_ann_lsh", "sim_pca_power", "sim_pq_search",
    "sink_parquet_partitioned", "sink_pg_attach", "sink_pg_copy",
    "sink_pg_sharded", "stream_sink_pg", "subquery_not_in",
    "subquery_scalar", "text_bigram_prob", "text_decontaminate",
    "text_feature_hash", "text_lm_generate", "text_perplexity",
    "text_pii_mask", "text_pmi_collocations", "text_tfidf",
    "win_autocorr", "win_funnel", "win_mann_kendall", "win_theil_sen",
    "win_topk_native", "win_topk_per_group")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_SHUFFLE decouples shuffle partitions from thread
    // count for scale experiments: a cluster scales partitions with
    // data while local[n] cannot, so proving a "fixed-32-partition
    // saturation" diagnosis needs partitions ∝ input at constant n.
    // Unset, partitions = cpus — the driver's contract.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // spark.graft.stage.dir resolves inside Stage.dir (conf -> env
    // SPARK_GRAFT_STAGE_DIR -> /tmp); no builder default to clobber it.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      // Kryo (round 17): raw-RDD fixpoint loops (components, sssp,
      // khop, kcore) serialize boxed pairs through spark.serializer for
      // both shuffle and persisted blocks; the Java default measured
      // ~2x slower on exactly those stages (OPTIMIZATION_r17.md). SQL
      // paths (UnsafeRow) are unaffected. Standard production setting.
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
      // UTC parity with Verify/RunOne: the NTZ→TimestampType cast in
      // Tables.events is session-TZ dependent, so an unpinned TZ would
      // shift event-time filter selectivity (and timings) on a
      // non-UTC host.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/codegen and parquet footers so the first timed query
    // doesn't absorb session initialization cost.
    Tables.names.foreach { t =>
      try Tables.table(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).limit(1).count()
    catch { case _: Throwable => () }
    // Plan-shape regression tracking: wall-clock on this box drifts
    // up to ±50% per key across rounds (BASELINE.md warm-band table),
    // but SHUFFLE BYTES are a deterministic function of plan + data —
    // a changed byte count is a changed plan (or changed input),
    // never box noise. A stage-level listener accumulates shuffle
    // read/write and spill; the final pass snapshots the counters
    // around each query (listener bus drained first — events post
    // asynchronously) and bench_detail.json records the deltas.
    val shRead = new java.util.concurrent.atomic.AtomicLong
    val shWrite = new java.util.concurrent.atomic.AtomicLong
    val spilled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          }
        }
      })
    def shuffleSnapshot(): (Long, Long, Long) = {
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      (shRead.get(), shWrite.get(), spilled.get())
    }
    val shuffleByKey =
      scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    // Optional comma-separated key filter for targeted profiling runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Same guard as Verify (round 14): a typo'd or stale key list must
    // fail loudly — a filter selecting zero keys "benches" nothing in
    // 20 s and prints a clean-looking empty total.
    only.foreach { ks =>
      require(ks.nonEmpty, "SPARK_GRAFT_ONLY is set but selects no keys")
      val unknown = ks -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown keys: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = only match {
      case Some(ks) => SparkEntry.queries.filter { case (k, _) => ks(k) }
      case None => SparkEntry.queries
    }
    // Steady-state timing: three full passes over the suite, median per
    // query, with a different deterministic shuffle of the query order each
    // pass. Shuffling decorrelates one query's GC/codegen debris from a
    // fixed neighbor; the median resists the ±50% single-run noise this
    // box exhibits without rewarding a lucky cold-cache outlier the way
    // min would under only two samples.
    val keys = selected.keys.toVector
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(3)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
    // A key that throws must not contribute a timing sample: an
    // analysis-time crash "runs" in milliseconds and would silently
    // deflate the suite total (round-5 lesson). Failed keys are
    // reported with a -1 sentinel and excluded from the total.
    // Per-key failure COUNTS (not a set): a key that fails some passes
    // but succeeds once would otherwise vanish from the failure report
    // while its median silently covered only the good passes.
    val failCount = scala.collection.mutable.Map.empty[String, Int]
    (1 to passes).foreach { pass =>
      val rnd = new scala.util.Random(0x9E3779B97F4A7C15L * pass)
      rnd.shuffle(keys).foreach { name =>
        val fn = selected(name)
        // shuffle accounting only on the last (warm, AQE-settled)
        // pass: the drain is cheap but not free, and the warm plan is
        // the one whose shape future rounds should diff against
        val account = pass == passes
        val before = if (account) shuffleSnapshot() else null
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) {
          samples(name) = samples.getOrElse(name, Vector.empty) :+ dt
          if (account) {
            val after = shuffleSnapshot()
            shuffleByKey(name) = (after._1 - before._1,
              after._2 - before._2, after._3 - before._3)
          }
        }
        else failCount(name) = failCount.getOrElse(name, 0) + 1
        // Round 18 block hygiene (guide §5): hand this key's scratch
        // localCheckpoint blocks to the BlockManager now — outside the
        // timed region, replacing the ContextCleaner's
        // eventual-after-GC release whose backlog across 279 keys × 3
        // passes was the round-17 suite-context churn. The result
        // frame was just materialized by count() and is never re-read.
        Ckpt.releaseScratch()
      }
    }
    def median(v: Vector[Double]): Double = {
      val s = v.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Keys with zero successful passes get the -1 sentinel; keys that
    // succeeded at least once use the median of their successful runs.
    // Intermittent keys (some passes failed, some succeeded) are listed
    // separately — their median covers only the good passes, which must
    // be visible rather than silently folded into the total.
    val broken = (failCount.keySet -- samples.keySet).toSeq.sorted
    val flaky = (failCount.keySet & samples.keySet).toSeq.sorted
    val results = samples.map { case (k, v) => k -> median(v) } ++
      broken.map(_ -> -1.0)
    // Cold/warm attribution: samples are appended in pass order, so a
    // key's first sample is its cold run — the one that pays stored-
    // artifact builds (dedup_apply: 24 s cold vs 0.33 s warm at sf1)
    // and first-plan codegen — and the median of the remaining passes
    // is its steady state. Splitting them makes a cross-round "regression"
    // attributable at a glance: a cold-only jump is cache churn, a warm
    // jump is a real plan change. (If pass 1 failed, "cold" is the first
    // SUCCESSFUL pass — still the coldest run that produced a number.)
    val coldWarm: Map[String, (Double, Double)] = samples.map {
      case (k, v) =>
        k -> (v.head, if (v.size >= 2) median(v.tail) else v.head)
    }.toMap
    // Full per-query detail goes out as non-JSON debug lines: the driver
    // captures only a bounded tail of stdout, so the machine-readable
    // summary below must stay short and LAST. These lines are for humans.
    results.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      val cw = coldWarm.get(k)
        .map { case (c, w) => s" cold=${fmt(c)} warm=${fmt(w)}" }
        .getOrElse("")
      println(s"BENCHQ $k ${fmt(v)}$cw")
    }
    broken.foreach(k => println(s"BENCHFAIL $k"))
    flaky.foreach(k => println(s"BENCHFLAKY $k ${failCount(k)}/$passes"))
    // Total covers only keys that actually ran; sentinel rows excluded.
    val total = if (samples.nonEmpty) samples.values.map(median).sum else 0.0
    // Compact final JSON line: 3-dp timings, slowest queries first, and a
    // hard length budget so the line (plus any build-tool epilogue) fits
    // inside the driver's stdout tail window without truncation.
    // Audit stamp: wall-clock run time + a hash of the main source tree
    // (path + bytes of every .scala file), so each round's bench line is
    // provably fresh and attributable to an exact source state even if
    // artifacts are copied around between rounds.
    val srcHash = {
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
            .flatMap(files)
        else if (f.getName.endsWith(".scala")) Seq(f)
        else Nil
      val md = java.security.MessageDigest.getInstance("MD5")
      files(new java.io.File("src/main/scala")).foreach { f =>
        md.update(f.getPath.getBytes("UTF-8"))
        md.update(java.nio.file.Files.readAllBytes(f.toPath))
      }
      md.digest().map(b => String.format(Locale.ROOT, "%02x", b))
        .mkString.take(12)
    }
    // Whole-second stamp: the ~8 chars the sub-second digits cost are
    // line budget the pinned 55-key set needs (round 18).
    val stamp = java.time.Instant.now()
      .truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":${broken.size},"flaky":${flaky.size},"ts":"$stamp","src":"$srcHash","queries":{"""
    val tail = s"""},"sf":"$sfDir"}"""
    val budget = 1500 - head.length - tail.length
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    // Membership pinned (see PinnedLineKeys); slowest-first ordering
    // kept for humans; budget guard kept as a deterministic backstop.
    results.toSeq.filter(r => PinnedLineKeys(r._1)).sortBy(-_._2)
      .foreach { case (k, v) =>
        val e = s""""$k":${fmt(v)}"""
        if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
      }
    val json = head + entries.mkString(",") + tail
    // Belt and braces against build-tool log decoration: the JSON goes to
    // stdout (forked with StdoutOutput so no "[info] " prefix), to stderr,
    // and to bench.json in the working directory.
    println(json)
    System.err.println(json)
    try {
      val w = new java.io.PrintWriter(new java.io.File("bench.json"), "UTF-8")
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () }
    // Unabridged per-key cold/warm/median detail — too long for the
    // driver's stdout tail window, so it goes to a sidecar file only.
    //
    // Two round-11-verdict rules:
    //  * The repo-root bench_detail.json is the committed full-surface
    //    yardstick benchcheck.py joins against BASELINE.md — a SCOPED
    //    run (SPARK_GRAFT_ONLY set) must never clobber it (commit
    //    0431c47 did exactly that), so scoped captures land in tmp/.
    //    SPARK_GRAFT_DETAIL_OUT overrides either path explicitly.
    //  * Shuffle fingerprints are partition-count-sensitive (the same
    //    plan packs different compressed block counts at 4 vs 32
    //    shuffle partitions — 5–15% observed), so the capture records
    //    its (cpus, shuffle) config and benchcheck refuses to compare
    //    fingerprints across configs instead of reporting false moves.
    try {
      val detailPath = sys.env.get("SPARK_GRAFT_DETAIL_OUT").getOrElse {
        if (only.isDefined) {
          new java.io.File("tmp").mkdirs()
          "tmp/bench_detail_scoped.json"
        } else "bench_detail.json"
      }
      val w = new java.io.PrintWriter(new java.io.File(detailPath), "UTF-8")
      try {
        val rows = results.toSeq.sortBy(-_._2).map { case (k, v) =>
          val (c, wm) = coldWarm.getOrElse(k, (-1.0, -1.0))
          val (sr, sw, sp) = shuffleByKey.getOrElse(k, (-1L, -1L, -1L))
          s""""$k":{"med":${fmt(v)},"cold":${fmt(c)},"warm":${fmt(wm)},""" +
            s""""shr":$sr,"shw":$sw,"spill":$sp}"""
        }
        w.println(s"""{"ts":"$stamp","src":"$srcHash","sf":"$sfDir",""" +
          s""""passes":$passes,"cpus":$cpus,"shuffle":$shuffle,""" +
          s""""queries":{${rows.mkString(",")}}}""")
      } finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
