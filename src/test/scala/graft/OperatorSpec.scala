package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator semantic assertions on sf0.001 (SURVEY.md §5.3) — the
  * properties the DuckDB oracle can't check: dedup/pairing invariants of
  * the ✗-oracle keys, fixture goldens for the Wikidata module, stub
  * determinism, sink option plumbing.
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, Spec.sf001)

  test("every declared query returns rows at sf0.001") {
    val empties = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => q(k).limit(1).count() == 0)
    // theta/near-dup style keys may legitimately be sparse but none
    // should be empty at sf0.001 except genuinely-filtered pair sets
    assert(empties.filterNot(Set("dedup_near_minhash", "dedup_simhash",
      "dedup_embedding", "sim_ann_lsh")).isEmpty,
      s"unexpectedly empty: $empties")
  }

  test("oracle keys are a subset of query keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("dedup_exact is idempotent and keeps lowest doc_id") {
    val d1 = q("dedup_exact").collect()
    assert(d1.map(_.getString(1)).distinct.length === d1.length) // 1 row per hash
    val docs = Tables.documents(spark, Spec.sf001).count()
    assert(d1.length <= docs && d1.nonEmpty)
  }

  test("minhash: identical docs always collide at fixed seeds") {
    import spark.implicits._
    // two identical + one disjoint doc through the same pipeline shape
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("mh_docs")
    val sigs = spark.sql(
      """SELECT doc_id,
           transform(sequence(1, 32), s -> array_min(transform(
             filter(transform(split(text, ' '), (t, i) ->
               IF(i + 3 <= size(split(text, ' ')),
                  concat_ws(' ', element_at(split(text,' '), i+1),
                            element_at(split(text,' '), i+2),
                            element_at(split(text,' '), i+3)), null)),
               x -> x IS NOT NULL),
             sh -> xxhash64(concat(cast(s AS string), ':', sh))))) AS sigs
         FROM mh_docs""").collect()
    val bySig = sigs.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bySig(1L) === bySig(2L), "identical docs must have identical signatures")
    assert(bySig(1L) !== bySig(3L), "disjoint docs should differ")
  }

  test("simhash pairs: hamming bounded and symmetric-free (a<b)") {
    val rows = q("dedup_simhash").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getInt(2) <= 1))
  }

  test("simhash hot-bucket cap: clique degrades to star, coverage survives") {
    import spark.implicits._
    // 6 identical docs: every (chunk, cv) bucket holds all 6 of them —
    // the mega-duplicate-cluster case where all chunks go hot TOGETHER
    val hot = (1L to 6L).map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    // cap below the bucket size → star around doc 1: five (1, x) pairs,
    // O(bucket) not O(bucket²), and every cluster member still flagged
    val star = graft.operators.DedupOps.simhashPairs(hot, bucketCap = 5).collect()
    assert(star.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (2L to 6L).map(b => (1L, b)).toSet)
    // generous cap → the identical docs pair up (15 a<b pairs, hamming 0)
    assert(graft.operators.DedupOps.simhashPairs(hot, bucketCap = 6).count() === 15L)
  }

  test("minhash hot-band cap: band clique degrades to star, coverage survives") {
    import spark.implicits._
    // 6 identical docs: identical signatures ⇒ all 4 (band, bh)
    // buckets hold all 6 — the mega-duplicate case where every band
    // goes hot TOGETHER (correlated, not independent)
    val hot = (1L to 6L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    // cap below the bucket size → star around doc 1: five (1, x) pairs
    // with est_jaccard 1.0 (rep signature = member signature), cost
    // O(bucket) not O(bucket²), every cluster member still flagged
    val star = graft.operators.DedupOps.minhashPairs(hot, bucketCap = 5).collect()
    assert(star.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (2L to 6L).map(b => (1L, b)).toSet)
    assert(star.forall(_.getDouble(2) === 1.0))
    // generous cap → the identical docs pair up fully (15 a<b pairs)
    assert(graft.operators.DedupOps.minhashPairs(hot, bucketCap = 6).count() === 15L)
  }

  test("agg_countmin: est ≥ exact always, overshoot within the ε·N bound") {
    // CMS one-sided guarantee: collisions only ADD, so the estimate can
    // never undercount; expected overshoot per hash row is N/width
    // (~0.4% of the stream), min over 4 rows asserted at 5% headroom
    val est = SparkEntry.queries("agg_countmin")(spark, Spec.sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, Spec.sf01)
      .filter(col("user_id") < 10)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.events(spark, Spec.sf01).count()
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(est(k) >= ex, s"user $k: CMS undercounted ${est(k)} < $ex")
      assert(est(k) <= ex + (n * 0.05).toLong,
        s"user $k: est=${est(k)} exact=$ex exceeds the ε·N bound")
    }
  }

  test("agg_approx_distinct (KMV) tracks the exact distinct count at both SFs") {
    // k=128 ⇒ σ ≈ 8.9% once the sketch fills; the hash is fixed so the
    // estimate is deterministic — the bound just needs to clear the one
    // realized draw per (sf, group) with margin.
    for (sf <- Seq(Spec.sf01, "/root/testdata/sf0.1")) {
      val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exact = Tables.events(spark, sf)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet === exact.keySet)
      exact.foreach { case (k, ex) =>
        val rel = math.abs(approx(k) - ex) / ex
        assert(rel <= 0.25, s"$sf $k: approx=${approx(k)} exact=$ex rel=$rel")
      }
    }
  }

  test("sketch_hll_native stays within HLL error bounds of the exact count") {
    // the engine-native sketch twin (no oracle possible) gets a hard
    // numeric check: configured rsd=0.01, asserted at 6x headroom
    val approx = operators.Relational.nativeSketches("sketch_hll_native")(
        spark, Spec.sf01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, Spec.sf01)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val rel = math.abs(approx(k).toDouble - ex) / ex
      assert(rel <= 0.06, s"$k: approx=${approx(k)} exact=$ex rel=$rel")
    }
  }

  test("agg_approx_quantile within rank-error bounds of the exact distribution") {
    // 20% md5 sample ⇒ rank error σ = √(0.25/n_s) ≈ 0.8% per group at
    // sf0.01; assert the returned value's full-data rank window
    // overlaps the target at ~3σ. The window [frac(<v), frac(<=v)]
    // handles the heavy ties of the integer-valued quantity column.
    val rows = SparkEntry.queries("agg_approx_quantile")(spark, Spec.sf01).collect()
    assert(rows.nonEmpty)
    Tables.lineitem(spark, Spec.sf01)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .createOrReplaceTempView("aq_li")
    def rankWindow(flag: String, colName: String, v: Double): (Double, Double) = {
      val r = spark.sql(
        s"""SELECT sum(IF($colName < $v, 1, 0)) / count(*) AS lo,
                   sum(IF($colName <= $v, 1, 0)) / count(*) AS hi
            FROM aq_li WHERE l_returnflag = '$flag'""").head()
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      val flag = r.getString(0)
      val (lo50, hi50) = rankWindow(flag, "l_quantity", r.getDouble(1))
      assert(lo50 <= 0.525 && hi50 >= 0.475, s"$flag p50 rank=[$lo50,$hi50]")
      val (lo95, hi95) = rankWindow(flag, "l_extendedprice", r.getDouble(2))
      assert(lo95 <= 0.975 && hi95 >= 0.925, s"$flag p95 rank=[$lo95,$hi95]")
    }
  }

  test("pipeline ops: domain mix keeps wt=1.0 sources whole; decontaminate flags train only") {
    val mix = q("sample_domain_mix").collect()
    val bySrc = mix.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val total = Tables.documents(spark, Spec.sf001)
      .groupBy(col("source")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // wt=1.0 ⇒ every src0 doc survives; wt<1 sources must shrink overall
    assert(bySrc.getOrElse("src0", 0) === total("src0").toInt)
    assert(mix.length < total.values.sum)
    // deterministic: same rows on a second run
    assert(q("sample_domain_mix").collect().map(_.toString).toSeq
      === mix.map(_.toString).toSeq)

    val decon = q("text_decontaminate").collect()
    val testIds = q("split_train_test").collect()
      .filter(_.getString(2) != "train").map(_.getLong(0)).toSet
    // only train-split docs can be flagged, with >= 3 gram hits each
    assert(decon.forall(r => !testIds.contains(r.getLong(0))))
    assert(decon.forall(_.getLong(1) >= 3))

    val rep = q("text_repetition").collect()
    assert(rep.forall { r =>
      val d = r.getDouble(2); val t = r.getDouble(3)
      d >= 0.0 && d <= 1.0 && t > 0.0 && t <= 1.0
    })

    // incremental dedup: only delta-bucket docs appear, matched against
    // base-bucket docs (split rule: train buckets < 8 are the base)
    val trainIds = q("split_train_test").collect()
      .filter(_.getString(2) == "train").map(_.getLong(0)).toSet
    val inc = q("dedup_incremental").collect()
    assert(inc.nonEmpty)
    assert(inc.forall(r => !trainIds.contains(r.getLong(0))))
    assert(inc.forall(r => trainIds.contains(r.getLong(2))))
  }

  test("dedup_components: endpoints of every near-dup edge share a component") {
    val edges = q("dedup_simhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp = q("dedup_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    edges.foreach { case (a, b) =>
      assert(comp(a) === comp(b), s"edge ($a,$b) split across components")
    }
    // labels are component minima
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(label === members.keys.min)
    }
  }

  test("kmeans two-level coarse assignment: bounded quantizer loss vs the exact scan") {
    // The O(N·√k) two-level rung is the DECLARED path (round 9); the
    // exact O(N·k) scan stays behind coarseAssign=false as the
    // quantizer-loss reference. The declared path must stay CLOSE to
    // it: high label agreement, and the total within-cluster inertia
    // (sum of fixed-point d2l) within a small factor.
    def labels() = operators.SimOps.testKmeansAssigned(spark, Spec.sf001)
      .select("vec_id", "cluster", "d2l").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = try {
      spark.conf.set("spark.graft.kmeans.coarseAssign", "false")
      labels()
    } finally spark.conf.unset("spark.graft.kmeans.coarseAssign")
    val twoLevel = labels()
    assert(exact.keySet === twoLevel.keySet, "assignment dropped vectors")
    val agree = exact.count { case (v, (c, _)) => twoLevel(v)._1 == c }
    val frac = agree.toDouble / exact.size
    val inExact = exact.values.map(_._2.toDouble).sum
    val inTwo = twoLevel.values.map(_._2.toDouble).sum
    assert(inTwo >= inExact - 1e-6,
      "two-level inertia below exact — impossible, distances broken")
    // On this near-uniform synthetic corpus high-dim distances
    // concentrate, so coarse routing mislabels a material fraction of
    // vectors — but almost costlessly (the competing centers are
    // nearly equidistant). The CLUSTERING-QUALITY bound is therefore
    // the tight one: total inertia within 5% of exact; the agreement
    // floor just catches the routing degenerating to noise.
    assert(frac >= 0.5,
      f"label agreement $frac%.3f below floor (inertia ratio ${inTwo / inExact}%.4f)")
    assert(inTwo <= inExact * 1.05,
      f"inertia ratio ${inTwo / inExact}%.4f exceeds quantizer-loss bound (agreement $frac%.3f)")
  }

  test("agg_cuped: adjustment can only shrink variance, reduction in [0,100]") {
    val r = q("agg_cuped").head()
    val varPost = r.getAs[Double]("var_post")
    val varAdj = r.getAs[Double]("var_adjusted")
    val red = r.getAs[Double]("var_reduction_pct")
    assert(varAdj <= varPost + 1e-9, "CUPED increased variance")
    assert(varAdj >= 0.0 && red >= 0.0 && red <= 100.0)
    // reduction must equal the variance ratio it claims
    assert(math.abs(red - 100.0 * (1.0 - varAdj / varPost)) < 0.01)
  }

  test("win_mann_kendall: trend label consistent with z, S bounded by pairs") {
    q("win_mann_kendall").collect().foreach { r =>
      val n = r.getAs[Long]("n_days")
      val sStat = r.getAs[Long]("s_stat")
      val z = r.getAs[Double]("z")
      assert(math.abs(sStat) <= n * (n - 1) / 2, "S exceeds pair count")
      val expect = if (z > 1.96) "increasing"
        else if (z < -1.96) "decreasing" else "none"
      assert(r.getAs[String]("trend") === expect)
    }
  }

  test("text_substring_dup: 32-char shingles shared by >=2 docs, truly present") {
    val rows = q("text_substring_dup").collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, Spec.sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val sh = r.getAs[String]("shingle")
      assert(sh.length === 32)
      assert(r.getAs[Long]("n_docs") >= 2L)
      // the reported min_doc really contains the shingle at a stride
      // offset — the detector reports real substrings, not artifacts
      assert(texts(r.getAs[Long]("min_doc")).contains(sh))
    }
  }

  test("graph_bipartite_project: valid cosine weights over capped degrees") {
    q("graph_bipartite_project").collect().foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      val cos = r.getAs[Double]("cosine")
      assert(cos > 0.0 && cos <= 1.0 + 1e-9,
        s"cosine $cos outside (0,1]: cooc can't exceed either degree")
    }
  }

  /** Durable-vs-local identity harness: run `keys` with no durable
    * conf, re-run them with `conf` pointed at a fresh tempdir, assert
    * every result row-identical AND that the reliable branch actually
    * wrote checkpoint files (no silent localCheckpoint fallback). */
  private def assertDurableIdentical(conf: String, keys: Seq[String]): Unit = {
    val base = keys.map(k => k -> q(k).collect().map(_.toString).sorted)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    try {
      spark.conf.set(conf, dir)
      base.foreach { case (k, rows) =>
        val durable = q(k).collect().map(_.toString).sorted
        assert(durable === rows,
          s"$k: durable-checkpoint result diverged from localCheckpoint path")
      }
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val wrote = try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close()
      assert(wrote > 0, "checkpointDir set but no checkpoint files written")
    } finally {
      spark.conf.unset(conf)
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }

  test("dedup_components: durable-checkpoint branch produces identical labels") {
    // The components per-key conf (persist → reliable checkpoint →
    // per-round unpersist on the RDD fixpoint) — kept as its own test
    // because it exercises the raw-RDD ckpt path, not Ckpt.df.
    assertDurableIdentical("spark.graft.components.checkpointDir",
      Seq("dedup_components"))
  }

  test("spark.graft.checkpointDir: durable branch identical across fixpoint families") {
    // Round 10 generalized the components durable-checkpoint pattern
    // (Ckpt) to every iterative/fixpoint operator. One representative
    // per touched lineage-truncation family runs under BOTH modes.
    assertDurableIdentical(Ckpt.DirConf, Seq(
      "graph_lpa",       // lpaOnUnd per-round labels
      "graph_kcore",     // survivors() per-peel
      "graph_khop",      // frontier + visited
      "graph_sssp",      // frontier Bellman-Ford
      "graph_random_walk", // checkpointed adjacency index
      "sim_pca_power",   // covFull + power-iteration steps
      "sample_kcenter",  // per-round min-distance state
      "sim_mmr_rerank",  // candidate state + per-round pick
      "text_tfidf",      // tf reuse checkpoint
      "text_lm_generate", // bigram table + per-step token
      "text_bpe_train")) // word-repr per-merge-round
  }

  test("Ckpt.Chain: durable fixpoint keeps O(1) checkpoints on disk, not O(rounds)") {
    // round-11 (advice): durable mode used to leave every round's
    // reliable checkpoint behind — a cluster sweep over the fixpoint
    // keys grew the dir unboundedly. Chain deletes generation N-2 once
    // N is materialized. graph_sssp checkpoints 7 generations through
    // one chain (seed dist + 3×(improved, dist)); at most 2 may remain.
    val dir = java.nio.file.Files.createTempDirectory("graft-chain").toString
    try {
      spark.conf.set(Ckpt.DirConf, dir)
      val local = spark.conf.getOption(Ckpt.DirConf) // ensure set
      assert(local.contains(dir))
      val rows = q("graph_sssp").collect()
      assert(rows.nonEmpty)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val rddDirs = try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .count(p => p.getFileName.toString.startsWith("rdd-") &&
            java.nio.file.Files.isDirectory(p))
      } finally walk.close()
      assert(rddDirs <= 2, s"expected keep-last-2, found $rddDirs rdd-* dirs")
      assert(rddDirs >= 1, "no reliable checkpoint written at all")
    } finally {
      spark.conf.unset(Ckpt.DirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("stored adjacency rebuilds when the edge snapshot changes under the SAME path") {
    // round-11 (verdict 8): graph_random_walk depends on a stored
    // adjacency index keyed by Stage.inputStamp(lineitem). The staleness
    // guarantee is STRUCTURAL — a regenerated input (same path, new
    // mtime/size) resolves to a FRESH artifact path, so a stale
    // _SUCCESS marker can never serve the old snapshot. Prove the
    // trigger end-to-end: run on a fixture copy, re-stamp the input in
    // place, run again, and require a SECOND adjidx artifact (plus
    // identical rows, since the bytes didn't change).
    val fix = java.nio.file.Files.createTempDirectory("graft-stale").toString
    val stage = java.nio.file.Files.createTempDirectory("graft-stalestage").toString
    try {
      for (t <- Seq("lineitem", "part")) // part: seed table for q-keys sharing gpath
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"${Spec.sf001}/$t.parquet"),
          java.nio.file.Paths.get(s"$fix/$t.parquet"))
      spark.conf.set("spark.graft.stage.dir", stage)
      def adjDirs() = {
        val f = new java.io.File(stage)
        f.listFiles().count(_.getName.startsWith("graft_adjidx_"))
      }
      val run1 = SparkEntry.queries("graph_random_walk")(spark, fix)
        .collect().map(_.toString).sorted
      assert(adjDirs() === 1, "first run must build exactly one adjacency artifact")
      // regenerate the input IN PLACE: same path, same bytes, new mtime
      val li = new java.io.File(s"$fix/lineitem.parquet")
      assert(li.setLastModified(li.lastModified() + 60000))
      val run2 = SparkEntry.queries("graph_random_walk")(spark, fix)
        .collect().map(_.toString).sorted
      assert(adjDirs() === 2,
        "re-stamped input must rotate the artifact path and REBUILD (stale _SUCCESS abandoned)")
      assert(run1 === run2, "identical bytes must give identical walks")
    } finally {
      spark.conf.unset("spark.graft.stage.dir")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fix))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    }
  }

  test("Ckpt.ensure: cross-base re-point is counted (double-conf warning path)") {
    val a = java.nio.file.Files.createTempDirectory("graft-ck-a").toString
    val b = java.nio.file.Files.createTempDirectory("graft-ck-b").toString
    try {
      Ckpt.ensure(spark, a) // settle (an earlier test may have set another base)
      val before = Ckpt.crossBaseRepoints
      Ckpt.ensure(spark, a) // same base: no re-point, no warn
      assert(Ckpt.crossBaseRepoints === before)
      Ckpt.ensure(spark, b) // cross-base: warned + counted
      assert(Ckpt.crossBaseRepoints === before + 1)
      Ckpt.ensure(spark, b)
      assert(Ckpt.crossBaseRepoints === before + 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(a))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(b))
    }
  }

  test("pack_sequences: chunks fill to the budget and docs pack completely") {
    val rows = q("pack_sequences").collect()
    val perChunk = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val lastChunk = perChunk.keys.max
    perChunk.foreach { case (c, n) =>
      if (c != lastChunk) assert(n === 512L, s"chunk $c holds $n tokens")
      else assert(n > 0L && n <= 512L)
    }
    // every document's overlaps sum to its token count — nothing lost
    val perDoc = rows.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val toks = Tables.documents(spark, Spec.sf001)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (doc, n) => assert(n === toks(doc)) }
  }

  test("cosine: self-similarity is 1 on unit vectors") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Spec.sf001)
      .select(col("vec_id"), expr(
        """CAST(aggregate(embedding, CAST(0 AS DECIMAL(38,18)),
             (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              AS DECIMAL(38,18)) AS DECIMAL(38,18))) AS DOUBLE)""").as("ss"))
      .as[(Long, Double)].collect()
    e.foreach { case (_, ss) => assert(math.abs(ss - 1.0) < 1e-4) }
  }

  test("sim_cosine_topk: ranks are 1..5 per probe, cos within [-1,1]") {
    val rows = q("sim_cosine_topk").collect()
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.values.foreach { g =>
      assert(g.map(_.getInt(3)).sorted.toSeq === (1 to g.length))
    }
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0001))
  }

  test("sampled and t-digest quantiles land within error of the exact percentile") {
    val exact = q("agg_percentile").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap // p50
    val sampled = q("agg_approx_quantile").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap // p50_approx
    val tdigest = operators.Relational.nativeSketches("sketch_tdigest_native")(
        spark, Spec.sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet === sampled.keySet)
    assert(exact.keySet === tdigest.keySet)
    exact.foreach { case (k, p50) =>
      assert(math.abs(sampled(k) - p50) <= math.max(2.0, p50 * 0.05),
        s"group $k: exact=$p50 sampled=${sampled(k)}")
      assert(math.abs(tdigest(k) - p50) <= math.max(2.0, p50 * 0.05),
        s"group $k: exact=$p50 tdigest=${tdigest(k)}")
    }
  }

  test("dedup_semantic: subset of brute-force pairs, with a recall floor") {
    val sem = q("dedup_semantic").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.nonEmpty)
    // brute force: ALL pairs over the corpus with the same exact
    // fixed-point cosine and the same 0.35 threshold — no clustering
    val e = Tables.embeddings(spark, Spec.sf001)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        col("v").cast(org.apache.spark.sql.types.DoubleType).as("v"))
    val nr = e.groupBy("vec_id")
      .agg(sqrt(Det.sumFixed(col("v") * col("v"))).as("nrm"))
    val dots = e.select(col("vec_id").as("a"), col("pos"), col("v").as("va"))
      .join(e.select(col("vec_id").as("b"), col("pos"), col("v").as("vb")), "pos")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(Det.sumFixed(col("va") * col("vb")).as("dotd"))
    val brute = dots
      .join(nr.select(col("vec_id").as("a"), col("nrm").as("na")), "a")
      .join(nr.select(col("vec_id").as("b"), col("nrm").as("nb")), "b")
      .filter(round(col("dotd") / (col("na") * col("nb")), 4) >= 0.35)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0 by construction: a reported pair shares a cluster
    // AND clears the identical threshold, so it must be a brute pair
    assert(sem.subsetOf(brute), s"false positives: ${sem -- brute}")
    // recall: same-cluster bucketing recovers a stable floor of the
    // true pairs on this corpus (measured 0.38 at sf0.001, 99/258 —
    // modest because this synthetic corpus's "near-dups" sit at
    // cos ≈ 0.35-0.49, barely above background; on real ≥0.9-cos
    // near-dup corpora the pair mass concentrates inside clusters and
    // SemDeDup recall approaches 1)
    val recall = sem.size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall (${sem.size}/${brute.size})")
  }

  test("sim_ann_ivf: ranked correctly, bounded probe width, deterministic") {
    val rows = q("sim_ann_ivf").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      // ranks contiguous from 1, cos non-increasing with rank
      val byRank = g.sortBy(_.getInt(4))
      assert(byRank.map(_.getInt(4)).toSeq === (1 to g.length))
      val cosByRank = byRank.map(_.getDouble(3)).toSeq
      assert(cosByRank.zip(cosByRank.drop(1)).forall { case (x, y) => x >= y })
      // multi-probe searches at most nprobe=24 inverted lists per probe
      assert(g.map(_.getLong(1)).distinct.length <= 24)
    }
    // deterministic across runs
    val again = q("sim_ann_ivf").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  /** recall@3 of an ANN result against the brute-force ground truth —
    * the check that converts "runs and is shaped right" into "retrieves
    * the right neighbors". Probes are restricted to the intersection of
    * the two queries' probe sets (vec_id < 10). */
  private def recallAt3(annKey: String): Double = {
    val truth = q("sim_cosine_topk").collect()
      .filter(r => r.getInt(3) <= 3)
      .groupBy(_.getLong(0)).map { case (a, g) => a -> g.map(_.getLong(1)).toSet }
    val bIdx = if (annKey == "sim_ann_ivf") 2 else 1
    val got = q(annKey).collect()
      .filter(r => r.getLong(0) < 10)
      .groupBy(_.getLong(0)).map { case (a, g) => a -> g.map(_.getLong(bIdx)).toSet }
    val recalls = truth.map { case (a, t) =>
      (t & got.getOrElse(a, Set.empty)).size.toDouble / t.size
    }
    recalls.sum / recalls.size
  }

  test("sim_ann_ivf recall@3 >= 0.8 vs brute-force ground truth") {
    val r = recallAt3("sim_ann_ivf")
    info(f"IVF recall@3 = $r%.3f")
    assert(r >= 0.8, s"IVF recall@3 = $r")
  }

  test("sim_ann_lsh recall@3 >= 0.7 vs brute-force ground truth") {
    val r = recallAt3("sim_ann_lsh")
    info(f"LSH recall@3 = $r%.3f")
    assert(r >= 0.7, s"LSH recall@3 = $r")
  }

  test("sim_pq_search recall@5 >= 0.85 vs brute-force L2 ground truth") {
    // Exact L2 top-5 per probe (same fixed-point longs as the key).
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, Spec.sf001)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"), col("v").cast("double").as("v"))
    val p = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("a"), col("pos"), col("v").as("va"))
    val dd = col("va") - col("vb")
    val l2 = broadcast(p)
      .join(e.select(col("vec_id").as("b"), col("pos"), col("v").as("vb")), "pos")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(sum(floor(dd * dd * Det.FixedPoint).cast("long")).as("l2l"))
    val w = Window.partitionBy("a").orderBy(col("l2l"), col("b"))
    val truth = l2.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5).collect()
      .groupBy(_.getLong(0)).map { case (a, g) => a -> g.map(_.getLong(1)).toSet }
    val got = q("sim_pq_search").collect()
      .groupBy(_.getLong(0)).map { case (a, g) => a -> g.map(_.getLong(1)).toSet }
    val recalls = truth.map { case (a, t) =>
      (t & got.getOrElse(a, Set.empty)).size.toDouble / t.size
    }
    val r = recalls.sum / recalls.size
    info(f"PQ shortlist+rerank recall@5 = $r%.3f")
    // 0.86 measured with the Lloyd-trained codebook (0.92 seed-only at
    // this tiny SF; 0.80 → 0.88 at sf0.01 where training has data)
    assert(r >= 0.85, s"PQ recall@5 = $r")
    // And the emitted l2 distances are the TRUE distances (the re-rank
    // is exact): every returned pair's l2l matches the ground table.
    val truthMap = l2.collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1)) -> r0.getLong(2)).toMap
    q("sim_pq_search").collect().foreach { r0 =>
      val exp = truthMap((r0.getLong(0), r0.getLong(1)))
      assert(math.abs(r0.getDouble(2) - exp.toDouble / Det.FixedPoint) < 1e-3)
    }
  }

  test("heavy_hitters sketch: Misra-Gries guarantees under eviction") {
    import spark.implicits._
    graft.functions.HeavyHittersAgg.register(spark)
    // 200 distinct items, k = 16 → eviction exercised. Skew: item "hot1"
    // appears 400×, "hot2" 200×, the 198 others ~10× each (n ≈ 2580,
    // n/k ≈ 162 — both hot items exceed the n/k bar).
    val rows = Seq.tabulate(400)(_ => "hot1") ++ Seq.tabulate(200)(_ => "hot2") ++
      (1 to 198).flatMap(i => Seq.tabulate(10)(_ => s"cold$i"))
    val n = rows.length.toLong
    val got = rows.toDF("v").repartition(8) // force multi-partition merges
      .agg(expr("heavy_hitters(v, 16)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt")).as[(String, Long)].collect().toMap
    val trueCnt = Map("hot1" -> 400L, "hot2" -> 200L).withDefaultValue(10L)
    // (a) items above n/k must be present
    assert(got.contains("hot1") && got.contains("hot2"), got.keys.toSeq.sorted.take(5))
    // (b) reported counts obey est ≤ true ≤ est + n/k
    got.foreach { case (item, est) =>
      val t = trueCnt(item)
      assert(est <= t && t <= est + n / 16 + 1, s"$item est=$est true=$t")
    }
    // (c) sketch size bounded by k
    assert(got.size <= 16)
  }

  test("heavy_hitters is exact and deterministic when distinct ≤ k") {
    val a = q("agg_heavy_hitters").collect()
    val b = q("agg_heavy_hitters").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val direct = Tables.part(spark, Spec.sf001)
      .groupBy(col("p_brand")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.map(r => r.getString(0) -> r.getLong(1)).toMap === direct)
  }

  test("topk_by native aggregate equals the rank-window formulation") {
    val native = q("win_topk_native").collect().map(_.toString).toSeq
    val window = q("win_topk_per_group").collect().map(_.toString).toSeq
    assert(native === window && native.nonEmpty)
  }

  test("topk_by is exact across many partitions and deterministic") {
    import spark.implicits._
    graft.functions.TopKByAgg.register(spark)
    // 1000 rows, unique ord → global top-5 is fully determined
    val df = (1 to 1000).map(i => (i.toLong, s"p$i")).toDF("v", "tag")
      .repartition(16)
    def run() = df
      .agg(expr("topk_by(v, tag, 5)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.ord"), col("e.payload")).as[(Long, String)].collect().toSeq
    val got = run()
    assert(got === (0 until 5).map(i => (1000L - i, s"p${1000 - i}")))
    assert(got === run())
  }

  test("bottomk_distinct_by: duplicates never occupy two slots; exact across partitionings") {
    import spark.implicits._
    graft.functions.BottomKDistinctByAgg.register(spark)
    // every value appears 3× — the aggregate must replay
    // distinct → order by (md5, v) → take 4, regardless of where the
    // duplicates land, so a 1-partition and a 16-partition run (merge
    // path exercised) must agree with the explicit window formulation
    val vals = (1 to 200).flatMap(i => Seq.fill(3)(i.toLong))
    def run(parts: Int) = vals.toDF("v").repartition(parts)
      .agg(expr("bottomk_distinct_by(md5(cast(v as string)), v, 4)").as("ks"))
      .select(explode(col("ks")).as("e"))
      .select(col("e.payload")).as[Long].collect().toSeq
    val oracle = vals.toDF("v").distinct()
      .orderBy(md5(col("v").cast("string")), col("v"))
      .limit(4).as[Long].collect().toSeq
    assert(run(1) === oracle && run(16) === oracle)
    assert(oracle.distinct.length === 4)
  }

  test("bottomk_distinct_by: struct ord (-score, id) replays the desc rank window") {
    import spark.implicits._
    graft.functions.BottomKDistinctByAgg.register(spark)
    // the sim_cosine_topk usage shape: keep the top-3 by score desc
    // (ties by id) per group, ord = struct(-score, id). Scores collide
    // across ids on purpose so the tiebreak path is exercised.
    val rows = for (g <- 1 to 5; i <- 1 to 40)
      yield (g, i.toLong, ((i * 7) % 11).toDouble / 10.0)
    val df = rows.toDF("g", "id", "score").repartition(16)
    val got = df.groupBy("g")
      .agg(expr("bottomk_distinct_by(struct(-score, id), struct(id, score), 3)")
        .as("ks"))
      .select(col("g"), posexplode(expr("transform(ks, x -> x.payload)")))
      .select(col("g"), (col("pos") + 1).as("rnk"), col("col.id"), col("col.score"))
      .collect().map(_.toString).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3).select("g", "rnk", "id", "score")
      .collect().map(_.toString).sorted.toSeq
    assert(got === want && got.size === 15)
  }

  test("null-ord sentinel: bottomk/min_by with NULL score match the NULLS-LAST window") {
    import spark.implicits._
    graft.functions.BottomKDistinctByAgg.register(spark)
    // The zero-norm-embedding shape from the round-11 advice: cos is
    // NULL for some candidates (divide-by-zero → null). The window
    // `ORDER BY score DESC` ranks nulls LAST (Spark + DuckDB default);
    // a null struct-ord field ranks FIRST ascending, so the shipped
    // plans coalesce -score to +Inf. Group 1 has plenty of non-null
    // rows (nulls must never appear); group 2 has only 2 non-null of
    // k=3 (the null row MUST appear, in last place) — both directions
    // of the divergence are pinned here.
    val rows = Seq[(Int, Long, java.lang.Double)](
      (1, 10L, 0.9), (1, 11L, 0.8), (1, 12L, 0.7), (1, 13L, 0.6),
      (1, 14L, null), (1, 15L, null),
      (2, 20L, 0.5), (2, 21L, 0.4), (2, 22L, null), (2, 23L, null))
    val df = rows.toDF("g", "id", "score").repartition(7)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc_nulls_last, col("id"))
    val want = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).select("g", "rnk", "id", "score")
      .collect().map(_.toString).sorted.toSeq
    val gotAgg = df.groupBy("g")
      .agg(expr("bottomk_distinct_by(" +
        "struct(coalesce(-score, double('Infinity')), id), " +
        "struct(id, score), 3)").as("ks"))
      .select(col("g"), posexplode(expr("transform(ks, x -> x.payload)")))
      .select(col("g"), (col("pos") + 1).as("rnk"), col("col.id"),
        col("col.score"))
      .collect().map(_.toString).sorted.toSeq
    assert(gotAgg === want)
    // null row surfaced for group 2 (3rd slot), never for group 1
    assert(want.count(_.contains("2,3,22,null")) === 1, want.mkString("|"))
    // min_by rank-1 with the same sentinel = the window's rank-1 row
    val want1 = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1).select("g", "id", "score")
      .collect().map(_.toString).sorted.toSeq
    val got1 = df.groupBy("g")
      .agg(min_by(struct(col("id"), col("score")),
        struct(coalesce(-col("score"), lit(Double.PositiveInfinity))
          .as("nc"), col("id"))).as("k"))
      .select(col("g"), col("k.id"), col("k.score"))
      .collect().map(_.toString).sorted.toSeq
    assert(got1 === want1)
  }

  test("wd fixture goldens: 10 entities, 21 label rows, claim profile") {
    // redirect stubs (Q8→Q2, Q9→Q42) surface ONLY in wd_redirects —
    // the entity scan stays at 10, stubs never load as empty entities
    assert(q("scan_ndjson_entities").count() === 10L)
    val redir = q("wd_redirects").collect()
    assert(redir.map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("Q8", "Q2"), ("Q9", "Q42")))
    assert(!q("wd_labels_fallback").collect()
      .exists(r => Set("Q8", "Q9")(r.getString(0))))
    // resolution: Q5's P361 -> Q8 rewrites to Q2; direct targets pass
    val res = q("wd_statements_resolved").collect()
    val q5 = res.filter(_.getString(0) == "Q5")
    assert(q5.length === 1 && q5.head.getString(3) === "Q8"
      && q5.head.getString(4) === "Q2" && q5.head.getBoolean(5))
    assert(res.filter(!_.getBoolean(5))
      .forall(r => r.getString(3) == r.getString(4)))
    val flat = q("wd_entity_flatten").collect()
    assert(flat.length === 21)
    // Q6 has no labels → absent from flatten but present in scan
    assert(!flat.map(_.getString(0)).contains("Q6"))
    val claims = q("wd_claims_flatten").collect()
    assert(claims.length === 17)
    // truthy: preferred shadows normal per (id,pid); deprecated never shows
    val truthy = q("wd_statements_truthy").collect()
    val q1p580 = truthy.filter(r => r.getString(0) == "Q1" && r.getString(1) == "P580")
    assert(q1p580.map(_.getString(2)).toSeq === Seq("Q1$st3"))
    assert(!truthy.exists(_.getString(0) == "Q7")) // deprecated-only entity
    assert(truthy.forall(_.getString(3) != "deprecated"))
    val snaktypes = claims.map(_.getString(4)).toSet
    assert(snaktypes === Set("value", "somevalue", "novalue"))
    // year-12000 time survives as raw JSON (beyond TimestampType range)
    val far = claims.filter(r => r.getString(0) == "Q4" && r.getString(1) == "P585")
    assert(far.length === 1 && far.head.getString(6).contains("+12000-01-01"))
    // sitelinks: 4 rows (Q1, Q2×2, Q42), badges counted
    val sl = q("wd_sitelinks_flatten").collect()
    assert(sl.length === 4)
    assert(sl.filter(_.getString(0) == "Q1").head.getInt(4) === 1)
    // qualifiers: 5 snaks across 4 properties, snak-list order kept
    val qs = q("wd_qualifiers_flatten").collect()
    assert(qs.length === 5)
    val q1p459 = qs.filter(r => r.getString(0) == "Q1" && r.getString(3) == "P459")
    assert(q1p459.map(r => (r.getInt(4), r.getString(5))).toSeq
      === Seq((0, "value"), (1, "novalue")))
    assert(qs.map(_.getString(5)).toSet === Set("value", "novalue", "somevalue"))
  }

  test("multimodal stub decode is deterministic") {
    val f1 = graft.operators.Multimodal.stubDecodeFeature("hello".getBytes("UTF-8"))
    val f2 = graft.operators.Multimodal.stubDecodeFeature("hello".getBytes("UTF-8"))
    assert(f1 === f2)
    assert(f1 !== graft.operators.Multimodal.stubDecodeFeature("world".getBytes("UTF-8")))
    val rows = q("multimodal_decode")
    assert(rows.count() === Tables.documents(spark, Spec.sf001).count())
  }

  test("JdbcSink carries the Postgres bulk-load options; forUrl dispatches") {
    val jdbc = graft.sources.JdbcSink("jdbc:postgresql://db:5432/wd", "entities",
      user = "u", password = "p", batchSize = 5000, numPartitions = 8)
    val o = jdbc.options
    assert(o("url").contains("reWriteBatchedInserts=true"))
    assert(o("dbtable") === "entities" && o("batchsize") === "5000"
      && o("numPartitions") === "8" && o("isolationLevel") === "READ_COMMITTED")
    assert(graft.sources.Sink.forUrl("jdbc:postgresql://x/y").isInstanceOf[graft.sources.JdbcSink])
    assert(graft.sources.Sink.forUrl("/tmp/x").isInstanceOf[graft.sources.ParquetSink])
  }

  test("set algebra: (A except B) ∪ (A intersect B) = distinct A") {
    val a = Tables.customer(spark, Spec.sf001).select(col("c_custkey").as("k"))
    val b = Tables.orders(spark, Spec.sf001)
      .filter(col("o_orderstatus") === "P").select(col("o_custkey").as("k"))
    val together = a.except(b).union(a.intersect(b)).distinct().count()
    assert(together === a.distinct().count())
  }

  test("window/groupBy consistency: running sum final row equals total") {
    val rs = q("win_running_sum").collect()
    val total = rs.last.getDouble(2)
    val direct = Tables.lineitem(spark, Spec.sf001)
      .agg(Det.sumMoney(col("l_extendedprice"))).head().getDouble(0)
    assert(math.abs(total - direct) < 1e-6)
  }

  test("agg_stats_corr matches Spark's native second-moment aggregates") {
    // The exact-decimal closed forms must agree with the engine's own
    // stddev_samp/var_samp/covar_samp/corr to float tolerance.
    val ours = q("agg_stats_corr").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val native = Tables.lineitem(spark, Spec.sf001)
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")), var_samp(col("l_extendedprice")),
        covar_samp(col("l_quantity"), col("l_extendedprice")),
        corr(col("l_quantity"), col("l_extendedprice")))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    for ((k, (sd, vp, cv, co)) <- ours) {
      val (nsd, nvp, ncv, nco) = native(k)
      assert(math.abs(sd - nsd) < 1e-3 && math.abs(co - nco) < 1e-3)
      // variance/covariance magnitudes are ~1e4 — compare relatively
      assert(math.abs(vp - nvp) / math.abs(nvp) < 1e-6)
      assert(math.abs(cv - ncv) / math.max(1.0, math.abs(ncv)) < 1e-6)
    }
  }

  test("agg_mode: winner's count is the max count within its group") {
    val modes = q("agg_mode").collect()
    val counts = Tables.orders(spark, Spec.sf001)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .groupBy(_.getString(0))
    for (m <- modes) {
      val grp = counts(m.getString(0))
      assert(m.getLong(2) == grp.map(_.getLong(2)).max)
      // deterministic tie-break: smallest value among max-count ties
      val ties = grp.filter(_.getLong(2) == m.getLong(2)).map(_.getString(1))
      assert(m.getString(1) == ties.min)
    }
  }

  test("wd lexeme goldens: lemmas, forms (sorted features), senses") {
    // fixture: L1..L5 — 6 lemma rows (L3 is de + de-at), 8 form-rep
    // rows (L2-F1 has en + en-gb; L3 has no forms), 8 gloss rows
    val lem = q("wd_lexemes_flatten").collect()
    assert(lem.length === 6)
    val l3 = lem.filter(_.getString(0) == "L3")
    assert(l3.map(_.getString(3)).toSeq === Seq("de", "de-at"))
    assert(l3.forall(r => r.getInt(5) === 0 && r.getInt(6) === 1)) // no forms, 1 sense
    val forms = q("wd_lexeme_forms").collect()
    assert(forms.length === 8)
    // multi-feature form joins SORTED (set semantics, not dump order)
    val f2 = forms.filter(_.getString(1) == "L1-F2")
    assert(f2.length === 1 && f2.head.getString(6) === "Q3910936,Q51929074")
    // hyphenated language codes survive both engines' json paths
    assert(forms.exists(r => r.getString(1) == "L2-F1" && r.getString(3) == "en-gb"))
    assert(forms.filter(_.getString(0) == "L3").isEmpty)
    val senses = q("wd_lexeme_senses").collect()
    assert(senses.length === 8)
    assert(senses.filter(_.getString(0) == "L4").isEmpty) // senseless lexeme
    assert(senses.count(_.getString(1) == "L1-S1") === 2) // en + de glosses
  }

  test("wd_labels_fallback: one row per entity, en wins when present") {
    val rows = q("wd_labels_fallback").collect()
    val perEntity = q("scan_ndjson_entities").collect()
    assert(rows.length == perEntity.length) // exactly one row per entity
    val enIds = q("wd_entity_flatten").collect()
      .filter(_.getString(2) == "en").map(_.getString(0)).toSet
    for (r <- rows if enIds(r.getString(0)))
      assert(r.getString(1) == "en")
  }

  test("etl_corpus_curate agrees with its standalone stage keys") {
    val out = q("etl_corpus_curate").collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    // language gate: every curated doc is predicted English
    val lang = q("text_langid").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.forall(lang(_) == "en"))
    // decontamination gate: no curated doc is a flagged train doc
    val contaminated = q("text_decontaminate").collect()
      .map(_.getLong(0)).toSet
    assert(ids.intersect(contaminated).isEmpty)
    // quality gate: reported metrics respect the thresholds
    for (r <- out)
      assert(r.getInt(1) >= 30 && r.getDouble(2) >= 0.3)
  }

  test("text_gopher_rules: keep is exactly the conjunction of its rules") {
    val rows = q("text_gopher_rules").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getBoolean(9) ==
        (r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8)))
    // the gate must discriminate on this fixture, not pass/fail everything
    val kept = rows.count(_.getBoolean(9))
    assert(kept > 0 && kept < rows.length)
  }

  test("text_pii_mask: masked output never retains a digit") {
    val rows = q("text_pii_mask").collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(!r.getString(1).exists(_.isDigit))
  }

  test("fn_regexp: masking round-trips the extracted id digits") {
    for (r <- q("fn_regexp").collect()) {
      val digits = r.getString(1)
      assert(r.getString(3).replace("<ID>", digits)
        == s"Customer#$digits")
      assert(r.getBoolean(2) == (digits.length >= 6))
    }
  }

  test("etl_user_features agrees with win_sessionize per user") {
    val feats = q("etl_user_features").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap // n_sessions, n_events
    val sess = q("win_sessionize").collect().groupBy(_.getLong(0))
    assert(feats.keySet === sess.keySet)
    for ((u, rows) <- sess) {
      assert(feats(u)._1 === rows.length.toLong, s"user $u session count")
      assert(feats(u)._2 === rows.map(_.getLong(2)).sum, s"user $u event count")
    }
  }

  test("text_line_dedup keeps exactly one copy of every distinct line") {
    val rows = q("text_line_dedup").collect()
    val kept = rows.map(_.getLong(2)).sum
    val distinctLines = Tables.documents(spark, Spec.sf001)
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= lit("")).as("tk"))
      .filter(size(col("tk")) > 0)
      .selectExpr(
        """explode(transform(sequence(0, CAST(((size(tk) - 1) div 10) AS INT)),
             i -> array_join(slice(tk, i * 10 + 1, 10), ' '))) AS line""")
      .distinct().count()
    assert(kept === distinctLines,
      s"kept $kept lines but corpus has $distinctLines distinct lines")
  }

  test("agg_sketch_union: unioned daily sketches track the exact distinct count") {
    // KMV key: at sf0.001 the union never fills (15 distinct < k) so
    // the estimate must be EXACT; at sf0.1 the estimator is live and
    // the deterministic draw must land inside the σ≈9% envelope.
    val exactSmall = Tables.events(spark, Spec.sf001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmvSmall = q("agg_sketch_union").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kmvSmall.keySet === exactSmall.keySet)
    for ((k, ex) <- exactSmall)
      assert(kmvSmall(k) === ex.toDouble, s"$k: unfilled sketch must be exact")
    val exactBig = Tables.events(spark, "/root/testdata/sf0.1")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmvBig = SparkEntry.queries("agg_sketch_union")(
        spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, ex) <- exactBig)
      assert(math.abs(kmvBig(k) - ex) / ex <= 0.25,
        s"$k: union approx ${kmvBig(k)} vs exact $ex")
    // native DataSketches union twin: lgConfigK=12 → rsd ≈ 1.6%; a 10%
    // bound is far outside noise, so a failure means the union path
    // (not the sketch) is broken.
    val native = operators.Relational.nativeSketches(
        "sketch_hll_union_native")(spark, Spec.sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native.keySet === exactSmall.keySet)
    for ((k, ex) <- exactSmall) {
      val ap = native(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.1,
        s"$k: native union approx $ap vs exact $ex exceeds 10%")
    }
  }

  test("sim_pq_quantize: Lloyd-trained codebook beats the seed; codes well-formed") {
    // The codebook is the md5 seed sample refined by one per-subspace
    // Lloyd round; with assignments fixed, means minimize within-cell
    // squared error, so total reconstruction error must strictly drop
    // vs encoding with the raw seed (FLOAT rounding perturbs ~1e-7
    // relative — far below the improvement).
    val seedErr = operators.SimOps.testPqTotalRecon(spark, Spec.sf001,
      trained = false)
    val trainedErr = operators.SimOps.testPqTotalRecon(spark, Spec.sf001,
      trained = true)
    info(s"total recon err (fixed-point): seed=$seedErr trained=$trainedErr")
    assert(trainedErr < seedErr,
      s"Lloyd round must improve reconstruction: $trainedErr !< $seedErr")
    // every vector emits all 8 subspace codes in range, err non-negative
    val rows = q("sim_pq_quantize").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    for ((_, code, err) <- rows) {
      val parts = code.split("-")
      assert(parts.length === 8 && parts.forall(p => p.toInt >= 0 && p.toInt < 16))
      assert(err >= 0.0)
    }
  }

  test("win_funnel: stage counts are monotone non-increasing") {
    val rows = q("win_funnel").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      Seq((1, "view"), (2, "click"), (3, "purchase")))
    // strictly-ordered funnel: every stage-k survivor reached stage k-1
    assert(rows(0)._3 >= rows(1)._3 && rows(1)._3 >= rows(2)._3,
      s"funnel must narrow: ${rows.toSeq}")
    assert(rows(0)._3 > 0, "some user views at sf0.001")
  }

  test("join_range_bucketed agrees with the direct containment join") {
    // Bucketization is a candidate-generation strategy; it must be
    // invisible in the answer. Replay the semantics as a plain range
    // join (fine at spec scale) and compare row for row.
    val got = q("join_range_bucketed").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    val iv = Tables.orders(spark, Spec.sf001)
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey").as("win_id"), col("o_orderdate").as("ws"),
        date_add(col("o_orderdate"), 14).as("we"))
    val direct = iv.join(Tables.lineitem(spark, Spec.sf001),
        col("l_shipdate") >= col("ws") && col("l_shipdate") < col("we"))
      .groupBy("win_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === direct)
  }

  test("multimodal_digest: exactly one canonical blob per digest") {
    val rows = q("multimodal_digest").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
    val byDigest = rows.groupBy(_._2)
    assert(byDigest.forall { case (_, g) => g.count(_._4) == 1 })
    // the canonical row is the lowest doc_id of its digest group
    for ((_, g) <- byDigest)
      assert(g.filter(_._4).head._1 === g.map(_._1).min)
    assert(rows.forall { case (_, dg, n, _) => dg.length == 64 && n >= 0 })
  }

  test("agg_regression r2 equals corr^2 from agg_stats_corr") {
    val r2 = q("agg_regression").collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val corr = q("agg_stats_corr").collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(r2.keySet === corr.keySet)
    for ((k, v) <- r2)
      assert(math.abs(v - corr(k) * corr(k)) < 2e-3,
        s"$k: r2 $v vs corr^2 ${corr(k) * corr(k)}")
  }

  test("etl_scd2: one current version per key, ranges chain without gaps") {
    val rows = q("etl_scd2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.get(3),
        Option(r.get(4)), r.getBoolean(5)))
    for ((_, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._2)
      assert(sorted.count(_._5) == 1, "exactly one current row per key")
      assert(sorted.last._5 && sorted.last._4.isEmpty,
        "the last version is the open-ended current one")
      // each version closes exactly where the next opens
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
        assert(a._4.contains(b._3), s"range chain broken: $a -> $b")
    }
  }

  test("etl_cdc_apply: delete-last users are absent, upsert-last present") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec").desc, col("event_id").desc)
    val lastOps = Tables.events(spark, Spec.sf001)
      .filter(col("event_type").isin("signup", "click", "view", "error"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        Det.epochS(col("ts")).as("sec"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val snapshot = q("etl_cdc_apply").collect().map(_.getLong(0)).toSet
    for ((u, op) <- lastOps)
      assert(snapshot.contains(u) == (op != "error"),
        s"user $u last op $op vs snapshot ${snapshot.contains(u)}")
  }

  test("win_gap_fill: dense month spine, zero rows only where no orders") {
    val rows = q("win_gap_fill").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    for ((_, g) <- rows.groupBy(_._1)) {
      val months = g.map(_._2).sortBy(_.toEpochDay)
      // consecutive first-of-month dates with no gaps
      for (Array(a, b) <- months.sliding(2).map(_.toArray))
        assert(b == a.plusMonths(1), s"gap in spine: $a -> $b")
      assert(months.forall(_.getDayOfMonth == 1))
    }
    // zero-filled months exist (the key's reason to exist) and endpoints
    // are never zero-filled (they anchor each key's span)
    assert(rows.exists(_._3 == 0.0), "fixture has month gaps to fill")
    for ((_, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._2.toEpochDay)
      assert(sorted.head._3 > 0.0 && sorted.last._3 > 0.0)
    }
  }

  test("agg_retention: offset-0 cell equals cohort size") {
    val rows = q("agg_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._2 >= 0), "offsets are non-negative")
    val cohortSizes = Tables.events(spark, Spec.sf001)
      .select(col("user_id"), Det.epochS(col("ts")).as("sec"))
      .select(col("user_id"), expr("sec div 604800").as("wk"))
      .groupBy("user_id").agg(min(col("wk")).as("c_wk"))
      .groupBy("c_wk").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val zeroCells = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(zeroCells === cohortSizes,
      "every cohort member is active in their own first week")
  }

  test("join_interval_overlap agrees with the direct overlap join") {
    val got = q("join_interval_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val o = Tables.orders(spark, Spec.sf001)
    val a = o.filter(col("o_custkey") % 31 === 0)
      .select(col("o_orderkey").as("a_id"), col("o_orderdate").as("sa"),
        expr("o_orderdate + INTERVAL 21 DAY").as("ea"))
    val b = o.filter(col("o_custkey") % 37 === 0)
      .select(col("o_orderdate").as("sb"),
        expr("o_orderdate + INTERVAL 14 DAY").as("eb"))
    val direct = a.join(b, col("sa") < col("eb") && col("sb") < col("ea"))
      .groupBy("a_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === direct, "bucket ownership must emit each pair exactly once")
  }

  test("agg_rolling_dau: WAU dominates DAU and equals the direct window") {
    val rows = q("agg_rolling_dau").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, dau, wau) => wau >= dau })
    // spot-check one day against a direct [d-6, d] distinct count
    val (d0, _, wau0) = rows.maxBy(_._1)
    val direct = Tables.events(spark, Spec.sf001)
      .select(col("user_id"), Det.epochS(col("ts")).as("sec"))
      .select(col("user_id"), expr("sec div 86400").as("day"))
      .filter(col("day") >= d0 - 6 && col("day") <= d0)
      .select("user_id").distinct().count()
    assert(wau0 === direct)
  }

  test("wd_diff classifies every diff class correctly (fixture golden)") {
    val got = q("wd_diff").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // revids: Q1..Q7=1001..1007, P31=2001, P625=2002, Q42=1042.
    // v1 drops revid%3=0 (Q2,Q5,P31); v2 drops revid%7=0 (Q1,P625);
    // v2 re-labels revid%2=0 (Q4,Q6,Q42 among the survivors).
    assert(got === Map(
      "Q1" -> "removed", "P625" -> "removed",
      "Q2" -> "added", "Q5" -> "added", "P31" -> "added",
      "Q4" -> "changed", "Q6" -> "changed", "Q42" -> "changed",
      "Q3" -> "unchanged", "Q7" -> "unchanged"))
  }

  test("sample_weighted: ranks are dense and favor long documents") {
    val rows = q("sample_weighted").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    assert(rows.map(_._2).distinct.length == rows.length, "sampling is without replacement")
    // A-Res with w = n_chars must overrepresent long docs: the sample's
    // mean length should exceed the corpus mean (weak but directional).
    val corpusMean = Tables.documents(spark, Spec.sf001)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val sampleMean = rows.map(_._3.toDouble).sum / rows.length
    assert(sampleMean > corpusMean,
      f"weighted sample mean $sampleMean%.1f should exceed corpus mean $corpusMean%.1f")
  }

  test("etl_compact merges 128 commit files into ≤4 without losing rows") {
    q("etl_compact").count() // force both materializations
    def parquets(p: String) =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    val tag = Spec.sf001.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      Stage.inputStamp(spark, s"${Spec.sf001}/orders.parquet") // operator's scheme
    val frag = parquets(s"/tmp/graft_frag_$tag")
    val comp = parquets(s"/tmp/graft_compacted_$tag")
    assert(frag > 100, s"fragmented table has $frag files")
    assert(comp <= 4 && comp > 0, s"compacted table has $comp files")
    val a = spark.read.parquet(s"/tmp/graft_frag_$tag").count()
    val b = spark.read.parquet(s"/tmp/graft_compacted_$tag").count()
    assert(a == b, s"row count changed: $a -> $b")
  }

  test("agg_skew_kurt matches Spark's built-in population moments") {
    // The exact-integer-power-sum path must agree with the built-in
    // double-folding skewness()/kurtosis() (same population formulas)
    // to within double noise — the built-ins can't cross the hash gate
    // but they're a fine independent referee.
    val ours = q("agg_skew_kurt").collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val ref = Tables.lineitem(spark, Spec.sf001)
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ours.foreach { case (flag, (sk, ku)) =>
      assert(math.abs(sk - ref(flag)._1) < 1e-3, s"$flag skew $sk vs ${ref(flag)._1}")
      assert(math.abs(ku - ref(flag)._2) < 1e-3, s"$flag kurt $ku vs ${ref(flag)._2}")
    }
  }

  test("etl_dq_audit: clean fixture passes every check except row count") {
    val m = q("etl_dq_audit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("row_count_lineitem") > 0)
    Seq("null_shipdate", "nonpos_price", "nonintegral_qty",
      "discount_out_of_range", "orphan_lineitems", "dup_orderkeys")
      .foreach(k => assert(m(k) == 0L, s"$k = ${m(k)}"))
  }

  test("agg_mad: robust bounds — 0 ≤ MAD ≤ max|dev|, median inside range") {
    val qs = Tables.lineitem(spark, Spec.sf001)
      .groupBy(col("l_returnflag"))
      .agg(min("l_quantity").as("lo"), max("l_quantity").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    q("agg_mad").collect().foreach { r =>
      val (flag, med, mad) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val (lo, hi) = qs(flag)
      assert(med >= lo && med <= hi, s"$flag median $med outside [$lo,$hi]")
      assert(mad >= 0 && mad <= (hi - lo), s"$flag MAD $mad out of bounds")
    }
  }

  test("sample_negative: 5 distinct negatives per query, none share the source") {
    val src = Tables.documents(spark, Spec.sf001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("sample_negative").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (qid, negs) =>
      assert(negs.length == 5 && negs.map(_._2).distinct.length == 5,
        s"query $qid: ${negs.length} negatives")
      assert(negs.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      negs.foreach { case (_, n, _) =>
        assert(src(n) != src(qid), s"negative $n shares source with $qid")
      }
    }
  }

  test("text_feature_hash: idx in [0,HashDim), weights nonzero, Σ|w| ≤ tokens") {
    val rows = q("text_feature_hash").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (i, _) =>
      i >= 0 && i < graft.operators.TextOps.HashDim })
    assert(rows.forall(_._2 != 0L), "sparse output must drop zero weights")
    val tokens = Tables.documents(spark, Spec.sf001)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").count()
    // signed sums can only cancel, never exceed the token count
    assert(rows.map(_._2.abs).sum <= tokens)
  }

  /** Ground-truth canonical (a < b) co-occurrence edge list, derived
    * independently of GraphOps — the reference every graph assertion
    * compares against. Must track GraphOps.edges' definition. */
  private def refEdges = {
    val li = Tables.lineitem(spark, Spec.sf001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("x")
      .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
  }

  test("graph_degree_stats: handshake lemma — Σ degree·n_nodes = 2·|edges|") {
    val edges = refEdges.count()
    val degSum = q("graph_degree_stats").collect()
      .map(r => r.getLong(0) * r.getLong(1)).sum
    assert(degSum === 2 * edges, s"Σ deg = $degSum, edges = $edges")
  }

  test("graph_pagerank: mass ≈ N (fixed-point truncation only shrinks it)") {
    val rows = q("graph_pagerank").collect()
    val n = rows.length.toDouble
    val mass = rows.map(_.getDouble(1)).sum
    // each of the 3 damped rounds loses at most 1 ulp-of-Q per node to
    // integer truncation; mass can only drift DOWN from N, and barely
    assert(mass <= n + 1e-6 && mass >= 0.95 * n, s"mass $mass for $n nodes")
    assert(rows.forall(_.getDouble(1) > 0.0), "ranks are strictly positive")
  }

  test("graph_pagerank converge mode reaches an integer fixed point at sf0.01") {
    // Run-to-convergence gate: with tolFx=0 the loop must hit an EXACT
    // integer fixed point (every node's fx unchanged by one more damped
    // round) before the iteration cap — and that fixed point must
    // differ from the 3-round unroll only within the tolerance the
    // geometric 0.85-damping tail allows.
    spark.conf.set("spark.graft.pagerank.converge", "true")
    spark.conf.set("spark.graft.pagerank.tolFx", "0")
    try {
      val conv = SparkEntry.queries("graph_pagerank")(spark, Spec.sf01)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.conf.set("spark.graft.pagerank.converge", "false")
      val fixed = SparkEntry.queries("graph_pagerank")(spark, Spec.sf01)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(conv.keySet === fixed.keySet)
      val n = conv.size.toDouble
      val mass = conv.values.sum
      assert(mass <= n + 1e-6 && mass >= 0.95 * n,
        s"converged mass $mass for $n nodes")
      // after round t the remaining movement is bounded by 0.85^t; the
      // 3-round unroll must already be within that envelope of the
      // fixed point (loose 2×0.85³ ≈ 1.23 absolute bound per node)
      val maxDiff = conv.keysIterator
        .map(k => math.abs(conv(k) - fixed(k))).max
      assert(maxDiff <= 2 * math.pow(0.85, 3),
        s"3-round unroll vs fixed point: max |Δpr| = $maxDiff")
    } finally {
      spark.conf.unset("spark.graft.pagerank.converge")
      spark.conf.unset("spark.graft.pagerank.tolFx")
    }
  }

  test("graph_kcore converge mode peels to a stable core at sf0.01") {
    spark.conf.set("spark.graft.kcore.converge", "true")
    try {
      val core = SparkEntry.queries("graph_kcore")(spark, Spec.sf01)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.graft.kcore.converge", "false")
      val fixedRounds = SparkEntry.queries("graph_kcore")(spark, Spec.sf01)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // converged core ⊆ 3-round peel (peeling is monotone)
      assert(core.keySet.subsetOf(fixedRounds.keySet),
        "converged core must be a subset of the bounded peel")
      assert(core.nonEmpty, "k-core converged to the empty graph")
      // stability: every surviving node's induced degree clears the
      // SAME threshold the peel used (recomputed here from the full
      // degree table, exactly as the query derives it)
      val kth = math.ceil(graft.operators.GraphOps.testDegrees(spark, Spec.sf01)
        .agg(expr("percentile(degree, 0.5)")).head().getDouble(0) * 0.7).toLong
      assert(core.values.forall(_ >= kth),
        s"unstable core: some induced degree < $kth")
    } finally spark.conf.unset("spark.graft.kcore.converge")
  }

  test("Stage.inputStamp: stable for unchanged inputs, rotates on rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp").toFile
    val f = new java.io.File(dir, "t.parquet")
    java.nio.file.Files.writeString(f.toPath, "generation-1")
    val s1 = Stage.inputStamp(spark, f.getAbsolutePath)
    assert(s1 === Stage.inputStamp(spark, f.getAbsolutePath),
      "stamp must be stable while the input is untouched")
    // regeneration with different bytes (length change ⇒ no reliance on
    // local-FS mtime granularity) must rotate the stamp — this is the
    // round-5 in-place fixture regeneration scenario
    java.nio.file.Files.writeString(f.toPath, "generation-2-longer")
    val s2 = Stage.inputStamp(spark, f.getAbsolutePath)
    assert(s1 !== s2, "rewritten input must rotate the stamp")
    // distinct inputs stamp distinctly (path is mixed in even if absent)
    assert(Stage.inputStamp(spark, f.getAbsolutePath + ".other") !== s2)
  }

  test("graph_triangle_count: oriented count equals brute-force count") {
    val e = refEdges
    // brute force: canonical a<b<c with all three canonical edges present
    val e1 = e.select(col("a").as("u"), col("b").as("v"))
    val e2 = e.select(col("a").as("v2"), col("b").as("w2"))
    val e3 = e.select(col("a").as("u3"), col("b").as("w3"))
    val brute = e1.join(e2, col("v") === col("v2"))
      .join(e3, col("u") === col("u3") && col("w2") === col("w3")).count()
    val oriented = q("graph_triangle_count").collect().map(_.getLong(1)).sum
    assert(oriented === brute, s"oriented $oriented vs brute $brute")
  }

  test("graph_common_neighbors: Σ cn = 3·|triangles|, jaccard in [0,1)") {
    val rows = q("graph_common_neighbors").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    val tri = q("graph_triangle_count").collect().map(_.getLong(1)).sum
    // each triangle contributes one common neighbor to each of its 3 edges
    assert(rows.map(_._1).sum === 3 * tri)
    rows.foreach { case (cn, j) =>
      assert(j >= 0.0 && j < 1.0, s"jaccard $j out of range")
      assert((cn == 0) == (j == 0.0), "jaccard zero iff no common neighbor")
    }
  }

  test("graph_clustering_coeff: Σ participation = 3·|triangles|, coeff in [0,1]") {
    val rows = q("graph_clustering_coeff").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val tri = q("graph_triangle_count").collect().map(_.getLong(1)).sum
    // every triangle has exactly 3 corners
    assert(rows.map(_._2).sum === 3 * tri)
    rows.foreach { case (deg, t, c) =>
      assert(c >= 0.0 && c <= 1.0, s"coeff $c out of range")
      if (deg < 2) assert(t == 0L && c == 0.0, "deg<2 cannot close a triangle")
    }
  }

  test("graph_khop: dists in 0..3, nodes unique, hop-1 adjacent to a seed") {
    val rows = q("graph_khop").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.map(_._1).distinct.length === rows.length, "each node once")
    assert(rows.forall { case (_, k) => k >= 0 && k <= 3 })
    val seeds = rows.filter(_._2 == 0).map(_._1).toSet
    assert(seeds.nonEmpty, "seed set non-empty at sf0.001")
    // symmetric adjacency = canonical edges in both directions
    val adj = refEdges.collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
    rows.filter(_._2 == 1).foreach { case (node, _) =>
      assert(seeds.exists(sd => adj.contains((sd, node))),
        s"hop-1 node $node not adjacent to any seed")
    }
  }

  test("graph_sssp: brackets khop hop counts (costs are in [1,9] per edge)") {
    // Same seeds, same graph, 3 rounds: the weighted label of a node
    // reached in h hops is bounded by h ≤ dist ≤ 9·h (edge costs are
    // 1..9), and the reached sets coincide (both are "within 3 edges").
    val sssp = q("graph_sssp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val khop = q("graph_khop").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(sssp.keySet === khop.keySet, "reached sets must coincide")
    khop.foreach { case (node, h) =>
      val dist = sssp(node)
      assert(dist >= h && dist <= 9L * h || (h == 0 && dist == 0),
        s"node $node: hops $h, weighted dist $dist outside [$h, ${9 * h}]")
    }
    assert(sssp.values.exists(_ > 0), "non-seed labels exist")
  }

  test("sim_kmeans: clusters partition the corpus, inertia non-negative") {
    val rows = q("sim_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).distinct.length === rows.length, "cluster ids unique")
    assert(rows.length <= 8 && rows.nonEmpty, "at most k=8 clusters")
    val corpus = Tables.embeddings(spark, Spec.sf001).count()
    assert(rows.map(_._2).sum === corpus, "every vector in exactly one cluster")
    assert(rows.forall(_._3 >= 0.0), "inertia is a sum of squared distances")
  }

  test("win_interp_linear: actual months pass through, gaps lerp between neighbors") {
    val rows = q("win_interp_linear").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getInt(2), r.getDouble(3)))
    assert(rows.exists(_._3 == 0), "fixture has at least one gap month")
    // every interpolated value lies within [min, max] of its key's actuals
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val actuals = rs.filter(_._3 == 1).map(_._4)
      val lo = actuals.min; val hi = actuals.max
      rs.filter(_._3 == 0).foreach { case (k, m, _, v) =>
        assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"key $k month $m interp $v outside [$lo,$hi]")
      }
    }
  }

  test("lpa recovers the two communities of a barbell graph") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3–4: the
    // fixture's near-complete basket graph truthfully collapses to one
    // community, so structure recovery is proven on a graph that HAS
    // structure.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val u = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
    val init = u.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val labels = operators.GraphOps.lpaOnUnd(u, init).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) === labels(2L) && labels(2L) === labels(3L))
    assert(labels(4L) === labels(5L) && labels(5L) === labels(6L))
    assert(labels(1L) !== labels(4L), s"bridge merged the cliques: $labels")
  }

  test("graph_modularity: exact-integer contributions are internally consistent") {
    val rows = q("graph_modularity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val nNodes = rows.map(_._2).sum
    assert(nNodes === operators.GraphOps.testDegrees(spark, Spec.sf001).count(),
      "every node in exactly one community")
    // Σ d_c = 2m and Σ e_c ≤ m; Q = Σ contrib ∈ [-0.5, 1]
    val q_ = rows.map(_._5).sum
    assert(q_ >= -0.5 - 1e-6 && q_ <= 1.0 + 1e-6, s"modularity $q_ out of range")
    // single-community partitions must score exactly 0 (4m·m − (2m)² = 0)
    if (rows.length == 1) assert(rows.head._5 === 0.0)
  }

  test("text_classifier_score: bounded weights, keep flag consistent") {
    val rows = q("text_classifier_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length === Tables.documents(spark, Spec.sf001)
      .filter(length(col("text")) > 0).count().toInt)
    rows.foreach { case (id, fx, n, avg, keep) =>
      assert(n > 0, s"doc $id has no tokens")
      assert(math.abs(avg) <= 1000.0, s"doc $id mean score $avg outside weight range")
      assert(keep === (fx > 0), s"doc $id keep flag inconsistent")
    }
  }

  test("multimodal_phash: identical payloads collide at hamming 0; radius bound holds") {
    import spark.implicits._
    val rows = q("multimodal_phash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty, "fixture near-dups must surface pairs")
    rows.foreach { case (a, b, h) =>
      assert(a < b, "canonical pair order")
      assert(h >= 0 && h <= 14, s"pair ($a,$b) outside reporting radius: $h")
    }
    // the operator's own kernel: identical bytes collide exactly; a
    // local brightness edit flips few bits (locality), a full rewrite
    // flips many
    val base = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val edited = base.clone(); (0 until 10).foreach(i => edited(i) = 'Z'.toByte)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val hBase = operators.Multimodal.phash60(base)
    assert(hBase === operators.Multimodal.phash60(base.clone()),
      "identical payloads must hash identically")
    assert(ham(hBase, operators.Multimodal.phash60(edited)) <= 14,
      "a 10-byte edit must stay within the reporting radius")
    assert(operators.Multimodal.phash60(Array.emptyByteArray) === 0L)
  }

  test("phash hot-bucket star reps group by hash — a foreign min-id " +
      "collider cannot sever an exact-copy cluster") {
    // Deterministic reconstruction of the PhashCapProbe finding
    // (round-16): band keys are 10 bits, so a hot bucket can contain a
    // doc FOREIGN to the cluster that made it hot. Six crafted
    // payloads each zero exactly ONE band of their pHash (low byte in
    // that band's 10 segments, high elsewhere) while the cluster's
    // constant payload hashes to 0 — so EVERY cluster bucket (bd, 0)
    // holds a lower-id foreign doc at hamming 50. A bucket-GLOBAL rep
    // would star every member around a foreign doc and the radius
    // filter would emit ZERO cluster pairs; the shipped per-(bucket,
    // phash) group rep must emit exactly the 5-star around id 11.
    import spark.implicits._
    def bandZero(k: Int): String =
      (0 until 60).map(i => if (i >= 10 * k && i < 10 * (k + 1)) '!' else '~')
        .mkString
    val foreign = (0 until 6).map(k => ((k + 1).toLong, bandZero(k)))
    val cluster = (11 to 16).map(i => (i.toLong, "A" * 60))
    val docs = (foreign ++ cluster).toDF("doc_id", "text")
    // sanity on the crafted hashes: cluster at 0, each foreign zeroes
    // only its own band and sits far outside the reporting radius
    assert(operators.Multimodal.phash60(("A" * 60).getBytes("UTF-8")) === 0L)
    (0 until 6).foreach { k =>
      val h = operators.Multimodal.phash60(bandZero(k).getBytes("UTF-8"))
      assert((h >> (10 * k) & 1023L) === 0L, s"band $k not zeroed")
      assert(java.lang.Long.bitCount(h) === 50, s"foreign $k bitcount")
    }
    val pairs = operators.Multimodal.phashPairs(docs, bucketCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === (12 to 16).map(b => (11L, b.toLong, 0)).toSet,
      s"expected the 5-pair star around 11, got $pairs")
  }

  test("sample_temperature flattens the language skew toward sqrt shares") {
    val kept = q("sample_temperature").collect()
      .map(_.getString(1)).groupBy(identity).view.mapValues(_.size).toMap
    val corpus = Tables.documents(spark, Spec.sf001)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cmin = corpus.values.min.toDouble
    corpus.foreach { case (lang, n) =>
      val expected = math.sqrt(cmin * n) // n · sqrt(cmin/n)
      val got = kept.getOrElse(lang, 0).toDouble
      // binomial tolerance: 4σ = 4·sqrt(n·p·(1−p)) ≤ 4·sqrt(expected)
      assert(math.abs(got - expected) <= 4 * math.sqrt(expected) + 1,
        f"$lang kept $got%.0f vs expected $expected%.1f of $n")
    }
    // the rarest language passes (nearly) whole
    val minLang = corpus.minBy(_._2)._1
    assert(kept(minLang) === corpus(minLang).toInt,
      "cmin domain must keep every doc (u² < 1 always)")
  }

  test("win_event_pattern agrees with a direct per-user regex replay") {
    val got = q("win_event_pattern").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, nEvents, nMatches, matched) =>
      assert(matched === (nMatches > 0))
      assert(nMatches * 2 <= nEvents, "each vc*p match consumes ≥2 events")
    }
    // replay one user's sequence driver-side with java.util.regex
    val u0 = got.head._1
    val seq = Tables.events(spark, Spec.sf001)
      .filter(col("user_id") === u0)
      .select(Det.epochS(col("ts")).as("sec"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
      .map(_._3 match {
        case "view" => 'v'; case "click" => 'c'; case "purchase" => 'p'
        case "signup" => 's'; case _ => 'e'
      }).mkString
    val m = java.util.regex.Pattern.compile("vc*p").matcher(seq)
    var n = 0L
    while (m.find()) n += 1
    assert(n === got.head._3, s"user $u0: regex replay $n vs ${got.head._3}")
  }

  test("sim_range_search: precision 1.0 vs brute radius; recall floor holds") {
    val got = q("sim_range_search").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    // brute-force ground truth on the bounded probe batch
    val vecs = Tables.embeddings(spark, Spec.sf001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val probes = vecs.keys.filter(_ < 10)
    val truth = for {
      a <- probes; b <- vecs.keys if b != a
      c = cos(vecs(a), vecs(b)) if c >= 0.2
    } yield (a, b)
    // precision: every reported pair really is inside the radius
    // (±1 ulp of the 4-decimal rounding at the boundary)
    got.foreach { case ((a, b), c) =>
      assert(math.abs(cos(vecs(a), vecs(b)) - c) < 1e-3,
        s"pair ($a,$b) cos drifted")
      assert(c >= 0.2)
    }
    // recall: nprobe=3 of k=8 clusters must catch a real fraction
    val recall = got.keys.count(truth.toSet) .toDouble / truth.size
    assert(recall >= 0.3, f"range-search recall $recall%.2f below floor")
  }

  test("sim_pca_power: unit loading, eigval near the true dominant eigenvalue") {
    val rows = q("sim_pca_power").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length === 64, "one row per dimension")
    val norm2 = rows.map(r => r._3 * r._3).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"loading not unit-norm: $norm2")
    val eig = rows.head._4
    assert(rows.forall(_._4 === eig), "eigval is a shared scalar")
    // Ground truth: exact covariance from the collected corpus (test-only
    // collect — 500×64 at sf0.001), dominant eigenvalue by 50 power
    // rounds. Rayleigh quotients of power iterates increase monotonically
    // to λ₁, so the 5-round estimate is a LOWER bound; the floor is 0.8
    // because this fixture's spectrum is nearly flat (λ₂/λ₁ ≈ 0.93 at
    // sf0.001 — measured 0.87 here, 0.96+ at sf0.1 where the spectrum
    // separates). Convergence RATE is a property of the data, not the
    // operator; the operator contract is monotone improvement + the
    // upper bound.
    val vecs = Tables.embeddings(spark, Spec.sf001)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length; val d = 64
    val mu = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val c = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n)
    var v = Array.fill(d)(1.0 / 8.0)
    (1 to 50).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val nr = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nr)
    }
    val lam1 = (0 until d).map(i =>
      (0 until d).map(j => v(i) * c(i)(j) * v(j)).sum).sum
    assert(eig <= lam1 + 1e-6, s"Rayleigh estimate $eig exceeds λ₁ $lam1")
    assert(eig >= lam1 * 0.8, s"5-round estimate $eig below 80% of λ₁ $lam1")
  }

  test("agg_chisq: contributions reconcile, marginals exact, χ² matches a scalar replay") {
    val rows = q("agg_chisq").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getLong(6)))
    val n = Tables.orders(spark, Spec.sf001).count()
    assert(rows.map(_._3).sum === n, "observed counts partition the table")
    val chi2 = rows.head._6
    assert(rows.forall(_._6 === chi2) && chi2 >= 0.0)
    // expected counts reproduce the marginal products; contributions are
    // (o-e)²/e within rounding of the output's own columns
    rows.foreach { case (st, pr, obs, exp, contrib, _, _) =>
      val c = (obs - exp) * (obs - exp) / exp
      assert(math.abs(c - contrib) < 1e-3, s"($st,$pr): $c vs $contrib")
    }
    assert(math.abs(rows.map(_._5).sum - chi2) < 1e-3,
      "per-cell contributions sum to the reported χ²")
    assert(rows.head._7 === (rows.map(_._1).distinct.length - 1).toLong *
      (rows.map(_._2).distinct.length - 1), "degrees of freedom")
  }

  test("text_bpe_train: merges match a reference greedy BPE trainer") {
    // Reference implementation: textbook BPE over the same word-freq
    // table (collected — test-only), with the same (count DESC, pair
    // ASC) tie-break and TRUE greedy left-to-right merge application.
    // Matching it proves the 4-pass replace() apply is exact, not just
    // plausible.
    val words = scala.collection.mutable.Map[Vector[String], Long]()
    Tables.documents(spark, Spec.sf001).select("text").collect().foreach {
      r =>
        r.getString(0).toLowerCase.split("\\s+")
          .filter(w => w.matches("^[a-z]+$") && w.length <= 20)
          .foreach { w =>
            val k = w.map(_.toString).toVector
            words(k) = words.getOrElse(k, 0L) + 1L
          }
    }
    def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toVector
    }
    var vocab = words.toMap
    val expected = (1 to 6).map { step =>
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, cnt) =>
        syms.zip(syms.tail).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + cnt
        }
      }
      val (a, b) = pairs.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
      val cnt = pairs((a, b))
      vocab = vocab.groupMapReduce { case (syms, _) =>
        mergeWord(syms, a, b)
      }(_._2)(_ + _)
      (step, a, b, a + b, cnt)
    }
    val got = q("text_bpe_train").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("graph_adamic_adar: scores bounded by degree extremes, ranks total-ordered") {
    val rows = q("graph_adamic_adar").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    // every common neighbor contributes 1/ln(deg) with deg ∈ [2, maxDeg]
    // (a wedge middle has ≥2 edges), so cn/ln(maxDeg) ≤ aa ≤ cn/ln(2)
    val maxDeg = q("graph_degree_stats")
      .agg(max(col("degree"))).head().getLong(0)
    rows.foreach { case (u, w, cn, aa, _) =>
      assert(aa <= cn / math.log(2.0) + 1e-6, s"($u,$w) aa $aa above cn/ln2")
      assert(aa >= cn / math.log(maxDeg.toDouble) - 1e-6,
        s"($u,$w) aa $aa below cn/ln(maxDeg)")
    }
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._5).sorted.toSeq === (1 to rs.length),
        s"probe $u ranks not contiguous")
    }
  }

  test("agg_multireg: recovers the bilinear revenue surface, matches a dense solve") {
    val r = q("agg_multireg").head()
    val (n, b0, b1, b2, r2) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n === Tables.lineitem(spark, Spec.sf001).count())
    // y = x1·(1−x2) is almost linear in (x1, x2) over the narrow
    // discount range, so the fit must be near-perfect and β₁ near
    // 1−E[discount]; β₂ is negative (more discount, less revenue)
    assert(r2 >= 0.99, s"r2 $r2")
    assert(b1 > 0.9 && b1 < 1.0, s"beta1 $b1")
    assert(b2 < 0.0, s"beta2 $b2")
    // dense reference solve on the collected rows (test-only)
    val xs = Tables.lineitem(spark, Spec.sf001)
      .selectExpr("CAST(l_extendedprice AS DOUBLE)",
        "CAST(l_discount AS DOUBLE)").collect()
      .map(row => (row.getDouble(0), row.getDouble(1)))
    val ys = xs.map { case (x1, x2) => x1 * (1.0 - x2) }
    val nn = xs.length.toDouble
    val (sx1, sx2) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val (sx11, sx22) = (xs.map(v => v._1 * v._1).sum,
      xs.map(v => v._2 * v._2).sum)
    val sx12 = xs.map(v => v._1 * v._2).sum
    val sy = ys.sum
    val sx1y = xs.zip(ys).map { case ((x1, _), y) => x1 * y }.sum
    val sx2y = xs.zip(ys).map { case ((_, x2), y) => x2 * y }.sum
    def det(a: Double, b: Double, c: Double, d: Double, e: Double,
            f: Double, g: Double, h: Double, i: Double) =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val dm = det(nn, sx1, sx2, sx1, sx11, sx12, sx2, sx12, sx22)
    val rb1 = det(nn, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, sx22) / dm
    val rb2 = det(nn, sx1, sy, sx1, sx11, sx1y, sx2, sx12, sx2y) / dm
    assert(math.abs(b1 - rb1) < 1e-4, s"beta1 $b1 vs reference $rb1")
    assert(math.abs(b2 - rb2) < math.abs(rb2) * 1e-3 + 1e-4,
      s"beta2 $b2 vs reference $rb2")
    assert(math.abs(b0) < 5000.0, s"intercept $b0 implausibly large")
  }

  test("etl_anomaly_flags: every flagged row exceeds 3 MADs, none missed") {
    val rows = q("etl_anomaly_flags").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, t, v, med, mad, ratio) =>
      assert(math.abs(v - med) > 3.0 * mad - 1e-6, s"$id under-threshold")
      assert(math.abs(ratio - (v - med) / mad) < 1e-3, s"$id ratio")
    }
    // completeness: recompute flags from the raw cohort stats
    val expected = {
      val ev = Tables.events(spark, Spec.sf001)
        .select("event_id", "event_type", "value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      def medOf(xs: Seq[Double]): Double = {
        val s = xs.sorted; val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
      ev.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
        val m = medOf(rs.map(_._3).toSeq)
        val md = medOf(rs.map(x => math.abs(x._3 - m)).toSeq)
        rs.filter(x => math.abs(x._3 - m) > 3.0 * md).map(_._1).toSeq
      }.toSet
    }
    assert(rows.map(_._1).toSet === expected, "flag set differs from replay")
  }

  test("etl_shard_manifest: shards partition the corpus in md5 order") {
    val rows = q("etl_shard_manifest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val docs = Tables.documents(spark, Spec.sf001)
      .selectExpr("doc_id", "n_chars + 64 AS bytes",
        "md5(CAST(doc_id AS STRING)) AS h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._2).sum === docs.length, "every doc in one shard")
    assert(rows.map(_._3).sum === docs.map(_._2).sum, "bytes conserved")
    // shard ids contiguous from 0; every shard except possibly the last
    // is filled past the 16 KiB boundary minus its last member
    assert(rows.map(_._1).sorted.toSeq === rows.indices.map(_.toLong))
    // first/last docs are consistent with the global md5 stream order:
    // shard k's last doc hashes before shard k+1's first doc
    val byShard = rows.sortBy(_._1)
    val h = docs.map(t => t._1 -> t._3).toMap
    byShard.sliding(2).foreach {
      case Array(a, b) =>
        assert(h(a._4) <= h(b._5) || a._4 == b._5,
          s"shard ${a._1} last doc out of order vs shard ${b._1}")
      case _ =>
    }
  }

  test("sample_kcenter: greedy farthest-point — radii nonincreasing, coverage bounded") {
    val rows = q("sample_kcenter").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length === 6)
    assert(rows.map(_._2).distinct.length === 6, "centers distinct")
    val radii = rows.tail.map(_._3)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"selection radius increased: $a -> $b")
    case _ =>
    }
    val coverage = rows.head._4
    assert(coverage <= radii.last + 1e-9,
      "coverage radius exceeds the last selection radius")
    // greedy property replay: center r really is the farthest point
    // from centers 0..r-1 (dense check on the collected corpus)
    val vecs = Tables.embeddings(spark, Spec.sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val chosen = scala.collection.mutable.ArrayBuffer(rows.head._2)
    rows.tail.foreach { case (_, cid, _, _) =>
      val far = vecs.keys.maxBy { v =>
        (chosen.map(c => d2(vecs(v), vecs(c))).min, -v)
      }
      assert(far === cid, s"greedy pick mismatch: $far vs $cid")
      chosen += cid
    }
  }

  test("win_holt: weighted-sum form equals the textbook sequential recursion") {
    // The operator computes Holt via lag weights; this replays the
    // recursion AS A FOLD over the same daily series and demands
    // agreement to output precision — proving the linear-algebra
    // transform, not just determinism.
    val daily = Tables.events(spark, Spec.sf001)
      .selectExpr("event_type",
        "CAST(unix_timestamp(date_trunc('second', ts)) div 86400 AS BIGINT) AS day",
        "value")
      .groupBy("event_type", "day")
      .agg(graft.Det.sumMoney(col("value")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = q("win_holt").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    daily.groupBy(_._1).foreach { case (t, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      var l = ys.head; var b = 0.0
      ys.tail.foreach { y =>
        val nl = 0.5 * y + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
      }
      val (n, lvl, trd, fc) = got(t)
      assert(n === ys.length.toLong)
      assert(math.abs(lvl - l) < 1e-3, s"$t level $lvl vs fold $l")
      assert(math.abs(trd - b) < 1e-3, s"$t trend $trd vs fold $b")
      assert(math.abs(fc - (l + 3 * b)) < 2e-3, s"$t forecast")
    }
  }

  test("win_cusum: prefix identity equals the textbook max(0, ...) recursion") {
    val rows = q("win_cusum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val srt = rs.sortBy(_._2)
      val ys = srt.map(_._3)
      val k = math.rint(ys.sum / ys.length * 1e4) / 1e4
      var (su, sd) = (0.0, 0.0)
      srt.foreach { case (_, day, y, up, dn) =>
        su = math.max(0.0, su + (y - k))
        sd = math.max(0.0, sd + (k - y))
        assert(math.abs(up - su) < 1e-3, s"$t day $day up $up vs $su")
        assert(math.abs(dn - sd) < 1e-3, s"$t day $day dn $dn vs $sd")
      }
    }
  }

  test("agg_ttest: statistic matches a direct Welch computation") {
    val r = q("agg_ttest").head()
    val (n1, n2, m1, m2, t, df) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(6), r.getDouble(7))
    val vals = Tables.events(spark, Spec.sf001)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(row => (row.getString(0), row.getDouble(1)))
    def stats(t: String) = {
      val xs = vals.filter(_._1 == t).map(_._2)
      val m = xs.sum / xs.length
      (xs.length, m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (rn1, rm1, rv1) = stats("click"); val (rn2, rm2, rv2) = stats("view")
    assert(n1 === rn1.toLong && n2 === rn2.toLong)
    assert(math.abs(m1 - rm1) < 1e-3 && math.abs(m2 - rm2) < 1e-3)
    val se = rv1 / rn1 + rv2 / rn2
    val rt = (rm1 - rm2) / math.sqrt(se)
    val rdf = se * se /
      (math.pow(rv1 / rn1, 2) / (rn1 - 1) + math.pow(rv2 / rn2, 2) / (rn2 - 1))
    assert(math.abs(t - rt) < 1e-3, s"t $t vs $rt")
    assert(math.abs(df - rdf) < 0.1, s"df $df vs $rdf")
  }

  test("agg_ks_test: D matches a direct two-sample ECDF computation") {
    val r = q("agg_ks_test").head()
    val (n1, n2, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val vals = Tables.events(spark, Spec.sf001)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(row => (row.getString(0), row.getDouble(1)))
    val xs1 = vals.filter(_._1 == "click").map(_._2).sorted
    val xs2 = vals.filter(_._1 == "view").map(_._2).sorted
    assert(n1 === xs1.length.toLong && n2 === xs2.length.toLong)
    val pool = (xs1 ++ xs2).distinct.sorted
    val dd = pool.map { x =>
      math.abs(xs1.count(_ <= x).toDouble / xs1.length
        - xs2.count(_ <= x).toDouble / xs2.length)
    }.max
    assert(math.abs(d - dd) < 1e-4, s"ks_d $d vs replay $dd")
    assert(d >= 0.0 && d <= 1.0)
  }

  test("agg_mannwhitney: U matches a direct rank-sum with average tie ranks") {
    val r = q("agg_mannwhitney").head()
    val (n1, n2, u1, z) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))
    val vals = Tables.events(spark, Spec.sf001)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(row => (row.getString(0), row.getDouble(1)))
    assert(n1 === vals.count(_._1 == "click").toLong)
    assert(n2 === vals.count(_._1 == "view").toLong)
    // average ranks over the pooled sorted sample
    val sorted = vals.sortBy(_._2)
    val ranks = scala.collection.mutable.Map[Double, Double]()
    var idx = 0
    while (idx < sorted.length) {
      var jdx = idx
      while (jdx < sorted.length && sorted(jdx)._2 == sorted(idx)._2) jdx += 1
      ranks(sorted(idx)._2) = (idx + 1 + jdx) / 2.0
      idx = jdx
    }
    val r1 = vals.filter(_._1 == "click").map(v => ranks(v._2)).sum
    val refU = r1 - n1 * (n1 + 1) / 2.0
    assert(math.abs(u1 - refU) < 1e-6, s"u1 $u1 vs $refU")
    assert(u1 >= 0.0 && u1 <= n1.toDouble * n2)
    assert(math.abs(z) < 10.0, s"z $z implausible for same-distribution cohorts")
  }

  test("win_autocorr: r matches a direct paired Pearson per lag") {
    val rows = q("win_autocorr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty && rows.forall(r => r._4 >= -1.0 && r._4 <= 1.0))
    val daily = Tables.events(spark, Spec.sf001)
      .selectExpr("event_type",
        "CAST(unix_timestamp(date_trunc('second', ts)) div 86400 AS BIGINT) AS day",
        "value")
      .groupBy("event_type", "day")
      .agg(graft.Det.money(sum(graft.Det.dec(col("value")))).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (t, lag, nPairs, rv) =>
      val series = daily.filter(_._1 == t).map(r => r._2 -> r._3).toMap
      val pairs = series.toSeq.flatMap { case (dd, y1) =>
        series.get(dd - lag).map(y2 => (y1, y2))
      }
      assert(nPairs === pairs.length.toLong, s"$t lag $lag n")
      val n = pairs.length.toDouble
      val (s1, s2) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val s11 = pairs.map(p => p._1 * p._1).sum
      val s22 = pairs.map(p => p._2 * p._2).sum
      val s12 = pairs.map(p => p._1 * p._2).sum
      val ref = (n * s12 - s1 * s2) /
        math.sqrt((n * s11 - s1 * s1) * (n * s22 - s2 * s2))
      assert(math.abs(rv - ref) < 1e-3, s"$t lag $lag r $rv vs $ref")
    }
  }

  test("win_theil_sen: slope matches the median of all pairwise slopes") {
    val rows = q("win_theil_sen").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val daily = Tables.events(spark, Spec.sf001)
      .selectExpr("event_type",
        "CAST(unix_timestamp(date_trunc('second', ts)) div 86400 AS BIGINT) AS day",
        "value")
      .groupBy("event_type", "day")
      .agg(graft.Det.money(sum(graft.Det.dec(col("value")))).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (t, nDays, nPairs, slope, icept) =>
      val series = daily.filter(_._1 == t).map(r => (r._2, r._3)).sortBy(_._1)
      assert(nDays === series.length.toLong)
      val slopes = (for {
        i <- series.indices; j <- series.indices if i < j
      } yield (series(j)._2 - series(i)._2) /
        (series(j)._1 - series(i)._1).toDouble).sorted
      assert(nPairs === slopes.length.toLong)
      val med =
        if (slopes.length % 2 == 1) slopes(slopes.length / 2)
        else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2
      assert(math.abs(slope - med) < 1e-4, s"$t slope $slope vs $med")
      // the fit is central: about half the residuals on each side
      val above = series.count { case (dd, y) => y > slope * dd + icept }
      assert(math.abs(above - series.length / 2.0) <= series.length * 0.2,
        s"$t intercept not central ($above above)")
    }
  }

  test("text_lm_generate: every step is the argmax continuation") {
    val gen = q("text_lm_generate").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).map(_._2)
    assert(gen.length === 9)
    // pairs come from the same Spark tokenization the key uses (the
    // oracle independently checks tokenization); the REPLAY here is of
    // the greedy chain itself
    val bi = scala.collection.mutable.Map[(String, String), Long]()
    Tables.documents(spark, Spec.sf001)
      .selectExpr("doc_id",
        "filter(split(text, ' '), t -> t != '') AS toks")
      .filter(size(col("toks")) >= 2) // sequence() DESCENDS for size 1
      .selectExpr("transform(sequence(0, size(toks) - 2)," +
        " i -> struct(toks[i] AS a, toks[i + 1] AS b)) AS ps")
      .selectExpr("explode(ps) AS p").collect()
      .foreach { r =>
        val p = r.getStruct(0)
        val k = (p.getString(0), p.getString(1))
        bi(k) = bi.getOrElse(k, 0L) + 1L
      }
    gen.zip(gen.tail).foreach { case (a, b) =>
      val best = bi.keys.filter(_._1 == a)
        .minBy { case (_, w2) => (-bi((a, w2)), w2) }._2
      assert(b === best, s"after '$a': got '$b', argmax '$best'")
    }
    // seed is the most frequent continuation-bearing token
    // (toSeq before the fold — a Set view would dedup equal counts)
    val uni = bi.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val seedBest = uni.toSeq.minBy { case (w, c) => (-c, w) }._1
    assert(gen.head === seedBest)
  }

  test("agg_benford: probabilities partition, expectations are log10(1+1/d)") {
    val rows = q("agg_benford").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1) === (1 to 9).toArray)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3,
      "observed shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3,
      "Benford expectations sum to 1")
    rows.foreach { case (dd, _, _, e, _) =>
      assert(math.abs(e - math.log10(1.0 + 1.0 / dd)) < 1e-6)
    }
    // the bounded-uniform fixture must FAIL the Benford test — the
    // total chi-square distance is far above a conforming column's
    assert(rows.map(_._5).sum > 0.05,
      "uniform amounts should visibly reject Benford")
  }

  test("win_ohlc: bar invariants hold and ends match the time order") {
    val rows = q("win_ohlc").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, hr, o, h, l, c, n) =>
      assert(l <= o && o <= h, s"$t $hr open outside [low, high]")
      assert(l <= c && c <= h, s"$t $hr close outside [low, high]")
      assert(n > 0)
    }
    // replay one bucket's open/close from the raw events
    val (t0, h0, o0, _, _, c0, _) = rows.head
    val ev = Tables.events(spark, Spec.sf001)
      .filter(col("event_type") === t0 &&
        date_trunc("hour", col("ts")) === h0)
      .selectExpr("CAST(date_trunc('second', ts) AS LONG) AS sec",
        "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._1, r._2))
    assert(ev.head._3 === o0 && ev.last._3 === c0)
  }

  test("agg_assoc_rules: ratios reconcile with raw basket counts") {
    val rules = q("agg_assoc_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rules.nonEmpty && rules.length <= 20)
    val baskets = Tables.lineitem(spark, Spec.sf001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val nOrders = byOrder.size
    val itemCnt = baskets.groupBy(_._2).view.mapValues(_.length)
    rules.foreach { case (a, b, c12, sup, conf, lift) =>
      val realC12 = byOrder.values.count(s => s(a) && s(b))
      assert(realC12.toLong === c12, s"($a,$b) c12")
      assert(math.abs(sup - c12.toDouble / nOrders) < 1e-5)
      assert(math.abs(conf - c12.toDouble / itemCnt(a)) < 1e-3)
      assert(math.abs(lift - nOrders.toDouble * c12 /
        (itemCnt(a).toDouble * itemCnt(b))) < lift * 1e-2 + 1e-3)
      assert(lift >= 1.0, "top lifts on sparse baskets exceed independence")
    }
  }

  test("sim_nearest_centroid: confusion matrix accounts for every vector") {
    val rows = q("sim_nearest_centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val total = Tables.embeddings(spark, Spec.sf001).count()
    assert(rows.map(_._3).sum === total)
    val acc = rows.head._4
    assert(rows.forall(_._4 === acc))
    val diag = rows.filter(r => r._1 == r._2).map(_._3).sum
    assert(math.abs(acc - diag.toDouble / total) < 1e-3,
      "accuracy equals the confusion diagonal mass")
    // centroids must beat random guessing on their own training data
    val k = rows.map(_._1).distinct.length
    assert(acc > 1.0 / k, s"accuracy $acc no better than chance 1/$k")
  }

  test("sim_mmr_rerank: greedy MMR replay matches; diversity beats pure relevance") {
    val got = q("sim_mmr_rerank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(got.length === 5 && got.map(_._2).distinct.length === 5)
    // dense replay on the collected corpus
    val vecs = Tables.embeddings(spark, Spec.sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    // mirror the operator's arithmetic exactly: per-term floored
    // fixed-point dot (the dotfx kernel), 4-dp half-up round
    val fx = graft.Det.FixedPoint
    def fdot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => math.floor(x * y * fx).toLong }
        .sum.toDouble / fx
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x) // decimal-string form, as Spark rounds
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]) =
      r4(fdot(a, b) / (math.sqrt(fdot(a, a)) * math.sqrt(fdot(b, b))))
    val qv = vecs(0L)
    val cands = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    var chosen = List.empty[Long]
    (1 to 5).foreach { r =>
      val avail = cands.filterNot(c => chosen.contains(c._1))
      val (pid, _) = avail.maxBy { case (id, rel) =>
        // redundancy floors at 0 — the key's documented variant
        val red = if (chosen.isEmpty) 0.0
          else math.max(0.0, chosen.map(c => cos(vecs(id), vecs(c))).max)
        (0.7 * rel - 0.3 * red, -id)
      }
      assert(got(r - 1)._2 === pid, s"round $r pick ${got(r - 1)._2} vs $pid")
      chosen = chosen :+ pid
    }
    // the picked set must be more diverse than the pure top-5: its max
    // pairwise cosine is no higher
    def maxPair(ids: Seq[Long]) = ids.combinations(2)
      .map { case Seq(a, b) => cos(vecs(a), vecs(b)) }.max
    val top5 = cands.take(5).map(_._1)
    assert(maxPair(got.map(_._2).toSeq) <= maxPair(top5) + 1e-9)
  }

  test("agg_survival_km: matches a direct Kaplan-Meier replay with censoring") {
    val got = q("agg_survival_km").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    // replay from raw events
    val ev = Tables.events(spark, Spec.sf001)
      .selectExpr("user_id",
        "CAST(unix_timestamp(date_trunc('second', ts)) div 86400 AS BIGINT) AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hz = ev.map(_._2).max
    val lifes = ev.groupBy(_._1).toSeq.map { case (_, rs) =>
      val days = rs.map(_._2)
      (days.max - days.min, days.max >= hz)
    }
    val total = lifes.size
    var atRisk = total.toLong
    var s = 1.0
    val exp = lifes.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      val d = rs.count(!_._2).toLong; val c = rs.count(_._2).toLong
      val n = atRisk
      if (d > 0) s = s * (1.0 - d.toDouble / n)
      atRisk -= (d + c)
      (t, n, d, c, s)
    }
    assert(got.length === exp.length,
      s"got ${got.mkString(";")} vs replay ${exp.mkString(";")}")
    got.zip(exp).foreach { case ((t, n, d, c, km), (et, en, ed, ec, es)) =>
      assert(t === et && n === en && d === ed && c === ec,
        s"row ($t,$n,$d,$c) vs replay ($et,$en,$ed,$ec)")
      assert(math.abs(km - es) < 1e-3, s"t=$t km $km vs replay $es")
    }
    // survival is nonincreasing and within (0, 1]
    got.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9)
      case _ =>
    }
  }

  test("win_seasonal_decompose: components reconstruct the series, seasonals center") {
    val rows = q("win_seasonal_decompose").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    rows.foreach { case (t, day, y, tr, se, res) =>
      assert(math.abs(y - (tr + se + res)) < 1e-3,
        s"$t day $day components don't reconstruct")
    }
    // seasonal effects per series sum to ~0 over the 7 phases (means
    // of detrended values whose grand mean is near 0)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val phases = rs.map(r => (r._2 % 7, r._5)).distinct
      assert(phases.length <= 7)
      val residMean = rs.map(_._6).sum / rs.length
      assert(math.abs(residMean) < rs.map(_._3).max * 0.1,
        s"$t residual mean $residMean not centered")
    }
  }

  test("etl_quarantine: reasons are correct and complete per rule") {
    val rows = q("etl_quarantine").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs, n) =>
      assert(rs.split(",").length === n)
      assert(rs.split(",").forall(Set("value_extreme", "k_out_of_range",
        "dup_user_second")))
    }
    // completeness of the map-only rules (burst rule needs the window;
    // checked implicitly by the oracle hash)
    val flagged = rows.map(_._1).toSet
    val expect = Tables.events(spark, Spec.sf001)
      .selectExpr("event_id", "value",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
      .collect().filter(r => r.getDouble(1) > 200.0 || r.getLong(2) >= 90L)
      .map(_.getLong(0)).toSet
    assert(expect.subsetOf(flagged), "map-only violations all flagged")
  }

  test("agg_gini: near 1/3 for the uniform fixture, exact on a known vector") {
    val rows = q("agg_gini").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    rows.foreach { case (p, n, g) =>
      assert(g >= 0.0 && g < 1.0, s"$p gini $g outside [0,1)")
      // o_totalprice is ~uniform ⇒ Gini ≈ 1/3 (exact for U[0, 2μ])
      assert(math.abs(g - 1.0 / 3.0) < 0.05, s"$p gini $g far from uniform 1/3")
      assert(n > 0)
    }
    // closed-form sanity on a hand vector: [1,1,2,4] ⇒
    // G = (2·(1+2+6+16) − 5·8) / (4·8) = 10/32
    val xs = Seq(1.0, 1.0, 2.0, 4.0)
    val six = xs.sorted.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
    val g = (2 * six - (xs.length + 1) * xs.sum) / (xs.length * xs.sum)
    assert(math.abs(g - 10.0 / 32.0) < 1e-12)
  }

  test("text_zipf_fit: truthfully reports the fixture's non-Zipfian vocabulary") {
    val r = q("text_zipf_fit").head()
    val (n, slope, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(3))
    assert(n > 10, "enough terms to fit")
    // the synthetic near-uniform vocabulary must NOT look Zipfian:
    // slope far above -1 and a weak fit
    assert(slope > -0.6 && slope < 0.0, s"slope $slope")
    assert(r2 < 0.5, s"r2 $r2 — fixture should not fit a power law")
  }

  test("multimodal_dedup: drops exactly the radius-5 higher-id side") {
    val kept = q("multimodal_dedup").collect().map(_.getLong(0)).toSet
    val pairs = q("multimodal_phash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val drop = pairs.filter(_._3 <= 5).map(_._2).toSet
    val all = Tables.documents(spark, Spec.sf001).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === all -- drop)
  }

  test("Stage.dir: session conf wins over default; Stage.p composes") {
    // Resolution contract (round 10): session conf → env
    // SPARK_GRAFT_STAGE_DIR → /tmp. Env can't be mutated in-JVM, so
    // the testable layers are conf-beats-default and trailing-slash
    // normalization; the env layer is exercised end-to-end by the
    // relocated-stage-dir Verify runs in SCALE.md.
    val envBase = sys.env.get("SPARK_GRAFT_STAGE_DIR")
      .map(_.stripSuffix("/")).getOrElse("/tmp")
    assert(Stage.dir(spark) === envBase)
    try {
      spark.conf.set(Stage.DirConf, "/somewhere/else/")
      assert(Stage.dir(spark) === "/somewhere/else")
      assert(Stage.p(spark, "graft_x") === "/somewhere/else/graft_x")
    } finally spark.conf.unset(Stage.DirConf)
    assert(Stage.dir(spark) === envBase)
  }

  test("graph_random_walk: every step follows a real edge, picks replay") {
    val rows = q("graph_random_walk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 20)
    val edges = operators.GraphOps.testUnd(spark, Spec.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (walk, fin, path) =>
      val hops = path.split("->").map(_.toLong)
      assert(hops.head === walk && hops.last === fin && hops.length === 4)
      hops.sliding(2).foreach { case Array(a, b) =>
        assert(edges((a, b)), s"walk $walk uses non-edge $a->$b")
      case _ =>
      }
    }
  }
}
