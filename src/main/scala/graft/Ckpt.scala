package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage truncation for iterative/fixpoint operators — durable when
  * configured, local otherwise.
  *
  * Every fixpoint loop in this engine (connected components, PageRank,
  * k-core, BFS/k-hop, SSSP, LPA, greedy k-center/MMR, Lloyd rounds,
  * BPE merges, power iteration, tf reuse) must truncate per-round
  * lineage: round N's plan otherwise embeds rounds 1..N-1 and work
  * grows quadratically in depth. `localCheckpoint` does that cheaply,
  * but its blocks live ONLY in executor storage — they are not
  * recomputable (lineage is gone) and not replicated, so on a real
  * cluster losing one executor mid-loop kills the job unrecoverably.
  * The round-9 worker-kill probe proved this failure mode is real and
  * that a reliable checkpoint (HDFS/S3A-backed files) survives it.
  *
  * This object is the ONE switch between the two modes:
  *
  *  - default (no conf): eager `localCheckpoint` — right for local[*]
  *    and the driver gate, zero extra I/O;
  *  - `spark.graft.checkpointDir=<cluster-visible path>`: reliable
  *    `checkpoint` through the Hadoop FS, so every truncation point
  *    survives executor loss. The frame is persisted (MEMORY_AND_DISK)
  *    before the checkpoint and unpersisted after: Spark's reliable
  *    checkpoint runs a SEPARATE job that would otherwise recompute
  *    the full lineage a second time (documented RDD.checkpoint
  *    behavior) — the persist makes the checkpoint job read the
  *    just-computed blocks instead.
  *
  * `SparkContext.setCheckpointDir` appends a fresh UUID subdirectory
  * on every call and a context holds exactly ONE checkpoint dir, so
  * the dir is re-set only when the requested BASE changes (repeat
  * calls with the same base are no-ops — no per-call UUID spray).
  * Corollary: configuring the legacy per-key components dir AND the
  * engine-wide dir to DIFFERENT paths in one application re-points
  * the global dir at each alternation — each family's checkpoints
  * land under its own base, at the cost of one UUID subdir per
  * switch, and concurrent queries in such a double-conf app could
  * race the global pointer. Point both confs at the same base (or
  * set only the engine-wide one) to avoid that; the gate and probes
  * do — and `ensure` now logs a LOUD warning on every cross-base
  * re-point so a double-conf app can't drift silently (round-11).
  *
  * Checkpoint-file lifecycle (round-11): Spark never deletes reliable
  * checkpoint files unless `spark.cleaner.referenceTracking
  * .cleanCheckpoints=true` (GC-driven, nondeterministic, and read at
  * context start), so a durable fixpoint loop used to grow the dir by
  * one full snapshot per round per run. `Ckpt.chain()` bounds that:
  * each chained truncation deletes the chain's generation N-2 files
  * once generation N is materialized. Keep-last-2 (not last-1) is the
  * safety margin for the loops here, where a sibling frame computed
  * lazily from round N-1 may still read N-1's files while round N
  * lands; nothing in any loop reaches two generations back (every
  * frame referencing N-2 was itself materialized during round N-1).
  * Frames whose per-round derivatives are LAZILY accumulated into the
  * final result (BPE's merge rules, greedy decode's steps, k-center's
  * picks) must NOT be chained — their old files stay referenced until
  * the query finishes; those sites keep plain `Ckpt.df` (their
  * per-round frames are 1-row/vocab-sized, so growth is negligible).
  */
object Ckpt {
  /** The one durable-checkpoint conf. Operators with a historical
    * per-key conf (components) treat that key as an override. */
  val DirConf = "spark.graft.checkpointDir"

  def dir(s: SparkSession): Option[String] =
    s.conf.getOption(DirConf).filter(_.nonEmpty)

  private val baseFor =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Point the context checkpoint dir at `base` if it isn't already
    * (see header for the change-of-base semantics). A cross-base
    * re-point is legal but warned loudly: it means two different
    * checkpoint bases are configured in one application, which sprays
    * a UUID subdir per alternation and can race under concurrent
    * queries. */
  def ensure(s: SparkSession, base: String): Unit = synchronized {
    val k = s.sparkContext.applicationId
    val cur = baseFor.get(k)
    if (cur != base || s.sparkContext.getCheckpointDir.isEmpty) {
      if (cur != null && cur != base) {
        crossBaseRepoints += 1
        log.warn(
          s"Ckpt: re-pointing the ONE global checkpoint dir '$cur' -> " +
            s"'$base'. Two different checkpoint bases are configured in " +
            "this application (spark.graft.checkpointDir vs a legacy " +
            "per-key override); each switch creates a fresh UUID subdir " +
            "and concurrent queries can race the global pointer. Point " +
            "both confs at the SAME base.")
      }
      s.sparkContext.setCheckpointDir(base)
      baseFor.put(k, base)
    }
  }

  /** Count of cross-base re-points (test observability for the
    * double-conf warning path). */
  @volatile private[graft] var crossBaseRepoints = 0L

  /** Truncate `frame`'s lineage: reliable checkpoint under `base`,
    * else eager localCheckpoint. Both branches are eager, so callers
    * may rely on the result being materialized. */
  def df(frame: DataFrame, base: Option[String]): DataFrame =
    base match {
      case Some(b) =>
        ensure(frame.sparkSession, b)
        frame.persist(StorageLevel.MEMORY_AND_DISK)
        val out = frame.checkpoint(eager = true)
        frame.unpersist(blocking = false)
        out
      case None =>
        val out = frame.localCheckpoint(eager = true)
        org.apache.spark.sql.GraftSqlBridge.backingRdd(out)
          .foreach(registerScratch)
        out
    }

  /** Round 18 (suite-context churn, guide §5 "unpersist when done"):
    * a local-mode truncation's blocks stay pinned until the
    * ContextCleaner happens to GC the RDD — across a 279-key × 3-pass
    * bench run that is thousands of dead block sets competing with
    * execution memory, the round-17 "suite-context churn" (identical
    * trees drifting 150→183 s, untouched keys ×1.3–1.6). Every
    * local-mode scratch RDD registers here and the harnesses
    * (Bench/Verify/RunOne/Profile) release the lot once a key's ONE
    * action has materialized its result. Callers must not re-read a
    * released frame — localCheckpoint blocks are gone, not
    * recomputable — which holds in every harness (one action per key,
    * frame discarded after; the specs' multi-action frames run under
    * sessions that never call releaseScratch mid-key). Durable mode is
    * exempt: its data lives in checkpoint FILES whose lifecycle
    * Chain/unck already manage. */
  private val scratch =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.rdd.RDD[_]]()

  private[graft] def registerScratch(
      rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    scratch.add(rdd)
    ()
  }

  /** Release every scratch block registered since the last call.
    * Non-blocking unpersists: the point is to hand the blocks to the
    * BlockManager for eviction now instead of after an eventual GC. */
  def releaseScratch(): Unit = {
    var r = scratch.poll()
    while (r != null) {
      try r.unpersist(blocking = false)
      catch { case _: Throwable => () }
      r = scratch.poll()
    }
  }

  /** Conf-resolved form — the call every fixpoint site uses. */
  def df(frame: DataFrame): DataFrame =
    df(frame, dir(frame.sparkSession))

  /** Best-effort recursive delete of a superseded checkpoint's files.
    * Cleanup must never fail the query — a missing path (already
    * cleaned, or localCheckpoint mode) is simply ignored. */
  private[graft] def deleteFile(s: SparkSession, file: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(file)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    } catch {
      case e: Exception =>
        log.warn(s"Ckpt: could not delete superseded checkpoint $file", e)
    }

  /** A per-loop checkpoint chain: same truncation semantics as
    * `Ckpt.df`, plus durable-mode file hygiene — generation N-2's
    * checkpoint files are deleted once generation N is materialized,
    * so a fixpoint loop holds at most TWO round snapshots on the
    * checkpoint FS instead of one per round (see header for why
    * last-2, and which frames must NOT be chained). One Chain per
    * evolving frame per loop invocation; never share across queries. */
  final class Chain private[Ckpt] () {
    private var older: Option[(SparkSession, String)] = None
    private var prev: Option[(SparkSession, String)] = None
    def df(frame: DataFrame): DataFrame = {
      val out = Ckpt.df(frame)
      if (dir(frame.sparkSession).nonEmpty) {
        older.foreach { case (s, f) => deleteFile(s, f) }
        older = prev
        prev = org.apache.spark.sql.GraftSqlBridge.checkpointFile(out)
          .map((out.sparkSession, _))
      }
      out
    }
  }

  def chain(): Chain = new Chain()
}
