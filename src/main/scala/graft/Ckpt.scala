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
  * do.
  */
object Ckpt {
  /** The one durable-checkpoint conf. Operators with a historical
    * per-key conf (components) treat that key as an override. */
  val DirConf = "spark.graft.checkpointDir"

  def dir(s: SparkSession): Option[String] =
    s.conf.getOption(DirConf).filter(_.nonEmpty)

  private val baseFor =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Point the context checkpoint dir at `base` if it isn't already
    * (see header for the change-of-base semantics). */
  def ensure(s: SparkSession, base: String): Unit = synchronized {
    val k = s.sparkContext.applicationId
    if (baseFor.get(k) != base || s.sparkContext.getCheckpointDir.isEmpty) {
      s.sparkContext.setCheckpointDir(base)
      baseFor.put(k, base)
    }
  }

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
      case None => frame.localCheckpoint(eager = true)
    }

  /** Conf-resolved form — the call every fixpoint site uses. */
  def df(frame: DataFrame): DataFrame =
    df(frame, dir(frame.sparkSession))
}
