package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
import org.apache.spark.sql.types._
import graft.{Det, Stage, Tables}
import Det._

/** Structured-Streaming operators (SURVEY.md §2.9).
  *
  * Harness constraint: `SparkEntry.queries` must return bounded
  * DataFrames the driver can count/write, so each key here runs the
  * batch-equivalent plan — time-window functions, watermark declarations
  * and stateful handlers behave identically on bounded input. True
  * readStream execution (late-row drops, incremental state, foreachBatch
  * sink) is exercised in StreamingSpec via MemoryStream.
  *
  * 100 TB notes: windowed aggs shuffle on (window, key) with partial
  * aggregation; session/stateful ops keep per-key state bounded and
  * watermark-evicted (RocksDB state store in production); every handler
  * sorts its group before folding so results never depend on arrival
  * order.
  */
object StreamingOps {
  type Q = (SparkSession, String) => DataFrame

  /** Events with second-truncated time (cross-engine rule, SURVEY §7.4). */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("sec", secs(col("ts")))

  /** Watermarked purchase↔click interval-join legs, shared by the inner
    * and left-outer stream-stream keys so the two shapes can never
    * desynchronize. Both sides declare watermarks and the range rides
    * the WATERMARKED event-time columns themselves (pts/cts +
    * INTERVAL) — Spark derives state-store eviction watermarks only
    * from conditions on event-time columns, so a range on a derived
    * BIGINT (the round-2 formulation) would keep unbounded state when
    * run incrementally. Times are second-truncated (`sec`) to match
    * the oracle's epoch-seconds arithmetic. */
  private def purchaseClickJoin(s: SparkSession, d: String,
      joinType: String): DataFrame = {
    val e = ev(s, d)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("sec").as("pts"))
      .withWatermark("pts", "30 minutes")
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("sec").as("cts"))
      .withWatermark("cts", "30 minutes")
    p.join(c, col("user_id") === col("c_user")
        && col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES")
        && col("cts") <= col("pts"), joinType)
      .select(col("user_id"), col("purchase_id"), col("click_id"))
      .orderBy("user_id", "purchase_id", "click_id")
  }

  val queries: Map[String, Q] = Map(
    "stream_tumbling" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("ws", "event_type")
    }),

    "stream_sliding" -> ((s, d) => {
      // 1-hour windows sliding every 15 minutes: each event lands in
      // exactly 4 windows.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"))
        .orderBy("ws", "event_type")
    }),

    "stream_session" -> ((s, d) => {
      // Native session windows (30-min gap) per user — the real
      // operator, which the oracle reproduces via gaps-and-islands.
      ev(s, d)
        .groupBy(session_window(col("sec"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("sw.start").as("sess_start"),
          (col("sw.end") - expr("INTERVAL 30 MINUTES")).as("sess_last"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start")
    }),

    "stream_watermark_late" -> ((s, d) => {
      // Watermark declaration + windowed agg. On bounded input the
      // watermark is a no-op (no late data in replay) — late-row
      // dropping is asserted in StreamingSpec with out-of-order batches.
      Tables.events(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"))
        .orderBy("ws", "event_type")
    }),

    "stream_dedup_watermark" -> ((s, d) => {
      // Stateful dedup within the watermark horizon. Keys-only output
      // so the batch result is set-deterministic.
      // dropDuplicatesWithinWatermark is streaming-only; on bounded
      // input dropDuplicates is its exact equivalent (the watermark
      // variant runs in StreamingSpec over a MemoryStream).
      Tables.events(s, d)
        .dropDuplicates("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
        .orderBy("user_id", "event_type")
    }),

    "stream_stateful_custom" -> ((s, d) => {
      // Custom per-user sessionization with O(1) state per user. Scale
      // contract: the ENGINE does the ordering — repartition on user_id
      // + sortWithinPartitions is a spillable external sort, so no
      // group is ever materialized in the handler; the fold then
      // streams rows carrying a constant-size state tuple. A hot user
      // (bot traffic) costs disk sort bandwidth, never task memory —
      // the round-2 formulation (rows.toSeq.sortBy inside a
      // flatMapGroupsWithState handler) OOMed exactly there. The
      // incremental variant of the same fold runs under
      // flatMapGroupsWithState in StreamingSpec, where any in-handler
      // sort is bounded by one micro-batch, not a user's history.
      import s.implicits._
      val rows = ev(s, d)
        .select(col("user_id"), col("sec").cast(LongType).as("secl"),
          col("event_id"))
        .as[(Long, Long, Long)]
      rows
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "secl", "event_id")
        .mapPartitions(StatefulSessionizer.foldSortedPartition)
        .toDF("user_id", "n_sessions", "n_events", "longest_session_s")
        .orderBy("user_id")
    }),

    "stream_stream_join" -> ((s, d) =>
      // Stream-stream interval join: each purchase pairs with the same
      // user's clicks in the preceding 30 minutes (shared leg
      // construction at purchaseClickJoin). This is the exact shape
      // StreamingSpec runs over MemoryStreams.
      purchaseClickJoin(s, d, "inner")),

    "stream_stream_left_join" -> ((s, d) =>
      // LEFT OUTER variant: every purchase emits, with NULL click
      // columns when no click matched. Incrementally Spark can only
      // emit the null row once the GLOBAL watermark (min across both
      // inputs) proves no matching click can still arrive — which is
      // why BOTH watermarks and the event-time range condition are
      // MANDATORY for outer stream joins (without them state never
      // expires and null rows never emit). StreamingSpec drives the
      // incremental null-emission sequence over MemoryStreams.
      purchaseClickJoin(s, d, "left_outer")),

    "stream_sink_pg" -> ((s, d) => {
      // The streaming face of the tool's product: windowed aggregate →
      // exactly-once foreachBatch load into Postgres → read-back. The
      // batch-equivalent plan loads the full aggregate as batchId 0 and
      // then REPLAYS the same batchId — the read-back proving the
      // commit-ledger guard swallowed the duplicate delivery is the
      // oracled result. The true incremental path (MemoryStream →
      // writeStream.foreachBatch(PgStreamSink.writeBatch)) runs in
      // StreamingSpec, including a mid-stream duplicate-batch retry.
      import graft.sources.{ParquetSink, PgDdl, PgServer, PgStreamSink}
      val schema = StructType(Seq(
        StructField("ws", TimestampType),
        StructField("event_type", StringType),
        StructField("n", LongType),
        StructField("sum_value", DoubleType)))
      val agg = Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"),
          col("sum_value"))
      if (PgServer.ensure()) {
        val t = "graft_stream_agg"
        PgServer.psql(s"""DROP TABLE IF EXISTS "$t"""")
        PgServer.psql(s"""DROP TABLE IF EXISTS "${t}__commits"""")
        PgServer.psql(PgDdl.createTable(t, schema))
        PgStreamSink.ensureCommits(PgServer.sockDir, PgServer.port, PgServer.db, t)
        PgStreamSink.writeBatch(PgServer.sockDir, PgServer.port, PgServer.db,
          t, 0L, agg)
        // redelivery of the same micro-batch: must be a no-op
        PgStreamSink.writeBatch(PgServer.sockDir, PgServer.port, PgServer.db,
          t, 0L, agg)
        val out = "/tmp/graft_stream_pg_roundtrip.csv"
        PgServer.psql(
          s"""\\copy (SELECT * FROM "$t" ORDER BY ws, event_type) TO '$out' WITH (FORMAT csv)""")
        s.read.schema(schema)
          .option("header", "false")
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
          .csv(out)
          .orderBy("ws", "event_type")
      } else {
        val out = Stage.p(s, "graft_stream_pg_twin")
        ParquetSink(out).write(agg)
        s.read.parquet(out).orderBy("ws", "event_type")
      }
    }),

    "stream_static_join" -> ((s, d) => {
      // Stream-static enrichment (supported without watermark): events
      // stream joined to the customer dim, aggregated per segment.
      Tables.events(s, d)
        .join(Tables.customer(s, d), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    "stream_anomaly" -> ((s, d) => {
      // Streaming DQ monitor — etl_anomaly_flags turned into the live
      // alerting shape: the robust (median, MAD) profile is a FROZEN
      // static table (trained on history, exactly how production
      // deploys a detector — the threshold must not drift with the
      // stream it judges), stream-static-joined onto the flow, with
      // hourly anomaly-rate windows. Batch twin here (the declared
      // contract); StreamingSpec runs the same plan from a
      // MemoryStream and proves window-for-window agreement.
      // Supported-operation note: stream-static join + windowed agg +
      // append mode is the sanctioned combination (no watermark needed
      // for the join, one for the window).
      val ev = Tables.events(s, d)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val stats = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(min(col("med")).as("med"),
          expr("percentile(abs(value - med), 0.5)").as("mad"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("anom",
          abs(col("value") - col("med")) > lit(3.0) * col("mad"))
        .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("anom"), 1L).otherwise(0L)).as("n_anom"))
        .withColumn("anom_rate",
          round(col("n_anom").cast(DoubleType) / col("n"), 4))
        .orderBy("ws", "event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(38,4))), 4) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",

    // Same aggregate as stream_tumbling: the key's value-add (the
    // exactly-once double-delivery through Postgres) must leave the
    // result IDENTICAL to the plain aggregate — that is the check.
    "stream_sink_pg" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(38,4))), 4) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",

    "stream_sliding" ->
      """SELECT ws, event_type, count(*) AS n FROM (
           SELECT TIMESTAMP '1970-01-01 00:00:00'
                  + (CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 - k * 900)
                    * INTERVAL 1 SECOND AS ws,
                  event_type
           FROM events, (SELECT unnest([0, 1, 2, 3]) AS k))
         GROUP BY 1, 2 ORDER BY ws, event_type""",

    "stream_session" ->
      """WITH e AS (SELECT user_id, date_trunc('second', ts) AS sec, value,
                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secl,
                  event_id
           FROM events),
         -- session_window merges TOUCHING intervals (an event exactly
         -- `gap` after the previous one extends the session), so a new
         -- session starts strictly beyond the gap: diff > 1800
         marked AS (SELECT *,
             CASE WHEN secl - lag(secl) OVER w > 1800 OR
                       lag(secl) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY secl, event_id)),
         sess AS (SELECT *,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY secl, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, min(sec) AS sess_start, max(sec) AS sess_last,
                count(*) AS n_events,
                CAST(round(sum(CAST(value AS DECIMAL(38,4))), 4) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, sess_start""",

    "stream_watermark_late" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",

    "stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",

    "stream_stateful_custom" ->
      """WITH e AS (SELECT user_id,
                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secl,
                  event_id
           FROM events),
         marked AS (SELECT *,
             CASE WHEN secl - lag(secl) OVER w >= 1800 OR
                       lag(secl) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY secl, event_id)),
         sess AS (SELECT *,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY secl, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked),
         per_sess AS (SELECT user_id, sid, count(*) AS n,
                  max(secl) - min(secl) AS dur
           FROM sess GROUP BY user_id, sid)
         SELECT user_id, CAST(count(*) AS INTEGER) AS n_sessions,
                CAST(sum(n) AS BIGINT) AS n_events,
                CAST(max(dur) AS BIGINT) AS longest_session_s
         FROM per_sess GROUP BY user_id ORDER BY user_id""",

    "stream_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secl
           FROM events)
         SELECT p.user_id AS user_id, p.event_id AS purchase_id,
                c.event_id AS click_id
         FROM e p JOIN e c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.secl >= p.secl - 1800 AND c.secl <= p.secl
         ORDER BY p.user_id, purchase_id, click_id""",

    "stream_stream_left_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secl
           FROM events)
         SELECT p.user_id AS user_id, p.event_id AS purchase_id,
                c.event_id AS click_id
         FROM (SELECT * FROM e WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND c.secl >= p.secl - 1800 AND c.secl <= p.secl
         ORDER BY user_id, purchase_id, click_id NULLS FIRST""",

    "stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(38,4))), 4) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // Same frozen median/MAD replay as etl_anomaly_flags, same hourly
    // windows and the one per-window IEEE ratio division.
    "stream_anomaly" ->
      """WITH med AS (SELECT event_type,
                quantile_cont(value, 0.5) AS med
              FROM events GROUP BY 1),
         stats AS (SELECT e.event_type, min(m.med) AS med,
                quantile_cont(abs(e.value - m.med), 0.5) AS mad
              FROM events e JOIN med m ON e.event_type = m.event_type
              GROUP BY 1)
         SELECT date_trunc('hour', e.ts) AS ws, e.event_type,
                count(*) AS n,
                CAST(sum(CASE WHEN abs(e.value - s.med) > 3.0 * s.mad
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_anom,
                round(CAST(sum(CASE WHEN abs(e.value - s.med)
                        > 3.0 * s.mad THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*), 4) AS anom_rate
         FROM events e JOIN stats s ON e.event_type = s.event_type
         GROUP BY 1, 2 ORDER BY ws, e.event_type"""
  )
}

/** Session fold shared by the batch key and the streaming test.
  * State = (sessionCount, eventCount, currentSessionStart, lastSeen,
  * longestDur) — a constant-size tuple, never a row list.
  */
object StatefulSessionizer {
  type Row = (Long, Long, Long) // (user_id, epoch_sec, event_id)
  type Out = (Long, Int, Long, Long) // (user_id, n_sessions, n_events, longest_s)
  type St = (Int, Long, Long, Long, Long)

  private[graft] val zero: St = (0, 0L, Long.MinValue, Long.MinValue, 0L)

  /** Advance the state by one time-ordered event. Shared by the batch
    * fold, the flatMapGroupsWithState handler, and the
    * transformWithState processor in StreamingSpec. */
  private[graft] def step(st: St, sec: Long): St = {
    var (nSess, nEv, sessStart, last, longest) = st
    if (last == Long.MinValue || sec - last >= 1800L) {
      nSess += 1; sessStart = sec
    }
    longest = math.max(longest, sec - sessStart)
    (nSess, nEv + 1, sessStart, sec, longest)
  }

  /** Streaming fold over an ENGINE-sorted partition (rows ordered by
    * (user_id, secl, event_id) by a spillable external sort upstream).
    * One O(1) state tuple live at a time; emits a user's row when the
    * partition moves past that user. Memory is independent of group
    * size — the property the round-2 in-handler sort lacked.
    */
  def foldSortedPartition(rows: Iterator[Row]): Iterator[Out] =
    new Iterator[Out] {
      private var pending: Row = _
      private var hasPending = rows.hasNext
      if (hasPending) pending = rows.next()

      override def hasNext: Boolean = hasPending

      override def next(): Out = {
        val user = pending._1
        var st = zero
        var advance = true
        while (advance) {
          st = step(st, pending._2)
          if (rows.hasNext) {
            pending = rows.next()
            if (pending._1 != user) advance = false
          } else { hasPending = false; advance = false }
        }
        (user, st._1, st._2, st._5)
      }
    }

  /** Incremental handler for the streaming (micro-batch) execution in
    * StreamingSpec. The per-call sort is bounded by ONE micro-batch's
    * rows for the key (arrival-order independence within the batch) —
    * not by the user's full history, which lives only as the O(1)
    * state tuple across batches.
    */
  def handle(userId: Long, rows: Iterator[Row],
      state: GroupState[St]): Iterator[Out] = {
    val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(zero)
    sorted.foreach { r => st = step(st, r._2) }
    state.update(st)
    Iterator.single((userId, st._1, st._2, st._5))
  }
}
