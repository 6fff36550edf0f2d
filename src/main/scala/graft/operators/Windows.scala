package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Det, Tables}
import Det._

/** Window functions (SURVEY.md §2.5).
  *
  * Discipline (SURVEY §7.4): every window order includes a unique
  * tiebreaker; frames are ROWS (never RANGE over non-unique keys);
  * event-time is truncated to whole seconds before any ordering that the
  * DuckDB oracle must reproduce. All windows are partitioned (bounded
  * per-partition state) except the deliberately-small aggregated input
  * of win_running_sum.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "win_topk_per_group" -> ((s, d) => {
      // Top-3 parts by revenue per brand. Revenue is an exact decimal →
      // identical ordering cross-engine; p_partkey breaks ties.
      val rev = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("p_partkey"))
      rev.withColumn("rnk", dense_rank().over(w).cast(IntegerType))
        .filter(col("rnk") <= 3)
        .orderBy("p_brand", "rnk", "p_partkey")
    }),

    "win_topk_native" -> ((s, d) => {
      // Identical result to win_topk_per_group through the NATIVE
      // bounded top-k aggregate (graft.functions.TopKByAgg): a k-heap
      // per group partial-aggregates map-side, so only ≤ k rows per
      // group per partition cross the shuffle — vs the rank-window's
      // full shuffle+sort of every row. The shared oracle proves the
      // two plans agree; ord = (revenue, -p_partkey) is a total order,
      // making the heap merge exact and deterministic.
      graft.functions.TopKByAgg.register(s)
      val rev = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      rev.groupBy(col("p_brand"))
        .agg(expr("topk_by(struct(revenue, -p_partkey), struct(p_partkey, revenue), 3)")
          .as("tk"))
        .select(col("p_brand"), posexplode(col("tk")).as(Seq("i", "e")))
        .select(col("p_brand"),
          col("e.payload.p_partkey").as("p_partkey"),
          col("e.payload.revenue").as("revenue"),
          (col("i") + 1).cast(IntegerType).as("rnk"))
        .orderBy("p_brand", "rnk", "p_partkey")
    }),

    "win_dedup_latest" -> ((s, d) => {
      // Latest event per user — the canonical keep-one dedup idiom.
      val ev = Tables.events(s, d).withColumn("sec", secs(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy("user_id")
    }),

    "win_lag_lead" -> ((s, d) => {
      // Inter-event gap (seconds) per user via lag over event order.
      val ev = Tables.events(s, d).withColumn("sec_l", epochS(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec_l"), col("event_id"))
      ev.select(col("user_id"), col("event_id"), col("sec_l"),
        lag(col("sec_l"), 1).over(w).as("prev_sec"),
        lead(col("event_id"), 1).over(w).as("next_event"))
        .withColumn("gap_s", col("sec_l") - col("prev_sec"))
        .select(col("user_id"), col("event_id"), col("gap_s"), col("next_event"))
        .orderBy("user_id", "event_id")
    }),

    "win_moving_avg" -> ((s, d) => {
      // 3-row trailing average. Exact path: windowed decimal sum /
      // windowed count (a windowed double avg would drift last-ulp).
      val ev = Tables.events(s, d).withColumn("sec_l", epochS(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec_l"), col("event_id"))
        .rowsBetween(-2, 0)
      ev.select(col("user_id"), col("event_id"),
        round(sum(dec(col("value"))).over(w).cast(DoubleType)
          / count(lit(1)).over(w), 4).as("mavg"))
        .orderBy("user_id", "event_id")
    }),

    "win_first_last" -> ((s, d) => {
      // first_value / last_value / nth_value over a full unbounded frame
      // (last_value over the default frame is a classic footgun — the
      // explicit frame makes it the true per-group last).
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d).select(
        col("c_mktsegment"),
        first(col("c_custkey")).over(w).as("richest"),
        last(col("c_custkey")).over(w).as("poorest"),
        nth_value(col("c_custkey"), 2).over(w).as("runner_up"))
        .distinct()
        .orderBy("c_mktsegment")
    }),

    "win_rank_stats" -> ((s, d) => {
      // Distribution-rank family: ntile / percent_rank / cume_dist /
      // rank over a fully-tiebroken order (exact rationals — identical
      // cross-engine; rounding is belt-and-braces).
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d).select(
        col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).cast(IntegerType).as("quartile"),
        rank().over(w).cast(IntegerType).as("rnk"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cdist"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "win_running_sum" -> ((s, d) => {
      // Cumulative revenue by ship date. Input is pre-aggregated to one
      // row per day (~2.5k rows) so the global (unpartitioned) window is
      // safe; the running sum stays decimal-exact until the final cast.
      val daily = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(sum(dec(col("l_extendedprice"))).as("rev_d"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("d"),
        money(col("rev_d")).as("daily_rev"),
        money(sum(col("rev_d")).over(w)).as("running_rev"))
        .orderBy("d")
    })
  )

  val oracles: Map[String, String] = Map(
    // same SQL as win_topk_per_group — the native aggregate must agree
    // with the rank-window formulation row for row
    "win_topk_native" ->
      """SELECT p_brand, p_partkey, revenue, CAST(rnk AS INTEGER) AS rnk FROM (
           SELECT p_brand, p_partkey, revenue,
                  dense_rank() OVER (PARTITION BY p_brand
                    ORDER BY revenue DESC, p_partkey) AS rnk
           FROM (SELECT p_brand, p_partkey,
                   CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,4))),4) AS DOUBLE) AS revenue
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 GROUP BY p_brand, p_partkey)
         ) WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey""",

    "win_topk_per_group" ->
      """SELECT p_brand, p_partkey, revenue, CAST(rnk AS INTEGER) AS rnk FROM (
           SELECT p_brand, p_partkey, revenue,
                  dense_rank() OVER (PARTITION BY p_brand
                    ORDER BY revenue DESC, p_partkey) AS rnk
           FROM (SELECT p_brand, p_partkey,
                   CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,4))),4) AS DOUBLE) AS revenue
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 GROUP BY p_brand, p_partkey)
         ) WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey""",

    "win_dedup_latest" ->
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
           FROM events
         ) WHERE rn = 1 ORDER BY user_id""",

    "win_lag_lead" ->
      """SELECT user_id, event_id,
             sec_l - lag(sec_l, 1) OVER w AS gap_s,
             lead(event_id, 1) OVER w AS next_event
         FROM (SELECT user_id, event_id,
                 CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec_l
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY sec_l, event_id)
         ORDER BY user_id, event_id""",

    "win_moving_avg" ->
      """SELECT user_id, event_id,
             round(CAST(sum(CAST(value AS DECIMAL(38,4))) OVER w AS DOUBLE)
                   / count(*) OVER w, 4) AS mavg
         FROM events
         WINDOW w AS (PARTITION BY user_id
                      ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT), event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "win_first_last" ->
      """SELECT DISTINCT c_mktsegment,
             first_value(c_custkey) OVER w AS richest,
             last_value(c_custkey) OVER w AS poorest,
             nth_value(c_custkey, 2) OVER w AS runner_up
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY c_mktsegment""",

    "win_rank_stats" ->
      """SELECT c_mktsegment, c_custkey,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             CAST(rank() OVER w AS INTEGER) AS rnk,
             round(percent_rank() OVER w, 4) AS pct_rank,
             round(cume_dist() OVER w, 4) AS cdist
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_mktsegment, c_custkey""",

    "win_running_sum" ->
      """SELECT d,
             CAST(round(rev_d, 4) AS DOUBLE) AS daily_rev,
             CAST(round(sum(rev_d) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_rev
         FROM (SELECT CAST(l_shipdate AS DATE) AS d,
                 sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS rev_d
               FROM lineitem GROUP BY 1)
         ORDER BY d"""
  )
}
