package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers (SURVEY.md §7.4): every numeric that crosses the
  * Spark↔DuckDB oracle boundary goes through an exact-arithmetic path so
  * both engines produce bit-identical values regardless of accumulation
  * order.
  *
  * Rules encoded here:
  *  - Never hash a raw floating-point *aggregate*: sum/avg accumulate in
  *    engine-specific order → last-ulp drift. Cast to DECIMAL(38,4)
  *    before aggregating (exact in both engines), convert to double only
  *    at the very end (single deterministic IEEE conversion).
  *  - Per-row double arithmetic (a*b, 1-x) is fine: both engines execute
  *    the same IEEE ops in the same order on identical inputs.
  *  - Event timestamps are ns-precision in parquet; Spark truncates to µs
  *    while DuckDB keeps ns. Truncate to whole seconds on BOTH sides
  *    before any cross-engine comparison or ordering (`secs`/`epochS`).
  */
object Det {
  /** Exact money/measure type: wide enough to never overflow a 100 TB sum
    * (38-4 = 34 integral digits), exact in Spark and DuckDB. */
  val Money: DecimalType = DecimalType(38, 4)

  /** Cast to the exact decimal type before aggregation. */
  def dec(c: Column): Column = c.cast(Money)

  /** Exact sum of a (possibly double-typed, per-row-computed) measure,
    * surfaced as a deterministic double. */
  def sumMoney(c: Column): Column = round(sum(dec(c)), 4).cast(DoubleType)

  /** Deterministic double from an exact decimal expression. */
  def money(c: Column): Column = round(c, 4).cast(DoubleType)

  /** Fixed-point scale for similarity dot products: 2⁴⁰. Scaling a
    * double by a power of two is exact (exponent shift), floor() is
    * engine-agreed, and the resulting LONG sum is order-independent AND
    * codegen'd — ~3× faster than the DECIMAL(38,18) path with ≤6e-11
    * absolute error over 64 dims (invisible at round-4). Bounds: |v|≤1
    * floats → |prod·2⁴⁰| ≤ 2⁴⁰, ×64 dims ≪ Long.Max. */
  val FixedPoint: Double = (1L << 40).toDouble

  /** Order-independent exact sum of per-row double products, as a
    * double. Mirror in DuckDB:
    * CAST(sum(CAST(floor(prod * 1099511627776.0) AS BIGINT)) AS DOUBLE)
    *   / 1099511627776.0 */
  def sumFixed(prod: Column): Column =
    sum(floor(prod * FixedPoint)).cast(DoubleType) / FixedPoint

  /** Spark-side md5 hex-slice → BIGINT: the ONE deterministic-hash
    * idiom behind bucket splits, surrogate keys, bootstrap u, and row
    * checksums — chars [start, start+len) of md5(input) parsed base-16
    * (len ≤ 15 keeps the value in positive BIGINT range). */
  def md5SliceExpr(input: String, start: Int, len: Int): String = {
    require(len >= 1 && len <= 15, s"md5 slice len $len outside 1..15")
    s"""CAST(conv(substring(md5(CAST(($input) AS STRING)), $start, $len),
        16, 10) AS BIGINT)"""
  }

  /** DuckDB twin of [[md5SliceExpr]] — DuckDB has no conv(), so the hex
    * chars fold through a strpos list_reduce (same digits, same base). */
  def md5SliceSql(input: String, start: Int, len: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         [strpos('0123456789abcdef',
                 substring(md5(CAST(($input) AS VARCHAR)),
                           CAST(i AS INTEGER), 1)) - 1
          FOR i IN range($start, ${start + len})]),
         (acc, x) -> acc * 16 + x)"""

  /** Event-time truncated to whole seconds (cross-engine-safe). */
  def secs(c: Column): Column = date_trunc("second", c)

  /** Epoch seconds as long (after whole-second truncation). */
  def epochS(c: Column): Column = date_trunc("second", c).cast(LongType)

  /** UTC day index of a timestamp — THE day bucket every daily-series
    * operator shares (mirrored in oracles as
    * `epoch(date_trunc('second', ts)) // 86400`). One definition so a
    * future epoch/truncation change can't drift between the eight
    * operators that bucket by day. floor() (not integer div) so the
    * pre-1970 edge would round DOWN like the oracle's `//`, though
    * every fixture is post-1970. */
  def epochDay(c: Column): Column =
    floor(epochS(c) / lit(86400)).cast(LongType)
}
