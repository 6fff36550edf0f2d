package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** UDF / UDAF surface (SURVEY.md §2.11).
  *
  * Cost note recorded for the 100 TB design: a Scala UDF is opaque to
  * Catalyst — no predicate pushdown through it, no codegen fusion, extra
  * serialization at the lambda boundary. udf_normalize exists to pin the
  * pattern; production normalization should be the equivalent built-in
  * chain (lower + regexp_replace), which IS what the oracle uses to
  * prove equivalence. Custom aggregates use typed Aggregator + udaf() —
  * the same pattern an HLL/TDigest sketch would use
  * (TypedImperativeAggregate only if codegen-level perf demands it).
  */
object Udfs {
  type Q = (SparkSession, String) => DataFrame

  /** Text normalizer: lower, strip non-alphanumerics, collapse runs of
    * spaces. [ ]+ (not \s+) to stay inside the cross-engine regex
    * subset (SURVEY §7.4.4). */
  private val normalize = udf { s: String =>
    if (s == null) null
    else s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll("[ ]+", " ").trim
  }

  /** Geometric mean via typed Aggregator: exp(mean(ln x)).
    *
    * The log-sum accumulates as fixed-point longs, not raw doubles:
    * partition merge order is nondeterministic, and a raw double sum
    * could drift across runs / engines near the oracle's 4-dp rounding
    * boundary. Long addition is order-independent.
    *
    * The grid is 2²⁰, deliberately COARSER than Det.FixedPoint's 2⁴⁰:
    * cross-engine equality also needs Java's Math.log and the oracle
    * engine's ln() to floor to the same cell, and they are only
    * guaranteed equal to ~1 ulp (different libms). At 2⁴⁰ a 1-ulp
    * divergence of ln(≈900) spans ~1e-3 of a cell — flips likely; at
    * 2²⁰ it spans ~1e-9 of a cell. The ≤2⁻²⁰ quantization error is in
    * LOG space, i.e. ≤~9.5e-7 RELATIVE on the output — the hash gate
    * holds because the oracle replays the identical quantization, not
    * because the absolute error sits under the 4-dp grid (for gm≈1000
    * it is ~1e-3, above it). */
  private[functions] val GeoGrid = (1L << 20).toDouble

  private object GeoMean extends Aggregator[Double, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Double): (Long, Long) =
      (b._1 + math.floor(math.log(a) * GeoGrid).toLong, b._2 + 1)
    override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0
      else math.exp(r._1.toDouble / GeoGrid / r._2)
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    "udf_normalize" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          normalize(concat(lit("  "), upper(col("p_name")), lit("!!  "))).as("norm"))
        .orderBy("p_partkey")
    }),

    "udaf_geomean" -> ((s, d) => {
      val gm = udaf(GeoMean)
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(round(gm(col("p_retailprice")), 4).as("gm"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    })
  )

  val oracles: Map[String, String] = Map(
    // Proves the UDF ≡ the built-in chain it should be replaced by.
    "udf_normalize" ->
      """SELECT p_partkey,
             trim(regexp_replace(regexp_replace(
               lower('  ' || upper(p_name) || '!!  '),
               '[^a-z0-9 ]', ' ', 'g'), '[ ]+', ' ', 'g')) AS norm
         FROM part ORDER BY p_partkey""",

    // Mirrors the Aggregator's fixed-point log-sum exactly: floor(ln·2²⁰)
    // as BIGINT (coarse grid — see GeoGrid's ulp rationale), exact
    // integer sum, one final double division.
    "udaf_geomean" ->
      """SELECT p_brand,
             round(exp(CAST(sum(CAST(floor(ln(p_retailprice) * 1048576.0) AS BIGINT)) AS DOUBLE)
                       / 1048576.0 / count(*)), 4) AS gm,
             count(*) AS n
         FROM part GROUP BY p_brand ORDER BY p_brand"""
  )
}
