package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas documented in FIXTURES.md).
  *
  * Parquet footers are self-describing, so reading without an explicit
  * schema is deterministic (the `inferSchema` hazard only applies to
  * CSV/JSON sampling). Explicit `StructType`s for semi-structured
  * sources live next to their readers (see graft.wikidata.EntitySchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * timestamp[us] across fixture generations, so the reader adapts to
    * the footer type instead of assuming either:
    *   - NANOS: Spark 4 rejects it by default (PARQUET_TYPE_ILLEGAL);
    *     with `nanosAsLong` it surfaces as LongType, which we truncate
    *     to a µs TimestampType. Cross-engine comparisons truncate
    *     further to whole seconds (Det.secs), so the ns→µs floor is
    *     harmless (SURVEY.md §7.4).
    *   - timestamp[us] (isAdjustedToUTC=false): Spark reads
    *     TIMESTAMP_NTZ; the session TZ is pinned UTC, so casting to
    *     TimestampType is value-preserving.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // Conf is set only if missing: mutating session conf per-read would
    // invalidate cached plans needlessly at scale. It only affects
    // NANOS-annotated columns, so it is inert for µs fixtures.
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // `ts div 1000` stays in LONG integer arithmetic: `/` would promote
      // to double, and epoch-nanos (~1e18) exceed double's 2^53 exact
      // range, perturbing values near second boundaries vs DuckDB.
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register all fixture tables as temp views (for spark.sql queries).
    * events goes through its ns-safe reader. */
  def registerAll(s: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, dir) else table(s, dir, n)
      df.createOrReplaceTempView(n)
    }
}
