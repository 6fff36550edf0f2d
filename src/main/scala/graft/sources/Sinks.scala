package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink abstraction (SURVEY.md §2.1): the reference's core capability is
  * bulk-loading rows into Postgres; Spark-first that is
  * `df.write.format("jdbc")` with batched writes. No Postgres JDBC jar
  * is resolvable in this offline image (SURVEY §0/§7.5), so JdbcSink is
  * code-complete + option-tested while ParquetSink is its runnable twin
  * used end-to-end — the two share this trait so swapping the URL is the
  * only change a user makes.
  */
trait Sink {
  def write(df: DataFrame): Unit
}

/** Postgres (or any JDBC) bulk load.
  *
  * 100 TB notes: `numPartitions` caps concurrent connections (each Spark
  * partition opens one); `batchsize` controls rows per round-trip
  * (multi-row INSERT — the JDBC analogue of the reference's batched
  * COPY); `reWriteBatchedInserts=true` is the pgjdbc flag that rewrites
  * batches into multi-VALUES statements (~5-10× ingest speedup).
  *
  * Every option here has a live-Postgres twin assertion through
  * PgCopySink (PgSpec "JdbcSink option surface…"): numPartitions →
  * connection cap, batchsize → batchRows, truncate → transactional
  * TRUNCATE-before-promote, isolationLevel → explicit promote
  * isolation, user/password → scram-authenticated role. The literal
  * `.format("jdbc")` call below stays jar-gated offline (SURVEY §7.5)
  * but no option's behavior is untested.
  */
final case class JdbcSink(
    url: String,
    table: String,
    user: String = "",
    password: String = "",
    batchSize: Int = 10000,
    numPartitions: Int = 32,
    truncate: Boolean = false) extends Sink {

  def options: Map[String, String] = Map(
    "url" -> (url + (if (url.contains("?")) "&" else "?") + "reWriteBatchedInserts=true"),
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "batchsize" -> batchSize.toString,
    "numPartitions" -> numPartitions.toString,
    "truncate" -> truncate.toString,
    "isolationLevel" -> "READ_COMMITTED")

  override def write(df: DataFrame): Unit =
    df.coalesce(numPartitions).write
      .format("jdbc").options(options).mode("append").save()
}

/** Filesystem twin of JdbcSink — identical call shape, parquet at rest. */
final case class ParquetSink(path: String) extends Sink {
  override def write(df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path)
}

object Sink {
  /** URL-dispatched factory: `jdbc:postgresql://…` → JdbcSink, anything
    * else is treated as a filesystem path. */
  def forUrl(url: String, table: String = "t"): Sink =
    if (url.startsWith("jdbc:")) JdbcSink(url, table) else ParquetSink(url)
}
