package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-tool main: scale an existing fixture directory K× (default 10)
  * into a new directory, so the scaling exponent of each operator can be
  * MEASURED instead of argued (VERDICT r7 item 1). Not part of the
  * driver contract — the driver's fixtures stay read-only; this writes
  * only under the repo (e.g. tmp/sf1).
  *
  * Expansion model — K key-shifted copies, the standard way to grow a
  * star schema without changing its per-key distributions:
  *  - region/nation copy through unchanged (fixed dimensions, exactly
  *    like TPC-H at every SF);
  *  - every BIGINT entity key shifts by copy·Off, where Off is the
  *    power of two strictly above the LARGEST key in the source
  *    fixture (measured, not assumed — a fixed literal would collide
  *    when GenScale is chained on its own output), applied consistently
  *    on both sides of each FK, so join fan-outs per key are IDENTICAL
  *    to the source — only the key population grows;
  *  - timestamps are kept, so the time span stays fixed and per-day
  *    volumes grow K× (how a bigger business looks in the same month —
  *    this is what stresses the windowed/fixed-point operators); the
  *    events table is read through Tables.events so both historical
  *    fixture generations (TIMESTAMP(NANOS) and timestamp[us]) work —
  *    the output ships normalized µs timestamps, which every reader
  *    handles;
  *  - document text gets a tiny per-copy suffix: copies stay DISTINCT
  *    (no degenerate 10-way exact-dup corpus) but remain near-dups of
  *    their base doc — a realistic heavy-dedup workload; n_chars is
  *    recomputed to stay consistent;
  *  - embeddings rotate by `copy mod dims` positions: norm and
  *    coordinate distribution preserved, copies decorrelated, zero RNG
  *    (the determinism rule: derive, never draw). K > dims wraps the
  *    rotation (copy dims and 0 coincide directionally) — acceptable
  *    for scale measurement, noted rather than hidden.
  *
  * Usage: runMain graft.GenScale <srcDir> <dstDir> [k]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val (src, dst, k) = args match {
      case Array(s, d)     => (s, d, 10)
      case Array(s, d, kk) => (s, d, kk.toInt)
      case _ => sys.error("usage: GenScale <srcDir> <dstDir> [k]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = (n: String) => Tables.table(spark, src, n)
    val ev = Tables.events(spark, src)

    // Collision-proof shift: the next power of two strictly above every
    // key the source holds (so chained GenScale runs keep distinct key
    // spaces instead of silently overlapping copy c of run 2 with copy
    // c' of run 1).
    val maxKey: Long = Seq(
      t("customer").agg(max(col("c_custkey"))),
      t("orders").agg(max(col("o_orderkey"))),
      t("part").agg(max(col("p_partkey"))),
      t("supplier").agg(max(col("s_suppkey"))),
      ev.agg(max(greatest(col("event_id"), col("user_id")))),
      t("documents").agg(max(col("doc_id"))),
      t("embeddings").agg(max(col("vec_id"))))
      .map(_.head().getLong(0)).max
    val off: Long = java.lang.Long.highestOneBit(maxKey) << 1
    println(s"GENSCALE off=$off (maxKey=$maxKey)")

    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(k.toLong).select(col("id").as("cp")))

    def shift(c: String): org.apache.spark.sql.Column =
      col(c) + col("cp") * off

    def write(df: DataFrame, name: String, files: Int): Unit = {
      df.drop("cp").repartition(files)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"GENSCALE $name done")
    }

    // fixed dimensions: straight copies
    write(t("region"), "region", 1)
    write(t("nation"), "nation", 1)

    write(copies(t("customer")).withColumn("c_custkey", shift("c_custkey")),
      "customer", math.max(1, k / 2))
    write(copies(t("supplier")).withColumn("s_suppkey", shift("s_suppkey")),
      "supplier", 1)
    write(copies(t("part")).withColumn("p_partkey", shift("p_partkey")),
      "part", math.max(1, k / 2))
    write(copies(t("orders"))
      .withColumn("o_orderkey", shift("o_orderkey"))
      .withColumn("o_custkey", shift("o_custkey")),
      "orders", k)
    write(copies(t("lineitem"))
      .withColumn("l_orderkey", shift("l_orderkey"))
      .withColumn("l_partkey", shift("l_partkey"))
      .withColumn("l_suppkey", shift("l_suppkey")),
      "lineitem", 2 * k)
    write(copies(ev)
      .withColumn("event_id", shift("event_id"))
      .withColumn("user_id", shift("user_id")),
      "events", k)
    write(copies(t("documents"))
      .withColumn("doc_id", shift("doc_id"))
      .withColumn("text",
        when(col("cp") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" c"),
            col("cp").cast("string"))))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", math.max(1, k / 2))
    write(copies(t("embeddings"))
      .withColumn("vec_id", shift("vec_id"))
      .withColumn("embedding", expr(
        """CASE WHEN cp % size(embedding) = 0 THEN embedding
           ELSE concat(
             slice(embedding,
                   CAST(cp % size(embedding) AS INT) + 1,
                   size(embedding) - CAST(cp % size(embedding) AS INT)),
             slice(embedding, 1, CAST(cp % size(embedding) AS INT)))
           END""")),
      "embeddings", math.max(1, k / 4))
    spark.stop()
  }
}
