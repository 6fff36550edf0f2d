package graft.wikidata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed extraction from the polymorphic `datavalue` (SURVEY.md §1.1):
  * the reference tool's core reshaping step, Spark-first.
  *
  * Each dv-type is parsed from the raw-JSON string with its own explicit
  * schema behind `from_json`; everything stays nullable and `try_`-style
  * (never-throwing) because real dump values exceed Spark's native
  * types: times reach year ±10¹⁰ (kept raw + best-effort TimestampType),
  * quantity amounts are arbitrary-precision decimal strings (kept raw +
  * best-effort DECIMAL(38,6)).
  */
object TypedValues {
  private val entityIdSchema = StructType(Seq(
    StructField("entity-type", StringType),
    StructField("numeric-id", LongType),
    StructField("id", StringType)))

  private val timeSchema = StructType(Seq(
    StructField("time", StringType),
    StructField("timezone", IntegerType),
    StructField("precision", IntegerType),
    StructField("calendarmodel", StringType)))

  private val quantitySchema = StructType(Seq(
    StructField("amount", StringType),
    StructField("unit", StringType),
    StructField("upperBound", StringType),
    StructField("lowerBound", StringType)))

  private val coordSchema = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("precision", DoubleType),
    StructField("globe", StringType)))

  private val monoSchema = StructType(Seq(
    StructField("text", StringType),
    StructField("language", StringType)))

  type Q = (SparkSession, String) => DataFrame

  /** Typed-extraction core (unsorted) over a claims-flatten frame —
    * shared by the standalone key and the composed ETL chains.
    * `passThrough` columns ride along unchanged (round-17 verdict 4:
    * lets the mediainfo ETL carry its caption through ONE dump scan
    * instead of re-scanning for a caption join). */
  def typed(claims: DataFrame, passThrough: Seq[String] = Nil): DataFrame =
    claims.select(
        Seq(col("id"), col("pid"), col("statement_id"), col("dv_type")) ++
        passThrough.map(col) :+
        // string: the raw payload IS the value (quotes stripped by the
        // JSON parser only when the payload was a JSON string literal —
        // it is kept verbatim otherwise)
        when(col("dv_type") === "string", col("dv_raw")).as("v_string") :+
        from_json(when(col("dv_type") === "wikibase-entityid", col("dv_raw")),
          entityIdSchema).getField("id").as("v_entity") :+
        from_json(when(col("dv_type") === "time", col("dv_raw")),
          timeSchema).getField("time").as("v_time_raw") :+
        // best-effort: in-range ISO instants only; year-12000 etc stay null
        try_to_timestamp(
          regexp_extract(
            from_json(when(col("dv_type") === "time", col("dv_raw")), timeSchema)
              .getField("time"),
            "^\\+([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9:]{8})Z$", 1),
          lit("yyyy-MM-dd'T'HH:mm:ss")).as("v_ts") :+
        from_json(when(col("dv_type") === "quantity", col("dv_raw")),
          quantitySchema).getField("amount").as("v_amount_raw") :+
        from_json(when(col("dv_type") === "globecoordinate", col("dv_raw")),
          coordSchema).getField("latitude").as("v_lat") :+
        from_json(when(col("dv_type") === "globecoordinate", col("dv_raw")),
          coordSchema).getField("longitude").as("v_lon") :+
        from_json(when(col("dv_type") === "monolingualtext", col("dv_raw")),
          monoSchema).getField("text").as("v_mono"): _*)
      // try_cast (never-throwing under ANSI): >38-digit amounts → null.
      // Surfaced as the decimal's canonical string so the cross-engine
      // hash gate compares text, not engine decimal wire formats.
      .withColumn("v_amount",
        expr("CAST(try_cast(v_amount_raw AS DECIMAL(38,6)) AS STRING)"))

  val queries: Map[String, Q] = Map(
    "wd_values_typed" -> ((s, _) =>
      typed(Wd.queries("wd_claims_flatten")(s, ""))
        .orderBy("id", "pid", "statement_id"))
  )

  /** DuckDB mirror over the same fixture bytes (wd_claims_flatten's CTE
    * chain + per-type json_extract). try_cast/regexp behavior is pinned
    * on both engines: no-match regexp_extract yields '' (cast → NULL),
    * >38-digit amounts TRY_CAST to NULL. */
  val oracles: Map[String, String] = Map(
    "wd_values_typed" ->
      """WITH ent AS (
           SELECT id, claims FROM read_json('/tmp/graft_wd_entities.ndjson',
             format='newline_delimited', columns={id: 'VARCHAR', claims: 'JSON'})),
         pids AS (SELECT id, unnest(json_keys(claims)) AS pid, claims FROM ent),
         st AS (SELECT id, pid,
                  unnest(CAST(json_extract(claims, '$.' || pid) AS JSON[])) AS stj
                FROM pids),
         flat AS (SELECT id, pid,
             json_extract_string(stj, '$.id') AS statement_id,
             json_extract_string(stj, '$.mainsnak.datavalue.type') AS dv_type,
             json_extract_string(stj, '$.mainsnak.datavalue.value') AS dv_raw,
             json_extract_string(stj, '$.mainsnak.datavalue.value.id') AS j_entity,
             json_extract_string(stj, '$.mainsnak.datavalue.value.time') AS j_time,
             json_extract_string(stj, '$.mainsnak.datavalue.value.amount') AS j_amount,
             json_extract(stj, '$.mainsnak.datavalue.value.latitude') AS j_lat,
             json_extract(stj, '$.mainsnak.datavalue.value.longitude') AS j_lon,
             json_extract_string(stj, '$.mainsnak.datavalue.value.text') AS j_text
           FROM st)
         SELECT id, pid, statement_id, dv_type,
             CASE WHEN dv_type = 'string' THEN dv_raw END AS v_string,
             CASE WHEN dv_type = 'wikibase-entityid' THEN j_entity END AS v_entity,
             CASE WHEN dv_type = 'time' THEN j_time END AS v_time_raw,
             TRY_CAST(regexp_extract(
               CASE WHEN dv_type = 'time' THEN j_time END,
               '^\+([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9:]{8})Z$', 1) AS TIMESTAMP) AS v_ts,
             CASE WHEN dv_type = 'quantity' THEN j_amount END AS v_amount_raw,
             CASE WHEN dv_type = 'globecoordinate' THEN CAST(j_lat AS DOUBLE) END AS v_lat,
             CASE WHEN dv_type = 'globecoordinate' THEN CAST(j_lon AS DOUBLE) END AS v_lon,
             CASE WHEN dv_type = 'monolingualtext' THEN j_text END AS v_mono,
             CAST(TRY_CAST(CASE WHEN dv_type = 'quantity' THEN j_amount END
                           AS DECIMAL(38,6)) AS VARCHAR) AS v_amount
         FROM flat ORDER BY id, pid, statement_id"""
  )
}
