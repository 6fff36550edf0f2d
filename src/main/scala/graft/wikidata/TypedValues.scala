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

  val queries: Map[String, Q] = Map(
    "wd_values_typed" -> ((s, _) => {
      val claims = Wd.queries("wd_claims_flatten")(s, "")
      claims.select(
        col("id"), col("pid"), col("statement_id"), col("dv_type"),
        // string: the raw payload IS the value (quotes stripped by the
        // JSON parser only when the payload was a JSON string literal —
        // it is kept verbatim otherwise)
        when(col("dv_type") === "string", col("dv_raw")).as("v_string"),
        from_json(when(col("dv_type") === "wikibase-entityid", col("dv_raw")),
          entityIdSchema).getField("id").as("v_entity"),
        from_json(when(col("dv_type") === "time", col("dv_raw")),
          timeSchema).getField("time").as("v_time_raw"),
        // best-effort: in-range ISO instants only; year-12000 etc stay null
        try_to_timestamp(
          regexp_extract(
            from_json(when(col("dv_type") === "time", col("dv_raw")), timeSchema)
              .getField("time"),
            "^\\+([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9:]{8})Z$", 1),
          lit("yyyy-MM-dd'T'HH:mm:ss")).as("v_ts"),
        from_json(when(col("dv_type") === "quantity", col("dv_raw")),
          quantitySchema).getField("amount").as("v_amount_raw"),
        from_json(when(col("dv_type") === "globecoordinate", col("dv_raw")),
          coordSchema).getField("latitude").as("v_lat"),
        from_json(when(col("dv_type") === "globecoordinate", col("dv_raw")),
          coordSchema).getField("longitude").as("v_lon"),
        from_json(when(col("dv_type") === "monolingualtext", col("dv_raw")),
          monoSchema).getField("text").as("v_mono"))
        // try_cast (never-throwing under ANSI): >38-digit amounts → null
        .withColumn("v_amount", expr("try_cast(v_amount_raw AS DECIMAL(38,6))"))
        .orderBy("id", "pid", "statement_id")
    })
  )
}
