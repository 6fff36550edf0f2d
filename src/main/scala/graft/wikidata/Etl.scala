package graft.wikidata

import java.io.BufferedOutputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Stage
import graft.sources.{ParquetSink, PgCopySink, PgDdl, PgServer}

/** The reference tool's COMPLETE pipeline composed as one plan
  * (SURVEY.md §1): bz2-compressed entity NDJSON dump → explicit-schema
  * parse → claims flatten → typed datavalue extraction (+ English label
  * enrichment) → per-partition COPY bulk load into Postgres → read-back.
  * Every stage is the already-verified standalone operator; this key
  * proves they compose — the result is what a consumer SELECTs out of
  * the warehouse table, not an intermediate frame.
  *
  * At 100 TB: bz2 is block-splittable so the dump scan fans out across
  * tasks; parse/flatten/extract are one narrow codegen'd pipeline with
  * no shuffle at all until the final sort; the COPY fan-out streams
  * each partition from its executor (N concurrent COPYs, no driver
  * staging, epoch-keyed idempotence under retries/zombies). The only
  * wide operator in the whole job is the read-back ORDER BY.
  */
object Etl {
  private def bz2Path(s: SparkSession): String =
    Stage.p(s, "graft_wd_entities.ndjson.bz2")

  /** Stage the fixture twice: the bz2 dump the pipeline ingests, and
    * the plain NDJSON twin the DuckDB oracle reads — byte-identical
    * content, so the oracle checks the decompress-and-parse path too. */
  private def ensureBz2(s: SparkSession): String = synchronized {
    Wd.ensureFixture(s)
    val in = getClass.getResourceAsStream("/wd_entities.ndjson")
    require(in != null, "wd_entities.ndjson missing from classpath")
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(s.sparkContext.hadoopConfiguration)
    val out = codec.createOutputStream(
      new BufferedOutputStream(Stage.create(s, bz2Path(s))))
    try out.write(in.readAllBytes())
    finally { out.close(); in.close() }
    bz2Path(s)
  }

  /** Target/readback schema — column order is the Postgres DDL order. */
  private val statementsSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("en_label", StringType),
    StructField("pid", StringType),
    StructField("statement_id", StringType),
    StructField("dv_type", StringType),
    StructField("v_string", StringType),
    StructField("v_entity", StringType),
    StructField("v_time_raw", StringType),
    StructField("v_ts", TimestampType),
    StructField("v_amount", StringType),
    StructField("v_lat", DoubleType),
    StructField("v_lon", DoubleType),
    StructField("v_mono", StringType)))

  type Q = (SparkSession, String) => DataFrame

  /** The dump → warehouse-row frame the load writes: bz2 ingest →
    * explicit-schema parse → claims flatten → typed extraction →
    * en-label enrichment, in DDL column order. Factored out so the
    * shard-fan-out probe (PgShardProbe) measures EXACTLY the declared
    * key's Spark side, not a reconstruction of it. A GenWd bz2 dump
    * (spark.graft.wd.bz2 / SPARK_GRAFT_WD_BZ2) replaces the staged
    * fixture bz2 for scale measurement; unset = fixture, as before. */
  private def dumpEnts(s: SparkSession): DataFrame = {
    val bz2 = s.conf.getOption("spark.graft.wd.bz2")
      .orElse(sys.env.get("SPARK_GRAFT_WD_BZ2"))
      .getOrElse(ensureBz2(s))
    // shared dump reader (round-16): the composed ETL accepts the
    // array-wrapped public dump layout too — format auto-detected
    // from the first decompressed byte, autosplit stays per-scan
    Wd.readDump(s, bz2, EntitySchema.entity)
  }

  def loadFrame(s: SparkSession): DataFrame = {
    // redirect stubs are routed to redirectFrame, never loaded as
    // empty entities (round-15 verdict 3); they carry no claims, so
    // the filter documents the split rather than changing row counts
    val ents = dumpEnts(s).filter(col("redirect").isNull)
    // labels is a MapType: the en lookup is a codegen'd map access,
    // no explode + filter pass over every language
    val enLabels = ents.select(col("id"),
      col("labels").getItem("en").getField("value").as("en_label"))
    val typed = TypedValues.typed(Wd.claimsFlatten(ents))
    typed
      .join(enLabels, Seq("id"), "left")
      .select(statementsSchema.fieldNames.map(col).toSeq: _*)
  }

  /** The dump's redirect relation, loaded alongside the statements
    * table so the warehouse can resolve redirected ids. */
  def redirectFrame(s: SparkSession): DataFrame =
    dumpEnts(s)
      .filter(col("redirect").isNotNull)
      .select(col("id"), col("redirect").as("target"), col("lastrevid"))

  /** DDL schema of the redirects side-table. */
  private[wikidata] val redirectsSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("target", StringType),
    StructField("lastrevid", LongType)))

  /** Postgres DDL column schema of the statements target — the probe
    * creates its target with the same shape as the declared key. */
  private[wikidata] def targetSchema: StructType = statementsSchema

  val queries: Map[String, Q] = Map(
    "etl_wikidata_pg" -> ((s, _) => {
      val load = loadFrame(s)
      if (PgServer.ensure()) {
        val t = "graft_wd_statements"
        PgServer.psql(s"""DROP TABLE IF EXISTS "$t"""")
        PgServer.psql(PgDdl.createTable(t, statementsSchema))
        PgCopySink(PgServer.sockDir, PgServer.port, PgServer.db, t,
          perPartition = true).write(load)
        // redirect stubs land in their own table — the id-resolution
        // relation, never rows in the statements surface
        val rt = "graft_wd_redirects"
        PgServer.psql(s"""DROP TABLE IF EXISTS "$rt"""")
        PgServer.psql(PgDdl.createTable(rt, redirectsSchema))
        PgCopySink(PgServer.sockDir, PgServer.port, PgServer.db, rt,
          perPartition = true).write(redirectFrame(s))
        val out = "/tmp/graft_wd_etl_roundtrip.csv"
        PgServer.psql(
          s"""\\copy (SELECT * FROM "$t" ORDER BY id, pid, statement_id) TO '$out' WITH (FORMAT csv)""")
        s.read.schema(statementsSchema)
          .option("header", "false")
          // Postgres prints TIMESTAMP as 'yyyy-MM-dd HH:mm:ss'
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
          .csv(out)
          .orderBy("id", "pid", "statement_id")
      } else {
        // no server bootable in this environment: the same load frame
        // through the ParquetSink twin — the oracle holds on both paths
        val out = Stage.p(s, "graft_wd_etl_twin")
        ParquetSink(out).write(load)
        s.read.parquet(out).orderBy("id", "pid", "statement_id")
      }
    })
  )

  /** DuckDB replays the whole chain over the plain-NDJSON twin of the
    * same bytes: claims-flatten CTEs + per-type extraction (identical
    * to the wd_values_typed oracle) + the en-label left join. */
  val oracles: Map[String, String] = Map(
    "etl_wikidata_pg" ->
      """WITH ent AS (
           SELECT id, labels, claims
           FROM read_json('/tmp/graft_wd_entities.ndjson',
             format='newline_delimited',
             columns={id: 'VARCHAR', labels: 'JSON', claims: 'JSON'})),
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
           FROM st),
         lab AS (SELECT id, json_extract_string(labels, '$.en.value') AS en_label
                 FROM ent)
         SELECT f.id, lab.en_label, f.pid, f.statement_id, f.dv_type,
             CASE WHEN dv_type = 'string' THEN dv_raw END AS v_string,
             CASE WHEN dv_type = 'wikibase-entityid' THEN j_entity END AS v_entity,
             CASE WHEN dv_type = 'time' THEN j_time END AS v_time_raw,
             TRY_CAST(regexp_extract(
               CASE WHEN dv_type = 'time' THEN j_time END,
               '^\+([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9:]{8})Z$', 1) AS TIMESTAMP) AS v_ts,
             CAST(TRY_CAST(CASE WHEN dv_type = 'quantity' THEN j_amount END
                           AS DECIMAL(38,6)) AS VARCHAR) AS v_amount,
             CASE WHEN dv_type = 'globecoordinate' THEN CAST(j_lat AS DOUBLE) END AS v_lat,
             CASE WHEN dv_type = 'globecoordinate' THEN CAST(j_lon AS DOUBLE) END AS v_lon,
             CASE WHEN dv_type = 'monolingualtext' THEN j_text END AS v_mono
         FROM flat f LEFT JOIN lab ON f.id = lab.id
         ORDER BY f.id, f.pid, f.statement_id"""
  )
}
