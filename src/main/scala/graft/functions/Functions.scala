package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.8): string / date / math /
  * conditional / array / map / JSON — all built-in codegen'd expressions,
  * zero UDFs (UDFs live in §2.11 with their cost documented).
  *
  * Cross-engine dialect pins (SURVEY §7.4): POSIX-safe regexes only
  * (Java regex ∩ RE2), DuckDB regexp_replace needs the 'g' flag to match
  * Spark's replace-all, DuckDB dayofweek is 0-based (Spark 1-based),
  * transcendental results rounded to 4 dp.
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 4).as("sub4"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        length(col("p_name")).as("len"),
        // serialized (not a raw array) so the driver's pandas hash gate
        // can sort/hash the cell; split itself is still the codegen path.
        array_join(split(col("p_name"), " "), ",").as("toks"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"))
        .orderBy("p_partkey")
    }),

    "fn_date" -> ((s, d) => {
      // Distinct ship dates keep the output compact; every derived
      // column uses an engine-agreeing formulation (see oracle).
      Tables.lineitem(s, d)
        .select(to_date(col("l_shipdate")).as("d")).distinct()
        .select(
          col("d"),
          year(col("d")).as("y"),
          month(col("d")).as("m"),
          dayofmonth(col("d")).as("dom"),
          dayofweek(col("d")).as("dow"),
          trunc(col("d"), "month").as("mstart"),
          datediff(col("d"), lit("1995-01-01")).as("days_since"),
          add_months(col("d"), 3).as("plus3m"),
          last_day(col("d")).as("eom"))
        .orderBy("d")
    }),

    "fn_math" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        ceil(col("p_retailprice") / 10.0).as("cl"),
        floor(col("p_retailprice") / 10.0).as("fl"),
        abs(col("p_size") - 25).as("ab"),
        pow(col("p_size").cast(DoubleType), 2.0).as("pw"),
        round(log(col("p_retailprice")), 4).as("lnv"),
        round(sqrt(col("p_retailprice")), 4).as("sq"),
        signum(col("p_size") - 25).cast(IntegerType).as("sgn"),
        pmod(col("p_size"), lit(7)).as("pm"))
        .orderBy("p_partkey")
    }),

    "fn_bitwise" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        col("p_partkey").bitwiseAND(lit(255L)).as("band"),
        col("p_partkey").bitwiseOR(lit(15L)).as("bor"),
        col("p_partkey").bitwiseXOR(lit(93L)).as("bxor"),
        shiftleft(col("p_partkey"), 3).as("shl"),
        shiftright(col("p_partkey"), 2).as("shr"),
        bit_count(col("p_partkey")).as("nbits"))
        .orderBy("p_partkey")
    }),

    "fn_regexp" -> ((s, d) => {
      // Regex family: extract / extract-all / match / global replace /
      // match count. Patterns stay in the Java∩RE2 POSIX-safe subset
      // (header note); all five are codegen'd per-row expressions —
      // map-only over a 100 TB scan, no shuffle.
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("id_digits"),
        col("c_name").rlike("^Customer#[0-9]{6,}$").as("well_formed"),
        regexp_replace(col("c_name"), "[0-9]{6,}", "<ID>").as("masked"),
        // serialized (not a raw array) so the driver's pandas hash gate
        // can sort/hash the cell.
        array_join(regexp_extract_all(col("c_name"), lit("[0-9]+"), lit(0)), ",")
          .as("digit_runs"),
        size(regexp_extract_all(col("c_name"), lit("[0-9]"), lit(0)))
          .as("n_digits"))
        .orderBy("c_custkey")
    }),

    "fn_try_arith" -> ((s, d) => {
      // ANSI-safe try_* family. Spark 4 runs ANSI mode by default:
      // division by zero and bad casts THROW mid-job — on a 100 TB run
      // that's a dead job 6 hours in. try_divide/try_cast/try_add turn
      // the poison rows into NULLs that downstream filters handle; all
      // per-row codegen'd expressions, map-only.
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_extendedprice, l_quantity - l_quantity)").as("div0"),
        // unrounded: the per-row IEEE division is bit-identical across
        // engines, while round(double,4) half-ulp ties are NOT
        expr("try_divide(l_extendedprice, l_quantity)").as("unit_price"),
        expr("try_cast(l_returnflag AS INT)").as("bad_cast"),
        expr("try_cast(CAST(l_quantity AS STRING) AS DOUBLE)").as("good_cast"),
        expr("try_add(l_orderkey, l_partkey)").as("sum_ok"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // fixtures (unlike strict TPC-H) — the sf1 scale run exposed
        // tie groups of 6 — so the sort extends over ALL remaining
        // columns until only fully-identical rows can tie, making the
        // output order total in both engines. bad_cast/div0 are
        // all-NULL on today's fixtures, but including them costs
        // nothing and keeps totality even if a fixture ever carries a
        // numeric returnflag or zero quantity delta. NULLS FIRST is
        // pinned explicitly on the nullable keys: Spark defaults ASC
        // to nulls-first but DuckDB to nulls-last, and a mixed tie
        // group would otherwise diverge.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("sum_ok"),
          col("good_cast"), col("unit_price"),
          col("bad_cast").asc_nulls_first, col("div0").asc_nulls_first)
    }),

    "fn_url_parse" -> ((s, d) => {
      // URL decomposition with parse_url — the crawl-processing
      // workhorse (host for domain-level dedup/mixing, path/query for
      // canonicalization). A deterministic URL is synthesized per
      // document, then decomposed; the oracle states each expected part
      // from the SAME construction, proving parse_url inverts a
      // spec-conformant URL exactly. All parts are codegen'd per-row
      // expressions — map-only over a 100 TB scan.
      val url = concat(lit("https://"), col("source"), lit(".example.com/"),
        col("lang"), lit("/doc-"), col("doc_id").cast(StringType),
        lit("?ref="), col("source"), lit("&id="), col("doc_id").cast(StringType))
      Tables.documents(s, d).select(
        col("doc_id"), url.as("url"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("id")).as("qid"))
        .orderBy("doc_id")
    }),

    "fn_conditional" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("klass"),
        expr("nullif(c_nationkey, 5)").as("nk"),
        greatest(col("c_acctbal"), lit(0.0)).as("g"),
        least(col("c_acctbal"), lit(5000.0)).as("l"))
        .orderBy("c_custkey")
    }),

    "fn_array_explode" -> ((s, d) => {
      // Tokenize → explode: Spark's built-in Generator surface. The
      // trailing-empty-token filter matches FIXTURES.md's note.
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .orderBy("doc_id", "token")
    }),

    "fn_array_hof" -> ((s, d) => {
      // Higher-order lambdas over the 64-dim embedding, no UDF: floats
      // are cast to double inside the lambda so both engines accumulate
      // in double precision in identical list order.
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
        round(aggregate(filter(col("embedding"), x => x > lit(0.0f)),
          lit(0.0), (acc, x) => acc + x.cast(DoubleType)), 4).as("sum_pos"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)), 4).as("sumsq"))
        .orderBy("vec_id")
    }),

    "fn_map_ops" -> ((s, d) => {
      // Wikidata-style map manipulation on fixture data: per-source map
      // of language→doc-count. collect_list is task-order-dependent →
      // sort_array before map_from_entries for determinism.
      Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
        .groupBy(col("source"))
        .agg(map_from_entries(sort_array(collect_list(struct(col("lang"), col("n")))))
          .as("lang_counts"))
        .select(
          col("source"),
          size(col("lang_counts")).as("n_langs"),
          // try_element_at: under ANSI a missing map key THROWS — a
          // source partition with zero English docs would crash the
          // report, while the oracle's lookup yields NULL. NULL is the
          // honest value for "no en docs here" in both engines.
          try_element_at(col("lang_counts"), lit("en")).as("en_docs"),
          // keys are sorted by the sort_array above; serialize so the
          // driver's pandas hash gate can hash the cell.
          array_join(map_keys(col("lang_counts")), ",").as("langs"))
        .orderBy("source")
    }),

    "fn_json_extract" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy("event_id")
    }),

    "fn_json_struct" -> ((s, d) => {
      // Full parse to struct + field access + to_json round-trip.
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .withColumn("ps", from_json(col("props"), schema))
        .select(
          col("event_id"),
          col("ps.k").as("k"),
          to_json(col("ps")).as("jstr"))
        .orderBy("event_id")
    }),

    "fn_json_variant" -> ((s, d) => {
      // Spark 4 VARIANT: the open-schema path for polymorphic values
      // (Wikidata datavalue microcosm, SURVEY §1.1). Shares the
      // fn_json_extract oracle — variant extraction must agree with the
      // string-path extraction.
      Tables.events(s, d)
        .select(col("event_id"),
          expr("try_variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .orderBy("event_id")
    }),

    "fn_binary_codecs" -> ((s, d) => {
      // Binary codec surface: base64 / hex over UTF-8 bytes plus the
      // digest pair (md5 / sha-256) — the primitives behind content
      // addressing (multimodal_digest), wire encodings, and checksum
      // columns. Round-trip flags prove decode∘encode is the identity
      // on multi-byte UTF-8 (the fixture is partly Thai); all map-only
      // codegen'd expressions. Engine alignment notes: both engines
      // emit padded un-chunked base64, UPPERCASE hex, lowercase digest
      // hex; bytes are the UTF-8 encoding of the string on both sides.
      val doc = Tables.documents(s, d)
        .withColumn("pfx", substring(col("text"), 1, 24))
      doc.select(col("doc_id"),
          base64(col("pfx").cast(BinaryType)).as("b64"),
          hex(col("pfx").cast(BinaryType)).as("hx"),
          md5(col("pfx").cast(BinaryType)).as("md5"),
          sha2(col("pfx").cast(BinaryType), 256).as("sha256"),
          (decode(unbase64(base64(col("pfx").cast(BinaryType))), "UTF-8")
            === col("pfx")).as("b64_rt"),
          (decode(unhex(hex(col("pfx").cast(BinaryType))), "UTF-8")
            === col("pfx")).as("hex_rt"),
          length(col("pfx").cast(BinaryType)).as("n_bytes"),
          length(col("pfx")).as("n_chars"))
        .orderBy("doc_id")
    }),

    "fn_datetime_tz" -> ((s, d) => {
      // Timezone conversion surface: from_utc_timestamp /
      // to_utc_timestamp against FIXED-OFFSET IANA zones (Bangkok +7,
      // Kolkata +5:30 — no DST in either zone's modern history), so
      // the oracle can verify Spark's tz database with INDEPENDENT
      // pure-interval arithmetic instead of trusting a second tz
      // library (DuckDB's timestamptz rendering is session-TZ
      // dependent, which a driver-run oracle must not be). The
      // round_trip flag proves to_utc ∘ from_utc is the identity;
      // epoch seconds pin the absolute instant. Event times truncate
      // to whole seconds first (the Det.secs ns/µs rule).
      Tables.events(s, d)
        .select(col("event_id"), graft.Det.secs(col("ts")).as("t"))
        .select(col("event_id"),
          col("t").as("ts_utc"),
          from_utc_timestamp(col("t"), "Asia/Bangkok").as("bkk"),
          from_utc_timestamp(col("t"), "Asia/Kolkata").as("ist"),
          (to_utc_timestamp(
            from_utc_timestamp(col("t"), "Asia/Bangkok"), "Asia/Bangkok")
            === col("t")).as("round_trip"),
          unix_timestamp(col("t")).as("epoch_s"),
          hour(from_utc_timestamp(col("t"), "Asia/Kolkata")).as("ist_hour"))
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey,
             lower(p_name) AS lo, upper(p_name) AS up,
             substring(p_name, 1, 4) AS sub4,
             concat_ws('|', p_brand, p_type) AS cat,
             trim('  ' || p_name || '  ') AS trimmed,
             CAST(length(p_name) AS INTEGER) AS len,
             array_to_string(string_split(p_name, ' '), ',') AS toks,
             regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel
         FROM part ORDER BY p_partkey""",

    "fn_date" ->
      """SELECT d,
             CAST(year(d) AS INTEGER) AS y,
             CAST(month(d) AS INTEGER) AS m,
             CAST(day(d) AS INTEGER) AS dom,
             CAST(dayofweek(d) + 1 AS INTEGER) AS dow,
             CAST(date_trunc('month', d) AS DATE) AS mstart,
             CAST(date_diff('day', DATE '1995-01-01', d) AS INTEGER) AS days_since,
             CAST(d + INTERVAL 3 MONTH AS DATE) AS plus3m,
             last_day(d) AS eom
         FROM (SELECT DISTINCT CAST(l_shipdate AS DATE) AS d FROM lineitem)
         ORDER BY d""",

    "fn_math" ->
      """SELECT p_partkey,
             CAST(ceil(p_retailprice / 10.0) AS BIGINT) AS cl,
             CAST(floor(p_retailprice / 10.0) AS BIGINT) AS fl,
             CAST(abs(p_size - 25) AS INTEGER) AS ab,
             pow(CAST(p_size AS DOUBLE), 2.0) AS pw,
             round(ln(p_retailprice), 4) AS lnv,
             round(sqrt(p_retailprice), 4) AS sq,
             CAST(sign(p_size - 25) AS INTEGER) AS sgn,
             CAST(p_size % 7 AS INTEGER) AS pm
         FROM part ORDER BY p_partkey""",

    "fn_bitwise" ->
      """SELECT p_partkey,
             p_partkey & 255 AS band,
             p_partkey | 15 AS bor,
             xor(p_partkey, 93) AS bxor,
             p_partkey << 3 AS shl,
             p_partkey >> 2 AS shr,
             CAST(bit_count(p_partkey) AS INTEGER) AS nbits
         FROM part ORDER BY p_partkey""",

    "fn_regexp" ->
      """SELECT c_custkey,
             regexp_extract(c_name, '([0-9]+)$', 1) AS id_digits,
             regexp_matches(c_name, '^Customer#[0-9]{6,}$') AS well_formed,
             regexp_replace(c_name, '[0-9]{6,}', '<ID>', 'g') AS masked,
             array_to_string(regexp_extract_all(c_name, '[0-9]+', 0), ',')
               AS digit_runs,
             CAST(len(regexp_extract_all(c_name, '[0-9]', 0)) AS INTEGER)
               AS n_digits
         FROM customer ORDER BY c_custkey""",

    // DuckDB's x/0 → NULL agrees with try_divide by definition; the
    // round-trip cast lands on the same IEEE double in both engines
    "fn_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
             l_extendedprice / (l_quantity - l_quantity) AS div0,
             l_extendedprice / l_quantity AS unit_price,
             try_cast(l_returnflag AS INTEGER) AS bad_cast,
             try_cast(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS good_cast,
             l_orderkey + l_partkey AS sum_ok
         FROM lineitem ORDER BY l_orderkey, l_linenumber, sum_ok,
           good_cast, unit_price, bad_cast ASC NULLS FIRST,
           div0 ASC NULLS FIRST""",

    // each part is restated from the construction itself — the oracle
    // is "what a correct URL parser must recover from these pieces"
    "fn_url_parse" ->
      """SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc-' || doc_id
               || '?ref=' || source || '&id=' || doc_id AS url,
             source || '.example.com' AS host,
             '/' || lang || '/doc-' || doc_id AS path,
             'ref=' || source || '&id=' || doc_id AS query,
             CAST(doc_id AS VARCHAR) AS qid
         FROM documents ORDER BY doc_id""",

    "fn_conditional" ->
      """SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 3000 THEN 'low'
                  WHEN c_acctbal < 7000 THEN 'mid'
                  ELSE 'high' END AS klass,
             nullif(c_nationkey, 5) AS nk,
             greatest(c_acctbal, 0.0) AS g,
             least(c_acctbal, 5000.0) AS l
         FROM customer ORDER BY c_custkey""",

    "fn_array_explode" ->
      """SELECT doc_id, token FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents)
         WHERE token <> '' ORDER BY doc_id, token""",

    "fn_array_hof" ->
      """SELECT vec_id,
             CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
             round(coalesce(list_aggregate(
               list_transform(list_filter(embedding, x -> x > 0),
                              x -> CAST(x AS DOUBLE)), 'sum'), 0.0), 4) AS sum_pos,
             round(list_aggregate(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum'), 4) AS sumsq
         FROM embeddings ORDER BY vec_id""",

    // DuckDB has no Spark-map equivalent, but every OUTPUT column of the
    // map query is relational: count, lookup, sorted key list.
    "fn_map_ops" ->
      """WITH lc AS (SELECT source, lang, count(*) AS n
                     FROM documents GROUP BY 1, 2)
         SELECT source, CAST(count(*) AS INTEGER) AS n_langs,
                CAST(max(CASE WHEN lang = 'en' THEN n END) AS BIGINT) AS en_docs,
                array_to_string(list(lang ORDER BY lang), ',') AS langs
         FROM lc GROUP BY source ORDER BY source""",

    "fn_json_extract" ->
      """SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events ORDER BY event_id""",

    "fn_json_struct" ->
      """SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             coalesce('{"k":' || json_extract_string(props, '$.k') || '}', '{}') AS jstr
         FROM events ORDER BY event_id""",

    "fn_json_variant" ->
      """SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events ORDER BY event_id""",

    "fn_binary_codecs" ->
      """SELECT doc_id,
             base64(encode(pfx)) AS b64,
             hex(encode(pfx)) AS hx,
             md5(pfx) AS md5,
             sha256(pfx) AS sha256,
             decode(from_base64(base64(encode(pfx)))) = pfx AS b64_rt,
             decode(from_hex(hex(encode(pfx)))) = pfx AS hex_rt,
             CAST(octet_length(encode(pfx)) AS INTEGER) AS n_bytes,
             CAST(length(pfx) AS INTEGER) AS n_chars
         FROM (SELECT doc_id, substring(text, 1, 24) AS pfx FROM documents)
         ORDER BY doc_id""",

    // Independent arithmetic replay: the fixed zone offsets as plain
    // INTERVAL adds, epoch via epoch(), round_trip true by identity.
    "fn_datetime_tz" ->
      """SELECT event_id,
             t AS ts_utc,
             t + INTERVAL 7 HOUR AS bkk,
             t + INTERVAL 330 MINUTE AS ist,
             TRUE AS round_trip,
             CAST(epoch(t) AS BIGINT) AS epoch_s,
             CAST(hour(t + INTERVAL 330 MINUTE) AS INTEGER)
               AS ist_hour
         FROM (SELECT event_id, date_trunc('second', ts) AS t FROM events)
         ORDER BY event_id"""
  )
}
