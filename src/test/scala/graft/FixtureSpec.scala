package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire (round-6 ADVICE item 4).
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed physical types under the code once (round 5:
  * `events.ts` went parquet TIMESTAMP(NANOS) → timestamp[us], breaking
  * 40 keys at analysis time with zero test pointing at the cause).
  * This suite pins the schema of all 10 fixture tables to the types
  * documented in FIXTURES.md, so the next silent regeneration fails ONE
  * named test here instead of scattering analysis errors across suites.
  *
  * Timestamp columns accept any timestamp width (ms/us, TZ or NTZ) —
  * and for `events.ts` also raw Long (the legacy nanos-as-long read) —
  * because those representations are all value-preserving for our
  * whole-second comparisons and `Tables.events` adapts to each.
  * Schema-only reads: just parquet footers, no data scan.
  */
class FixtureSpec extends AnyFunSuite {
  lazy val spark = {
    val s = Spec.spark
    // Pin the legacy-nanos conf up front: the raw Tables.table schema
    // read below must SUCCEED on NANOS fixtures so the named `ts_or_long`
    // assertion fires — without this, the conf is only set once some
    // earlier suite happens to call Tables.events in the shared session,
    // and a fresh run would die with PARQUET_TYPE_ILLEGAL instead.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  // kind → acceptable Spark types
  private def ok(kind: String, dt: DataType): Boolean = kind match {
    case "int"    => dt == IntegerType
    case "long"   => dt == LongType
    case "double" => dt == DoubleType
    case "string" => dt == StringType
    case "ts"     => dt == TimestampType || dt == TimestampNTZType
    case "ts_or_long" =>
      dt == TimestampType || dt == TimestampNTZType || dt == LongType
    case "floats" => dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "supplier" -> Seq("s_suppkey" -> "long", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "customer" -> Seq("c_custkey" -> "long", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "part" -> Seq("p_partkey" -> "long", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "long", "o_custkey" -> "long",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "ts", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "long", "l_partkey" -> "long",
      "l_suppkey" -> "long", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "ts"),
    "events" -> Seq("event_id" -> "long", "ts" -> "ts_or_long",
      "user_id" -> "long", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "long", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "long"),
    "embeddings" -> Seq("vec_id" -> "long", "embedding" -> "floats",
      "label" -> "int"))

  for (sf <- Seq(Spec.sf001, Spec.sf01); t <- Tables.names) {
    test(s"$t schema matches FIXTURES.md at $sf") {
      val schema = Tables.table(spark, sf, t).schema
      val exp = expected(t)
      assert(schema.fieldNames.toSeq === exp.map(_._1),
        s"$t column names drifted")
      exp.foreach { case (name, kind) =>
        val dt = schema(name).dataType
        assert(ok(kind, dt), s"$t.$name: $dt not acceptable as $kind")
      }
    }
  }

  test("Tables.events surfaces a TimestampType ts at every SF") {
    for (sf <- Seq(Spec.sf001, Spec.sf01)) {
      val dt = Tables.events(spark, sf).schema("ts").dataType
      assert(dt === TimestampType, s"events.ts at $sf: $dt")
    }
  }

  test("embedding arrays are uniform 64-length at every SF") {
    // The dot_f/l2fx kernels fail fast on ragged arrays; this tripwire
    // catches a regenerated fixture with a different dimensionality
    // before those runtime errors scatter across the sim/dedup keys.
    import org.apache.spark.sql.functions.{col, size}
    for (sf <- Seq(Spec.sf001, Spec.sf01)) {
      val lens = Tables.embeddings(spark, sf)
        .select(size(col("embedding")).as("n")).distinct()
        .collect().map(_.getInt(0)).toSeq
      assert(lens === Seq(64), s"$sf embedding lengths: $lens")
    }
  }
}
