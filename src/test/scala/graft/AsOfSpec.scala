package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOf

/** Edge semantics of the native as-of join (graft.plans.AsOfJoin):
  * no-match nulls, boundary equality, tie-breaking, key isolation —
  * on hand-crafted rows where every case is visible.
  */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def run(lefts: Seq[(Long, Long, Long)], rights: Seq[(Long, Long, Long)]) = {
    val l = lefts.toDF("k", "lid", "lt")
    val r = rights.toDF("rk", "rid", "rt")
    AsOf.join(l, r, l("k"), r("rk"), l("lt"), r("rt"), r("rid"))
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
  }

  test("boundary, tie, no-match and key-isolation semantics") {
    val out = run(
      lefts = Seq(
        (1L, 100L, 50L),  // before any right row for key 1 → null
        (1L, 101L, 100L), // exactly equal time → matches (<=)
        (1L, 102L, 150L), // between rights → earlier right
        (1L, 103L, 300L), // after all → last right, tie broken by max rid
        (2L, 200L, 999L), // key with no right rows at all → null
        (3L, 300L, 10L)), // right rows exist only for other keys → null
      rights = Seq(
        (1L, 10L, 100L),
        (1L, 11L, 200L), (1L, 12L, 200L), // tie at t=200: rid 12 wins
        (4L, 40L, 5L)))
    assert(out === Map(100L -> -1L, 101L -> 10L, 102L -> 10L,
      103L -> 12L, 200L -> -1L, 300L -> -1L))
  }

  test("null keys/times never match (SQL join semantics, not key-0)") {
    import org.apache.spark.sql.types._
    val lSchema = StructType(Seq(StructField("k", LongType, nullable = true),
      StructField("lid", LongType), StructField("lt", LongType, nullable = true)))
    val rSchema = StructType(Seq(StructField("rk", LongType, nullable = true),
      StructField("rid", LongType), StructField("rt", LongType, nullable = true)))
    import org.apache.spark.sql.Row
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(null, 100L, 50L),      // null key → null match, NOT key-0's rows
        Row(0L, 101L, null),       // null time → null match
        Row(0L, 102L, 50L))),      // real key-0 probe → matches rid 10
      lSchema)
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, 10L, 10L),         // legitimate key-0 right row
        Row(null, 11L, 5L),        // null-keyed right row: never a candidate
        Row(0L, 12L, null))),      // null-timed right row: never a candidate
      rSchema)
    val out = AsOf.join(l, r, l("k"), r("rk"), l("lt"), r("rt"), r("rid"))
      .select(col("lid"), col("rid"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(out === Map(100L -> -1L, 101L -> -1L, 102L -> 10L))
  }

  test("agrees with the window idiom on fixture data") {
    val native = SparkEntry.queries("join_asof_native")(spark, Spec.sf001).collect()
    val idiom = SparkEntry.queries("join_asof")(spark, Spec.sf001).collect()
    assert(native.map(_.toString).toSeq === idiom.map(_.toString).toSeq)
  }

  test("physical plan uses AsOfJoinExec with co-partitioned sorted inputs") {
    val df = SparkEntry.queries("join_asof_native")(spark, Spec.sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p.take(1500)) // node prints without Exec
    assert(p.contains("Sort ") && p.contains("Exchange hashpartitioning"))
  }
}
