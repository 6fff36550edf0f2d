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
