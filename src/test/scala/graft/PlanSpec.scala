package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions (the 100 TB checklist, SURVEY.md §4):
  * filters reach the parquet scan, projections prune columns, the right
  * join strategies get picked, top-k never globally sorts. These lock
  * the plans we want — a regression here is a scale bug even when
  * results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = Spec.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Spec.sf001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan("filter_pred")
    assert(p.contains("PushedFilters:") && p.contains("p_retailprice"), p.take(2000))
  }

  test("scan_parquet prunes to the two referenced columns") {
    val p = plan("scan_parquet")
    assert(p.contains("l_quantity") && p.contains("l_orderkey"))
    assert(!p.contains("l_extendedprice"), "scan reads unused columns")
  }

  test("join_broadcast is a BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_sortmerge pins SortMergeJoin") {
    assert(plan("join_sortmerge").contains("SortMergeJoin"))
  }

  test("join_shuffled_hash pins ShuffledHashJoin") {
    assert(plan("join_shuffled_hash").contains("ShuffledHashJoin"))
  }

  test("join_theta_nestedloop is a (bounded) BroadcastNestedLoopJoin") {
    assert(plan("join_theta_nestedloop").contains("BroadcastNestedLoopJoin"))
  }

  test("limit_topk is TakeOrderedAndProject, not global sort") {
    val p = plan("limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("agg_groupby_pricing has partial+final HashAggregate around one shuffle") {
    val p = plan("agg_groupby_pricing")
    assert("HashAggregate".r.findAllIn(p).length >= 2)
    assert(p.contains("Exchange"))
  }

  test("whole-stage codegen covers the Q1 pipeline") {
    // run first so AQE finalizes, then look for `*(n)` codegen markers
    val df = SparkEntry.queries("agg_groupby_pricing")(spark, Spec.sf001)
    df.collect() // count() would plan a separate query; collect runs THIS plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p.take(1500))
  }

  test("dot_f expression participates in codegen (no CodegenFallback wrapper)") {
    import spark.implicits._
    graft.functions.DotProductF.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").selectExpr("dot_f(a, b) AS d")
    assert(df.head().getDouble(0) === 32.0)
    // interpreted path agrees with codegen path
    val hof = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d")
    assert(hof.head().getDouble(0) === 32.0)
    // null safety
    val n = Seq((null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("a", "b").selectExpr("dot_f(a, b) AS d")
    assert(n.head().isNullAt(0))
  }
}
