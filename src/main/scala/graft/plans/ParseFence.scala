package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that FENCES the optimizer's predicate pushdown
  * at an expensive projection (round-17 verdict 2).
  *
  * The problem it solves: `Project(from_json(value) AS e)` under a
  * later `Filter(e.redirect IS NULL)` gets rewritten by
  * `PushDownPredicates` into a filter BELOW the projection whose
  * condition re-parses the line (`from_json(value, pruned).redirect`)
  * — Catalyst has no cross-operator common-subexpression elimination,
  * so every array-dump line was tokenized TWICE (measured ~1.9× the
  * native NDJSON scan end-to-end, SCALE.md round-16/17). Wrapping the
  * parse in this no-op marks the projection non-deterministic, which
  * `PushPredicateThroughNonJoin` and `CollapseProject` both refuse to
  * rewrite across — the filter stays ABOVE the projection, referencing
  * the parsed struct attribute, and each line parses ONCE.
  *
  * Cost: zero. `doGenCode` returns the child's generated code verbatim
  * (the `KnownNotNull` tagging-expression pattern), so whole-stage
  * codegen emits the identical parse loop; interpreted eval delegates.
  * The "non-determinism" is a plan-level fiction — the child must
  * itself be deterministic, making fenced plans safe under task retry
  * (pinned by a WdArraySpec kill-parity run and the existing cluster
  * gates). Trade-off, by design: predicates genuinely worth pushing
  * below the parse (none exist — the wrapper filter is built below it)
  * and nested-schema pruning are forfeited; a dump is read once.
  */
case class ParseFence(child: Expression) extends UnaryExpression {
  require(child.deterministic,
    "ParseFence is a pushdown fence for deterministic expressions only")

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "parse_fence"

  /** The fence itself: never substituted into pushed-down predicates,
    * never duplicated by project collapse. */
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): ParseFence =
    copy(child = newChild)
}

object ParseFence {
  /** Column-API entry: `fence(from_json(...))`. */
  def fence(c: Column): Column =
    GraftSqlBridge.column(ParseFence(GraftSqlBridge.expr(c)))
}
