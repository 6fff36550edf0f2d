package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k-by-order aggregate (`topk_by(ord, payload, k)`) as a
  * native mergeable Catalyst aggregate — the scale alternative to the
  * rank-window idiom for per-group top-k.
  *
  * The window plan (win_topk_per_group) must shuffle and sort EVERY row
  * of a group to rank them, then discard all but k; this aggregate
  * keeps a k-bounded heap per group that partial-aggregates map-side,
  * so only ≤ k rows per group per partition ever cross the shuffle —
  * at 100 TB the shuffle volume drops from O(rows) to O(k · groups ·
  * partitions). Merging bounded heaps is associative and, with a
  * TOTALLY ordered `ord` (callers add a unique tiebreak), the result is
  * exactly the global top-k regardless of partitioning — which is what
  * lets win_topk_native share the window idiom's oracle.
  *
  * `ord` may be any orderable type (structs give multi-key order);
  * entries serialize as UnsafeRow bytes at shuffle boundaries only.
  */
case class TopKByAgg(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  override def prettyName: String = "topk_by"
  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false

  private def entryType = StructType(Seq(
    StructField("ord", ord.dataType), StructField("payload", payload.dataType)))

  override def dataType: DataType = ArrayType(entryType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be > 0")
    else TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)

  @transient private lazy val ordering: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(TypeUtils.getInterpretedOrdering(ord.dataType))
  // min-heap (reverse of "largest first"): the root is the WEAKEST of
  // the k kept entries and is evicted when something larger arrives
  @transient private lazy val minFirst: Ordering[(Any, Any)] = ordering.reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty(minFirst)

  private def offer(buf: mutable.PriorityQueue[(Any, Any)], e: (Any, Any)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (ordering.gt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

  override def update(buf: mutable.PriorityQueue[(Any, Any)],
      input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val o = ord.eval(input)
    if (o != null) {
      // copy: eval results may alias reused unsafe-row buffers
      val oc = InternalRow.copyValue(o)
      val pc = InternalRow.copyValue(payload.eval(input))
      offer(buf, (oc, pc))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Any, Any)],
      other: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Any, Any)]): Any = {
    val sorted = buf.toArray.sorted(ordering.reverse) // largest first
    new GenericArrayData(sorted.map { case (o, p) =>
      new GenericInternalRow(Array[Any](o, p)): Any
    })
  }

  @transient private lazy val entryProj = UnsafeProjection.create(entryType)

  override def serialize(buf: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, p) =>
      val bytes = entryProj(new GenericInternalRow(Array[Any](o, p))).getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      buf.enqueue((
        InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, payload.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(ord = newChildren(0), payload = newChildren(1))
}

object TopKByAgg {
  /** `topk_by(ord, payload, k)` — k must be a positive integer literal. */
  def build(exprs: Seq[Expression]): Expression = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"topk_by(ord, payload, k): $msg"))
    if (exprs.length != 3) fail(s"expects 3 arguments, got ${exprs.length}")
    val k = exprs(2) match {
      case Literal(v: Int, IntegerType) if v > 0 => v
      case _ => fail("k must be a positive integer literal")
    }
    TopKByAgg(exprs(0), exprs(1), k).toAggregateExpression()
  }

  /** Register `topk_by` for SQL / expr() use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by", build, "built-in")
}
