package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: collects the k largest (score, id) pairs
  * per group in O(k) memory, merged map-side.
  *
  * This is the 100 TB replacement for the `row_number() OVER (ORDER BY
  * score DESC) <= k` pattern: the window version shuffles and sorts EVERY
  * candidate row per group; this aggregate ships at most k pairs per
  * partition per group through the shuffle (partial aggregation), never
  * sorts more than 2k elements at a time, and needs no per-group sort
  * buffer. Ordering matches the window version exactly: score descending,
  * id ascending as tie-break — so the two plans are result-identical and
  * can share a DuckDB oracle.
  *
  * Result type: array<struct<id:long, score:double, rnk:int>> — explode to
  * rows with `posexplode`/`inline`.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // "keep" ordering: greater = better = higher score, then smaller id
  private val keep: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)
  // PriorityQueue dequeues its maximum → order by keep.reverse so the head
  // is the WORST retained entry (the eviction candidate)
  private val heapOrd: Ordering[(Double, Long)] = keep.reverse

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("id", LongType).add("score", DoubleType).add("rnk", IntegerType))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val e = (s.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(e)
      else if (keep.gt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { e =>
      if (a.size < k) a.enqueue(e)
      else if (keep.gt(e, a.head)) { a.dequeue(); a.enqueue(e) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.zipWithIndex.map { case ((s, i), r) =>
      InternalRow(i, s, r + 1)
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "top_k_by_score"
}

object TopKAggregate {
  /** `top_k_by_score(score, id, k)` as a Column aggregate. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftShims.column(
      TopKByScore(GraftShims.expression(score), GraftShims.expression(id), k)
        .toAggregateExpression())
}
