package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: the scored candidates of one group are
  * reduced to the k best (score desc, id asc) entries.
  *
  * Mutable min-heap keyed by "badness": the head is the worst kept entry,
  * so an incoming candidate costs O(1) when it doesn't qualify and
  * O(log k) when it does.
  */
final class TopKBuffer(val k: Int) {
  // head = max by this ordering = lowest score, ties by highest id = worst
  private val heap =
    mutable.PriorityQueue.empty[(Double, Long)](Ordering.by(t => (-t._1, t._2)))

  def add(score: Double, id: Long): Unit = {
    if (score.isNaN) return
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wi) = heap.head
      if (score > ws || (score == ws && id < wi)) {
        heap.dequeue()
        heap.enqueue((score, id))
      }
    }
  }

  def merge(other: TopKBuffer): Unit = other.entries.foreach { case (s, i) => add(s, i) }

  def entries: Seq[(Double, Long)] = heap.toSeq

  /** (score desc, id asc) — the emission order of the top-k rows. */
  def sortedBestFirst: Seq[(Double, Long)] =
    entries.sortBy { case (s, i) => (-s, i) }
}

/** `topk_by_score(score, id, k)` — per-group top-k as a
  * TypedImperativeAggregate (partial top-k heap per map task + final
  * merge), the scale-safe replacement for the
  * `row_number() OVER (PARTITION BY group ORDER BY score DESC)` top-k:
  * the window funnels every scored candidate of a group through ONE task,
  * while this aggregate ships at most k entries per map partition per
  * group through the shuffle and never materializes a group on a single
  * reducer.
  *
  * Returns `array<struct<neighbor_id: long, cosine: double>>` sorted
  * (score desc, id asc) — explode to get ranked rows. Null scores and ids
  * are skipped (a null cosine is a zero-norm vector — it can never be a
  * nearest neighbour).
  */
case class TopKByScore(
    score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = {
    require(kExpr.foldable, "topk_by_score: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"topk_by_score: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = score.dataType == DoubleType && id.dataType == LongType &&
      kExpr.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_score expects (double, bigint, int), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString}, " +
        s"${kExpr.dataType.simpleString})")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))))
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { case (s, i) =>
      InternalRow(i, s)
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val es = buffer.entries
    val bb = ByteBuffer.allocate(4 + es.length * 16)
    bb.putInt(es.length)
    es.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble
      val i = bb.getLong
      b.add(s, i)
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
