package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving summary (Metwally et al. 2005) with the mergeable-summaries
  * combine rule (Agarwal et al., PODS'12): at most `capacity` tracked
  * items, each carrying an overestimated count and the overestimate bound.
  *
  * Invariants, maintained by both the streaming update and the merge:
  *  - `count ≥ true frequency ≥ count − err` for every tracked item;
  *  - any item whose true frequency exceeds N/capacity is tracked
  *    (N = total updates absorbed, across every merged partial).
  *
  * When `capacity` is never exhausted (distinct items ≤ capacity on every
  * partial AND on every merge union), no eviction ever happens, `err`
  * stays 0, and the summary is EXACT and partition-order-independent —
  * the regime the oracle-checked query runs in. Below capacity the error
  * terms make the result partition-dependent at the tail, which is the
  * documented price of bounded state (the bounds themselves always hold).
  */
final class SpaceSavingBuffer(val capacity: Int) {
  private[expressions] final class Entry(var count: Long, var err: Long)

  private val map = new java.util.HashMap[String, Entry]()

  // count → lex-sorted items at that count: incremental min tracking so
  // the saturated regime never rescans the map per eviction (O(n·capacity)
  // otherwise). Built LAZILY on first saturation — the exact regime
  // (distinct ≤ capacity, the oracle-checked path) never pays for it and
  // keeps O(1) adds.
  private var byCount: java.util.TreeMap[java.lang.Long, java.util.TreeSet[String]] = null

  private def ensureTracking(): Unit = if (byCount == null) {
    byCount = new java.util.TreeMap[java.lang.Long, java.util.TreeSet[String]]()
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      bucketAdd(en.getValue.count, en.getKey)
    }
  }
  private def bucketAdd(c: Long, item: String): Unit =
    byCount.computeIfAbsent(c, _ => new java.util.TreeSet[String]()).add(item)
  private def bucketRemove(c: Long, item: String): Unit = {
    val s = byCount.get(c)
    s.remove(item)
    if (s.isEmpty) byCount.remove(c)
  }
  private def setCount(item: String, e: Entry, nc: Long): Unit = {
    if (byCount != null) {
      bucketRemove(e.count, item)
      bucketAdd(nc, item)
    }
    e.count = nc
  }
  private def putEntry(item: String, e: Entry): Unit = {
    val prev = map.put(item, e)
    if (byCount != null) {
      if (prev != null) bucketRemove(prev.count, item)
      bucketAdd(e.count, item)
    }
  }
  private def removeEntry(item: String): Unit = {
    val prev = map.remove(item)
    if (prev != null && byCount != null) bucketRemove(prev.count, item)
  }

  def size: Int = map.size()

  private def minCount: Long = { ensureTracking(); byCount.firstKey }

  /** Min count if full (the per-item uncertainty a merge must add for
    * items this summary is not tracking), else 0 (nothing was dropped).
    */
  def floorCount: Long = if (map.size() >= capacity) minCount else 0L

  def add(item: String): Unit = {
    val e = map.get(item)
    if (e != null) setCount(item, e, e.count + 1)
    else if (map.size() < capacity) putEntry(item, new Entry(1L, 0L))
    else {
      // evict a min-count item; among ties the lexicographically largest
      // goes (the final ordering prefers smaller items, keep them)
      ensureTracking()
      val vCount: Long = byCount.firstKey
      val victim = byCount.firstEntry().getValue.last()
      removeEntry(victim)
      putEntry(item, new Entry(vCount + 1L, vCount))
    }
  }

  def merge(other: SpaceSavingBuffer): Unit = {
    val aFloor = floorCount
    val bFloor = other.floorCount
    // A-only items may have occurred up to bFloor times untracked in B
    if (bFloor > 0) {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        if (!other.map.containsKey(en.getKey)) {
          setCount(en.getKey, en.getValue, en.getValue.count + bFloor)
          en.getValue.err += bFloor
        }
      }
    }
    // B items: combine counts for common, adopt (+ aFloor) for B-only
    val ot = other.map.entrySet().iterator()
    while (ot.hasNext) {
      val en = ot.next()
      val mine = map.get(en.getKey)
      if (mine != null) {
        setCount(en.getKey, mine, mine.count + en.getValue.count)
        mine.err += en.getValue.err
      } else {
        putEntry(en.getKey,
          new Entry(en.getValue.count + aFloor, en.getValue.err + aFloor))
      }
    }
    // reduce the union back to capacity: keep the largest counts, ties by
    // item asc (the kept side of the final emission order) — i.e. drop
    // from the min-count bucket, lex-largest first, exactly what the
    // incremental index hands out
    if (map.size() > capacity) {
      ensureTracking()
      while (map.size() > capacity) {
        removeEntry(byCount.firstEntry().getValue.last())
      }
    }
  }

  def rawAdd(item: String, count: Long, err: Long): Unit =
    putEntry(item, new Entry(count, err))

  def entries: Seq[(String, Long, Long)] = {
    val b = Seq.newBuilder[(String, Long, Long)]
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      b += ((en.getKey, en.getValue.count, en.getValue.err))
    }
    b.result()
  }
}

/** `approx_top_items(item, k, capacity)` — mergeable heavy-hitters
  * aggregate: the k most frequent string items per group, tracked in at
  * most `capacity` counters per aggregation buffer however many distinct
  * items flow through.
  *
  * The scale story: exact term frequency at 100 TB means shuffling the
  * FULL distinct vocabulary through a hash aggregate before any top-k cut
  * (`vocabTopK`'s plan — correct, but the exchange carries every
  * long-tail hapax). This aggregate ships at most `capacity` counters per
  * map partition, with map-side partial merge, and guarantees every item
  * with true frequency > N/capacity survives with
  * `count ≥ true ≥ count − err = lb`. Spark has no builtin for this
  * (`approx_count_distinct` sketches cardinality, not membership).
  *
  * Returns `array<struct<token string, cnt long, lb long>>` sorted
  * (cnt desc, token asc), truncated to k — explode to ranked rows. Null
  * items are skipped. With `capacity` ≥ the distinct-item count the
  * result is exact (`lb = cnt`) and deterministic under any partitioning
  * (`ApproxTopItemsSpec` pins both regimes).
  */
case class ApproxTopItems(
    item: Expression, kExpr: Expression, capExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  private lazy val k: Int = {
    require(kExpr.foldable, "approx_top_items: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"approx_top_items: k must be positive, got $v")
    v
  }
  private lazy val capacity: Int = {
    require(capExpr.foldable, "approx_top_items: capacity must be a literal")
    val v = capExpr.eval().asInstanceOf[Int]
    require(v >= k,
      s"approx_top_items: capacity $v must be >= k $k")
    v
  }

  override def children: Seq[Expression] = Seq(item, kExpr, capExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = item.dataType == StringType &&
      kExpr.dataType == IntegerType && capExpr.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"approx_top_items expects (string, int, int), got " +
        s"(${item.dataType.simpleString}, ${kExpr.dataType.simpleString}, " +
        s"${capExpr.dataType.simpleString})")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("lb", LongType, nullable = false))))
  override def prettyName: String = "approx_top_items"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = item.eval(input)
    // UTF8String backing bytes may be row-buffer-reused: detach to String
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any =
    new GenericArrayData(buffer.entries
      .sortBy { case (s, c, _) => (-c, s) }
      .take(k)
      .map { case (s, c, e) =>
        InternalRow(UTF8String.fromString(s), c, c - e)
      }.toArray[Any])

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buffer.entries
    out.writeInt(es.length)
    es.foreach { case (s, c, e) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
      out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SpaceSavingBuffer(capacity)
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.rawAdd(s, in.readLong(), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopItems =
    copy(item = newChildren(0), kExpr = newChildren(1), capExpr = newChildren(2))
}
