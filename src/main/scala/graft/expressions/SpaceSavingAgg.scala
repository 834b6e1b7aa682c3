package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally/Agrawal/El Abbadi '05):
  * at most `capacity` (item → count, maxError) slots; an unseen item
  * arriving at a full summary evicts the minimum-count slot and
  * inherits its count as error bound.
  *
  * Guarantees: estimated count ∈ [true, true + maxError]; every item
  * with true frequency > N/capacity is present. When the distinct
  * count never exceeds `capacity`, all errors are 0 and counts are
  * EXACT — which is what the oracle checks (the approximate regime is
  * covered by property bounds in the spec).
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val counts = new mutable.HashMap[String, (Long, Long)]() // item -> (count, maxError)

  // (count, item) ordered mirror of `counts`: O(log capacity) min
  // lookup and eviction. Once the summary fills on a heavy-tailed
  // stream, MOST arrivals are unseen tail items hitting the eviction
  // path — an O(capacity) minBy scan there makes every such row pay
  // `capacity` traversals; the classic stream-summary keeps eviction
  // constant-ish, and a tree index is the simple mergeable-map-friendly
  // equivalent. Eviction order (count asc, item asc) is unchanged.
  private val index = new mutable.TreeSet[(Long, String)]()

  /** Rebuild the index after an external bulk fill of `counts`
    * (deserialize) — the two structures must always agree.
    */
  def reindex(): Unit = {
    index.clear()
    counts.foreach { case (i, (c, _)) => index.add((c, i)) }
  }

  /** Upper bound on the true count of any item ABSENT from this
    * summary: 0 until the summary fills, then its minimum counter
    * (every absent item was either never seen or evicted at ≤ floor).
    */
  def floor: Long =
    if (counts.size < capacity) 0L
    else index.head._1

  def add(item: String, inc: Long = 1L): Unit =
    counts.get(item) match {
      case Some((c, e)) =>
        counts.update(item, (c + inc, e))
        index.remove((c, item))
        index.add((c + inc, item))
      case None if counts.size < capacity =>
        counts.update(item, (inc, 0L))
        index.add((inc, item))
      case None =>
        // evict the min-count slot (deterministic: min by (count, item));
        // the newcomer inherits its count as the error bound
        val (minC, minItem) = index.head
        index.remove((minC, minItem))
        counts.remove(minItem)
        counts.update(item, (minC + inc, minC))
        index.add((minC + inc, item))
    }

  /** Mergeable-summaries form (Agarwal et al. '12): an item present in
    * only one side gets the OTHER side's floor added as both count and
    * error — its mass there is unknown but bounded by that floor. This
    * preserves both bounds across any merge tree:
    *   estimate ≥ true ≥ estimate − max_err.
    * Truncation back to `capacity` keeps the top counts, so the
    * resulting summary's floor still bounds everything dropped.
    */
  def merge(other: SpaceSavingBuffer): Unit = {
    val fThis = floor
    val fOther = other.floor
    val merged = new mutable.HashMap[String, (Long, Long)]()
    (counts.keySet ++ other.counts.keySet).foreach { item =>
      val (cA, eA) = counts.getOrElse(item, (fThis, fThis))
      val (cB, eB) = other.counts.getOrElse(item, (fOther, fOther))
      merged.update(item, (cA + cB, eA + eB))
    }
    counts.clear()
    merged.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(capacity)
      .foreach { case (i, ce) => counts.update(i, ce) }
    reindex()
  }
}

/** `space_saving_topk(item, k, capacity)`: bounded-memory heavy
  * hitters as a first-class Catalyst aggregate — partial buffers are
  * built map-side, merged across partitions, and only `capacity`
  * slots ever shuffle, vs. the exact groupBy's one row per DISTINCT
  * key. At 100 TB vocabulary scale that is the difference between a
  * bounded summary and a billions-row shuffle.
  *
  * Returns array<struct<item string, cnt long, max_err long>> of the
  * top `k` by (cnt desc, item asc).
  */
case class SpaceSavingAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[SpaceSavingBuffer] {

  override def prettyName: String = "space_saving_topk"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("item", StringType),
        StructField("cnt", LongType),
        StructField("max_err", LongType)
      )
    ),
    containsNull = false
  )

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val top = buffer.counts.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(k)
      .map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (i, (c, e)) =>
      // NOT writeUTF: its modified-UTF-8 form caps at 65535 bytes and
      // throws on longer items — this aggregate runs over arbitrary
      // string columns (documents, URLs), so length-prefix raw UTF-8.
      val bytes = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
      out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val i = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong()
      val e = in.readLong()
      buf.counts.update(i, (c, e))
    }
    buf.reindex()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {
  def topk(item: Column, k: Int, capacity: Int): Column =
    GraftSqlBridge.column(
      SpaceSavingAgg(GraftSqlBridge.expression(item), k, capacity).toAggregateExpression()
    )
}
