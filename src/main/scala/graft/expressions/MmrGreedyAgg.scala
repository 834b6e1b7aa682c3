package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One candidate of a query's MMR pool. */
final case class MmrCand(nid: Long, emb: Array[Double], rel: Double)

/** `mmr_greedy(nid, nemb, rel, k)` — the Carbonell/Goldstein greedy MMR
  * selection as ONE Catalyst aggregate (round-15 optimization).
  *
  * The DataFrame form of the greedy (k−1 rounds of join + windowed
  * argmax, each round's selection locally checkpointed so the next
  * round can re-read it without a 3^k plan blowup) schedules ~3 jobs
  * per selection step; per-query pools are BOUNDED (the retrieval
  * shortlist, ≤ tens of rows), so the whole selection is a per-group
  * pure function — exactly what a typed aggregate expresses: partial
  * buffers collect each query's pool map-side, merge concatenates,
  * and eval runs the greedy in-memory. One aggregation job replaces
  * the step loop; a million concurrent queries still distribute by
  * qid with nothing on the driver (the [[SpaceSavingAgg]] posture).
  *
  * Arithmetic parity with the frame form (MmrGreedySpec pins byte
  * equality): cosines fold sequentially in dimension order from 0.0
  * (the shared `dot` kernel order), `max` over selected sims and the
  * argmax comparisons use Spark's double ordering
  * (`java.lang.Double.compare` — NaN greatest, -0 < 0), ties break to
  * the LOWER nid, and the combine is literally
  * `lambda·rel − (1−lambda as written)·maxsim` on identical operands.
  *
  * Returns array<struct<step int, nid long, rel double, score double>>
  * in selection order (size ≤ min(k, pool)).
  */
case class MmrGreedyAgg(
    nid: Expression,
    nemb: Expression,
    rel: Expression,
    k: Int,
    lambdaRel: Double,
    lambdaSim: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[ArrayBuffer[MmrCand]] {

  override def prettyName: String = "mmr_greedy"
  override def children: Seq[Expression] = Seq(nid, nemb, rel)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("step", IntegerType),
        StructField("nid", LongType),
        StructField("rel", DoubleType),
        StructField("score", DoubleType)
      )
    ),
    containsNull = false
  )

  override def createAggregationBuffer(): ArrayBuffer[MmrCand] = new ArrayBuffer[MmrCand]()

  override def update(buffer: ArrayBuffer[MmrCand], input: InternalRow): ArrayBuffer[MmrCand] = {
    val n = nid.eval(input)
    val e = nemb.eval(input)
    val r = rel.eval(input)
    if (n != null && e != null && r != null) {
      val arr = e.asInstanceOf[ArrayData].toDoubleArray()
      buffer += MmrCand(n.asInstanceOf[Long], arr, r.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(
      buffer: ArrayBuffer[MmrCand],
      other: ArrayBuffer[MmrCand]): ArrayBuffer[MmrCand] = {
    buffer ++= other
    buffer
  }

  /** Sequential dimension-order dot fold from 0.0 — the exact IEEE op
    * sequence of the shared `dot` kernel / `aggregate(zip_with(...))`
    * form, so cosines here are bit-identical to the frame pipeline's.
    */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def cosine(a: MmrCand, b: MmrCand): Double =
    dot(a.emb, b.emb) / (math.sqrt(dot(a.emb, a.emb)) * math.sqrt(dot(b.emb, b.emb)))

  override def eval(buffer: ArrayBuffer[MmrCand]): Any = {
    if (buffer.isEmpty) return new GenericArrayData(Array.empty[Any])
    // deterministic scan order: ascending nid, so a strict `>` keeps
    // the LOWEST nid on ties — the frame form's (score DESC, nid ASC)
    val cands = buffer.sortBy(_.nid)
    val selected = new ArrayBuffer[Int]()
    val out = new ArrayBuffer[Any]()
    // step 1: argmax rel
    var best = -1
    var i = 0
    while (i < cands.length) {
      if (best < 0 || java.lang.Double.compare(cands(i).rel, cands(best).rel) > 0) best = i
      i += 1
    }
    selected += best
    out += InternalRow(1, cands(best).nid, cands(best).rel, cands(best).rel)
    var t = 2
    while (t <= k && selected.length < cands.length) {
      var bestIdx = -1
      var bestScore = 0.0
      i = 0
      while (i < cands.length) {
        if (!selected.contains(i)) {
          // max over selected sims — double max, order-independent
          var maxsim = Double.NaN
          var first = true
          selected.foreach { s =>
            val sim = cosine(cands(i), cands(s))
            if (first || java.lang.Double.compare(sim, maxsim) > 0) { maxsim = sim; first = false }
          }
          val score = lambdaRel * cands(i).rel - lambdaSim * maxsim
          if (bestIdx < 0 || java.lang.Double.compare(score, bestScore) > 0) {
            bestIdx = i; bestScore = score
          }
        }
        i += 1
      }
      selected += bestIdx
      out += InternalRow(t, cands(bestIdx).nid, cands(bestIdx).rel, bestScore)
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buffer: ArrayBuffer[MmrCand]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val outS = new DataOutputStream(bos)
    outS.writeInt(buffer.length)
    buffer.foreach { c =>
      outS.writeLong(c.nid)
      outS.writeInt(c.emb.length)
      c.emb.foreach(outS.writeDouble)
      outS.writeDouble(c.rel)
    }
    outS.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[MmrCand] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[MmrCand](n)
    (1 to n).foreach { _ =>
      val nidV = in.readLong()
      val len = in.readInt()
      val emb = Array.fill(len)(in.readDouble())
      val relV = in.readDouble()
      buf += MmrCand(nidV, emb, relV)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrGreedyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrGreedyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(nid = newChildren(0), nemb = newChildren(1), rel = newChildren(2))
}

object MmrGreedyAgg {

  /** `lambdaRel`/`lambdaSim` are passed as the two written literals
    * (0.7 / 0.3), not derived as `1 − λ`, so the IEEE operands match
    * the frame expression `lit(0.7)·rel − lit(0.3)·maxsim` exactly.
    */
  def mmr(
      nid: Column,
      nemb: Column,
      rel: Column,
      k: Int,
      lambdaRel: Double,
      lambdaSim: Double): Column =
    GraftSqlBridge.column(
      MmrGreedyAgg(
        GraftSqlBridge.expression(nid),
        GraftSqlBridge.expression(nemb),
        GraftSqlBridge.expression(rel),
        k,
        lambdaRel,
        lambdaSim).toAggregateExpression()
    )
}
