package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable top-k buffer ordered by (sim desc, id asc) — a bounded
  * insertion list; k is small (ANN top-k), so O(k) insert beats heap
  * constant factors. */
final class TopKBuffer(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** Keep iff better than the current worst: higher sim, or equal sim and
    * lower id — the exact Window orderBy(sim desc, id) ranking. */
  def insert(sim: Double, id: Long): Unit = {
    var pos = n
    while (pos > 0 && (sim > sims(pos - 1) ||
        (sim == sims(pos - 1) && id < ids(pos - 1)))) pos -= 1
    if (pos < k) {
      val last = math.min(n, k - 1)
      var j = last
      while (j > pos) { sims(j) = sims(j - 1); ids(j) = ids(j - 1); j -= 1 }
      sims(pos) = sim; ids(pos) = id
      if (n < k) n += 1
    }
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.sims(i), o.ids(i)); i += 1 }
  }
}

/** Partial-aggregable top-k by (sim desc, id asc): the map side keeps a
  * k-bounded buffer per group and the shuffle carries k rows per group —
  * instead of the Window-rank plan, which shuffles and SORTS every scored
  * candidate. At corpus scale (billions of candidates per query batch)
  * that sort is the bottleneck; this is O(n·k) with an O(k)-row shuffle.
  * Returns array<struct<id,sim>> in rank order; callers posexplode into
  * (rank, id, sim) rows. Ordering is bit-identical to the Window form
  * (spec-asserted), so oracle hashes are unaffected.
  */
case class TopKSimAgg(simExpr: Expression, idExpr: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(simExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = simExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.sims(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeDouble(buf.sims(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id = in.readLong()
      buf.sims(i) = s; buf.ids(i) = id; i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKSimAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSimAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSimAgg =
    copy(simExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = s"topk_sim($k)"
}

object TopKAgg {
  /** Aggregate column: top-k (id, sim) pairs by (sim desc, id asc). */
  def topk_sim(sim: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKSimAgg(
      ColumnBridge.expression(sim), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
