package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims.{column, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-bounded per-group occurrence collection for inverted-index pair
  * mining: `collect_list(struct(doc, pos))` that gives up — returning
  * NULL and FREEING its buffer — the moment a group exceeds `limit`
  * elements.
  *
  * Why not `collect_list` + a `size(occ) <= cap` filter: the filter runs
  * AFTER aggregation, so a hot gram (the boilerplate header / license
  * block the cap exists to exclude) first materializes its full O(df)
  * occurrence list in one aggregation buffer — at the 100 TB design
  * point a df~10⁸ gram is a single-buffer OOM the cap was supposed to
  * prevent. This aggregate enforces the cap DURING collection: the
  * buffer can never hold more than `limit` pairs, overflow is a 1-bit
  * state, and partial aggregation ships at most `limit` pairs (or the
  * overflow bit alone) through the shuffle — so the map side combines a
  * hot gram's mass down to one tombstone before the exchange, which the
  * count + anti-join + re-shuffle shape paid two extra exchanges to
  * achieve.
  *
  * Same group verdicts as the filter formulation: groups ≤ limit emit
  * their full list, groups > limit emit NULL (callers drop NULLs exactly
  * where they dropped `size > cap` rows). NULL doc inputs are skipped,
  * which is how [[SpanDedup.crossMatches]] routes each side of a union
  * into its own list via `when(side = …)`.
  */
case class BoundedOccListAgg(
    limit: Int,
    doc: Expression,
    pos: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedOccListAgg.Buf] {

  require(limit >= 1, s"graft_bounded_occ_list: limit must be >= 1, got $limit")

  override def prettyName: String = "graft_bounded_occ_list"
  override def children: Seq[Expression] = doc :: pos :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BoundedOccListAgg.occArrayType

  override def createAggregationBuffer(): BoundedOccListAgg.Buf =
    new BoundedOccListAgg.Buf(limit)

  override def update(buf: BoundedOccListAgg.Buf, input: InternalRow): BoundedOccListAgg.Buf = {
    val d = doc.eval(input)
    if (d != null) {
      val p = pos.eval(input)
      if (p != null) buf.add(d.asInstanceOf[Long], p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BoundedOccListAgg.Buf, other: BoundedOccListAgg.Buf): BoundedOccListAgg.Buf = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: BoundedOccListAgg.Buf): Any = {
    if (buf.overflowed) null
    else {
      val out = new Array[Any](buf.size)
      var j = 0
      while (j < buf.size) {
        out(j) = new GenericInternalRow(Array[Any](buf.docs(j), buf.poss(j)))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** 1-byte overflow flag, 4-byte n, then n (long, long) pairs; an
    * overflowed partial is 5 bytes regardless of how hot the gram was. */
  override def serialize(buf: BoundedOccListAgg.Buf): Array[Byte] = {
    if (buf.overflowed) Array[Byte](1, 0, 0, 0, 0)
    else {
      val bb = java.nio.ByteBuffer.allocate(5 + 16 * buf.size)
      bb.put(0: Byte)
      bb.putInt(buf.size)
      var j = 0
      while (j < buf.size) { bb.putLong(buf.docs(j)); bb.putLong(buf.poss(j)); j += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): BoundedOccListAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new BoundedOccListAgg.Buf(limit)
    if (bb.get() != 0) b.markOverflowed()
    else {
      val n = bb.getInt
      var j = 0
      while (j < n) { b.add(bb.getLong, bb.getLong); j += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedOccListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedOccListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(doc = newChildren(0), pos = newChildren(1))
}

object BoundedOccListAgg {

  val occType: StructType = StructType(Seq(
    StructField("doc", LongType, nullable = false),
    StructField("pos", LongType, nullable = false)))
  val occArrayType: DataType = ArrayType(occType, containsNull = false)

  /** Growable parallel long arrays + a terminal overflow bit. Once
    * overflowed the arrays are RELEASED (the whole point: a hot group's
    * buffer is 1 bit, not O(df)) and every later add is a no-op. */
  final class Buf(limit: Int) {
    var docs: Array[Long] = new Array[Long](8)
    var poss: Array[Long] = new Array[Long](8)
    var size: Int = 0
    var overflowed: Boolean = false

    def markOverflowed(): Unit = {
      overflowed = true
      docs = null
      poss = null
      size = 0
    }

    def add(d: Long, p: Long): Unit = {
      if (!overflowed) {
        if (size == limit) markOverflowed()
        else {
          if (size == docs.length) {
            val cap = math.min(limit.toLong, docs.length * 2L).toInt
            docs = java.util.Arrays.copyOf(docs, cap)
            poss = java.util.Arrays.copyOf(poss, cap)
          }
          docs(size) = d
          poss(size) = p
          size += 1
        }
      }
    }

    def mergeFrom(other: Buf): Unit = {
      if (other.overflowed) markOverflowed()
      else if (!overflowed) {
        var j = 0
        while (j < other.size && !overflowed) { add(other.docs(j), other.poss(j)); j += 1 }
      }
    }
  }

  /** `graft_bounded_occ_list(cap, doc, pos)` as a Column; `cap <= 0`
    * means unbounded (the callers' documented "no cap" contract). */
  def boundedOccList(cap: Int, doc: Column, pos: Column): Column = {
    val limit = if (cap <= 0) Int.MaxValue else cap
    column(BoundedOccListAgg(limit,
        toExpression(doc.cast("long")), toExpression(pos.cast("long")))
      .toAggregateExpression())
  }
}
