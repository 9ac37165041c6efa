package graft.sketch

import org.apache.datasketches.cpc.{CpcSketch, CpcUnion}
import org.apache.datasketches.frequencies
import org.apache.datasketches.hll
import org.apache.datasketches.kll._
import org.apache.datasketches.quantiles.{DoublesSketch, DoublesUnion, ItemsSketch => ClassicItemsSketch, ItemsUnion => ClassicItemsUnion}
import org.apache.datasketches.req.ReqSketch
import org.apache.datasketches.tdigest.TDigestDouble
import org.apache.datasketches.theta
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import Kit._

/** Sketch-building / sketch-merging aggregate functions.
  *
  * Each is a [[TypedImperativeAggregate]] whose buffer is the live
  * datasketches-java object; `serialize`/`deserialize` use the sketch's own
  * byte format, so partial aggregation ships through the shuffle exactly the
  * bytes the reference engine would store (SURVEY.md §1.4, §3.2). All
  * aggregates skip NULL inputs (reference `IgnoreNull()==true`,
  * `src/generated.cpp:749`) and are order-insensitive (registered
  * NOT_ORDER_DEPENDENT in the reference).
  *
  * The K / lg_k parameter is bound at plan time by [[graft.Registration]]
  * (mirror of the reference's bind-time constant fold + argument erasure,
  * `src/generated.cpp:50-94`), so it is a constructor `Int`, not a child.
  */
abstract class SketchAggBase[T] extends TypedImperativeAggregate[T] {
  def child: Expression
  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  /** Feed one non-null raw value into a sketch via the per-type callbacks. */
  protected final def dispatch(v: Any)(
      onLong: Long => Unit, onDouble: Double => Unit,
      onString: String => Unit, onBytes: Array[Byte] => Unit): Unit = v match {
    case l: Long                => onLong(l)
    case i: Int                 => onLong(i.toLong)
    case s: Short               => onLong(s.toLong)
    case b: Byte                => onLong(b.toLong)
    case d: Double              => onDouble(d)
    case f: Float               => onDouble(f.toDouble)
    case s: UTF8String          => onString(s.toString)
    case b: Array[Byte]         => onBytes(b)
    case other => throw new IllegalArgumentException(
      s"$prettyName: unsupported input value type ${other.getClass.getName}")
  }

  /** Numeric-only families reject string/binary raw input (mirror of the
    * reference, which simply has no such overloads registered). */
  protected final def unsup(): Unit = throw new IllegalArgumentException(
    s"$prettyName: non-numeric input not supported")
}

// ---------------------------------------------------------------------------
// HLL (reference src/generated.cpp:866-1002; SURVEY §2.2)
// ---------------------------------------------------------------------------

/** `datasketch_hll(lg_k, v)` — build an HLL sketch. Buffer is an
  * [[hll.Union]] so cross-partition partial merges (the reference's thread
  * `Combine`, here the shuffle) go through hll union semantics with HLL_4
  * result, mirroring `codegen/generated.cpp.j2:399-405`. Empty input → NULL.
  * Finalize uses the updatable serialization (`serialize_updatable`,
  * reference `src/generated.cpp:913-926`).
  */
case class HllBuildAgg(
    lgK: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[hll.Union] {

  override def prettyName: String = "datasketch_hll"
  override def createAggregationBuffer(): hll.Union = new hll.Union(lgK)

  override def update(buf: hll.Union, input: InternalRow): hll.Union = {
    val v = child.eval(input)
    if (v != null) dispatch(v)(buf.update, buf.update, buf.update, buf.update)
    buf
  }
  override def merge(buf: hll.Union, other: hll.Union): hll.Union = {
    buf.update(other.getResult(hll.TgtHllType.HLL_8)); buf
  }
  override def eval(buf: hll.Union): Any = {
    val r = buf.getResult(hll.TgtHllType.HLL_4)
    if (r.isEmpty) null else r.toUpdatableByteArray
  }
  override def serialize(buf: hll.Union): Array[Byte] =
    buf.getResult(hll.TgtHllType.HLL_8).toUpdatableByteArray
  override def deserialize(bytes: Array[Byte]): hll.Union = {
    val u = new hll.Union(lgK)
    u.update(hll.HllSketch.heapify(mem(bytes)))
    u
  }
  override def withNewMutableAggBufferOffset(o: Int): HllBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** `datasketch_hll_union(lg_k, sketch)` — merge HLL sketch blobs
  * (reference `src/generated.cpp:931-1002`). */
case class HllUnionAgg(
    lgK: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[hll.Union] {

  override def prettyName: String = "datasketch_hll_union"
  override def createAggregationBuffer(): hll.Union = new hll.Union(lgK)

  override def update(buf: hll.Union, input: InternalRow): hll.Union = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Array[Byte]]
      buf.update(deser("HLL", b)(hll.HllSketch.heapify(mem(b))))
    }
    buf
  }
  override def merge(buf: hll.Union, other: hll.Union): hll.Union = {
    buf.update(other.getResult(hll.TgtHllType.HLL_8)); buf
  }
  override def eval(buf: hll.Union): Any = {
    val r = buf.getResult(hll.TgtHllType.HLL_4)
    if (r.isEmpty) null else r.toUpdatableByteArray
  }
  override def serialize(buf: hll.Union): Array[Byte] =
    buf.getResult(hll.TgtHllType.HLL_8).toUpdatableByteArray
  override def deserialize(bytes: Array[Byte]): hll.Union = {
    val u = new hll.Union(lgK)
    u.update(hll.HllSketch.heapify(mem(bytes)))
    u
  }
  override def withNewMutableAggBufferOffset(o: Int): HllUnionAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnionAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

// ---------------------------------------------------------------------------
// CPC (reference src/generated.cpp:1004-1146)
// ---------------------------------------------------------------------------

/** Mutable CPC buffer: a plain sketch for raw updates; merges go through a
  * [[CpcUnion]] keyed on the target's lg_k (reference `src/generated.cpp:1046`). */
final class CpcBuf(var sk: CpcSketch)

/** `datasketch_cpc(lg_k, v)` — build a CPC sketch. Empty input → NULL. */
case class CpcBuildAgg(
    lgK: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[CpcBuf] {

  override def prettyName: String = "datasketch_cpc"
  override def createAggregationBuffer(): CpcBuf = new CpcBuf(new CpcSketch(lgK))

  override def update(buf: CpcBuf, input: InternalRow): CpcBuf = {
    val v = child.eval(input)
    if (v != null) dispatch(v)(buf.sk.update, buf.sk.update, buf.sk.update, buf.sk.update)
    buf
  }
  override def merge(buf: CpcBuf, other: CpcBuf): CpcBuf = {
    val u = new CpcUnion(lgK)
    u.update(buf.sk); u.update(other.sk)
    buf.sk = u.getResult
    buf
  }
  override def eval(buf: CpcBuf): Any =
    if (buf.sk.isEmpty) null else buf.sk.toByteArray
  override def serialize(buf: CpcBuf): Array[Byte] = buf.sk.toByteArray
  override def deserialize(bytes: Array[Byte]): CpcBuf =
    new CpcBuf(CpcSketch.heapify(mem(bytes)))
  override def withNewMutableAggBufferOffset(o: Int): CpcBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CpcBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** `datasketch_cpc_union(lg_k, sketch)` — merge CPC sketch blobs.
  * Buffer is a persistent [[CpcUnion]] (one per group, like the reference's
  * per-state `cpc_union`, `src/generated.cpp:1004-1071`); the union is only
  * materialized at combine/finalize, never per input row. */
case class CpcUnionAgg(
    lgK: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[CpcUnion] {

  override def prettyName: String = "datasketch_cpc_union"
  override def createAggregationBuffer(): CpcUnion = new CpcUnion(lgK)

  override def update(buf: CpcUnion, input: InternalRow): CpcUnion = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Array[Byte]]
      buf.update(deser("CPC", b)(CpcSketch.heapify(mem(b))))
    }
    buf
  }
  override def merge(buf: CpcUnion, other: CpcUnion): CpcUnion = {
    buf.update(other.getResult); buf
  }
  override def eval(buf: CpcUnion): Any = {
    val r = buf.getResult
    if (r.isEmpty) null else r.toByteArray
  }
  override def serialize(buf: CpcUnion): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): CpcUnion = {
    val u = new CpcUnion(lgK)
    u.update(CpcSketch.heapify(mem(bytes)))
    u
  }
  override def withNewMutableAggBufferOffset(o: Int): CpcUnionAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CpcUnionAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

// ---------------------------------------------------------------------------
// Theta (reference src/theta_sketch.cpp:66-215)
// ---------------------------------------------------------------------------

/** `datasketch_theta([lg_k,] v_or_sketch)` — build or merge a Theta sketch.
  * One aggregate covers both the create and merge overloads (reference
  * registers both under one name, `src/theta_sketch.cpp:380-428`): a BINARY
  * child is a sketch blob to union; any other supported type is a raw update.
  * Buffer is a [[theta.Union]] (the Java union accepts both raw updates and
  * sketch unions, collapsing the reference's dual update/union state,
  * `src/theta_sketch.cpp:66-139`).
  *
  * Empty input yields a serialized *empty compact* sketch — NOT null —
  * so `datasketch_theta_estimate` over an empty table is 0 (reference
  * `src/theta_sketch.cpp:156-165`, `test/sql/datasketch_theta.test:162-165`).
  */
case class ThetaAgg(
    lgK: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[theta.Union] {

  private val isMerge = child.dataType == BinaryType

  override def prettyName: String = "datasketch_theta"
  override def nullable: Boolean = false
  override def createAggregationBuffer(): theta.Union =
    theta.SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: theta.Union, input: InternalRow): theta.Union = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) {
        val b = v.asInstanceOf[Array[Byte]]
        buf.union(deser("Theta", b)(theta.Sketches.wrapSketch(mem(b))))
      } else
        dispatch(v)(l => buf.update(l), d => buf.update(d), s => buf.update(s),
          b => buf.update(b))
    }
    buf
  }
  override def merge(buf: theta.Union, other: theta.Union): theta.Union = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: theta.Union): Any = buf.getResult.toByteArray
  override def serialize(buf: theta.Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): theta.Union = {
    val u = theta.SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(theta.Sketches.wrapSketch(mem(bytes)))
    u
  }
  override def withNewMutableAggBufferOffset(o: Int): ThetaAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

// ---------------------------------------------------------------------------
// KLL (reference src/generated.cpp:753-864, registration 3767-3835)
// ---------------------------------------------------------------------------

/** `datasketch_kll(k, v_or_sketch)` over one of the three Java element
  * specializations (SURVEY §7.3 item 2: the reference's 10 numeric element
  * types collapse to longs/floats/doubles). Create vs merge resolved at bind
  * time from the child type (BINARY → merge). Empty input → NULL.
  */
case class KllAgg(
    k: Int,
    child: Expression,
    elem: ElemType,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[KllSketch] {

  private val isMerge = child.dataType == BinaryType

  override def prettyName: String = "datasketch_kll"
  override def createAggregationBuffer(): KllSketch = elem match {
    case ElemType.Dbl  => KllDoublesSketch.newHeapInstance(k)
    case ElemType.Flt  => KllFloatsSketch.newHeapInstance(k)
    case ElemType.Lng  => KllLongsSketch.newHeapInstance(k)
    case ElemType.ULng => KllItemsSketch.newHeapInstance[java.lang.Long](k, ulongCmp, longsSerDe)
  }

  private def heapify(b: Array[Byte]): KllSketch = deser("KLL", b)(elem match {
    case ElemType.Dbl  => KllDoublesSketch.heapify(mem(b))
    case ElemType.Flt  => KllFloatsSketch.heapify(mem(b))
    case ElemType.Lng  => KllLongsSketch.heapify(mem(b))
    case ElemType.ULng => KllItemsSketch.heapify(mem(b), ulongCmp, longsSerDe)
  })

  private def mergeInto(buf: KllSketch, other: KllSketch): Unit = (buf, other) match {
    case (a: KllDoublesSketch, b: KllDoublesSketch) => a.merge(b)
    case (a: KllFloatsSketch, b: KllFloatsSketch)   => a.merge(b)
    case (a: KllLongsSketch, b: KllLongsSketch)     => a.merge(b)
    case (a: KllItemsSketch[_], b: KllItemsSketch[_]) =>
      a.asInstanceOf[KllItemsSketch[java.lang.Long]].merge(b)
    case _ => throw new IllegalStateException("KLL element type mismatch in merge")
  }

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) mergeInto(buf, heapify(v.asInstanceOf[Array[Byte]]))
      else buf match {
        case s: KllDoublesSketch => dispatch(v)(l => s.update(l.toDouble), s.update, _ => unsup(), _ => unsup())
        case s: KllFloatsSketch  => dispatch(v)(l => s.update(l.toFloat), d => s.update(d.toFloat), _ => unsup(), _ => unsup())
        case s: KllLongsSketch   => dispatch(v)(s.update, d => s.update(d.toLong), _ => unsup(), _ => unsup())
        case s: KllItemsSketch[_] =>
          // ulong lane: DECIMAL(20,0) input, raw uint64 bits inside
          s.asInstanceOf[KllItemsSketch[java.lang.Long]].update(
            java.lang.Long.valueOf(ulongBits(v.asInstanceOf[org.apache.spark.sql.types.Decimal])))
        case other => throw new IllegalStateException(s"unexpected KLL buffer ${other.getClass}")
      }
    }
    buf
  }
  override def merge(buf: KllSketch, other: KllSketch): KllSketch = { mergeInto(buf, other); buf }
  override def eval(buf: KllSketch): Any = if (buf.isEmpty) null else serialize(buf)
  override def serialize(buf: KllSketch): Array[Byte] = buf match {
    case s: KllDoublesSketch  => s.toByteArray
    case s: KllFloatsSketch   => s.toByteArray
    case s: KllLongsSketch    => s.toByteArray
    case s: KllItemsSketch[_] => s.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): KllSketch = heapify(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

// ---------------------------------------------------------------------------
// Classic Quantiles (reference src/generated.cpp:734-1146 quantiles blocks)
// ---------------------------------------------------------------------------

/** Buffer for classic quantiles: a [[DoublesUnion]] for double elements,
  * or a classic ItemsUnion over longs / floats (one non-null lane,
  * selected by the aggregate's bind-time element type). */
final class QuantilesBuf(val du: DoublesUnion,
                         val lu: ClassicItemsUnion[java.lang.Long],
                         val fu: ClassicItemsUnion[java.lang.Float])

/** `datasketch_quantiles(k, v_or_sketch)`. Empty input → NULL. */
case class QuantilesAgg(
    k: Int,
    child: Expression,
    elem: ElemType,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[QuantilesBuf] {

  private val isMerge = child.dataType == BinaryType

  /** Comparator of the long-items lane: unsigned for the ulong lane, the
    * natural order otherwise — everything else about the lane is shared. */
  private def lngCmp = if (elem == ElemType.ULng) ulongCmp else longCmp
  private val isULong = elem == ElemType.ULng

  override def prettyName: String = "datasketch_quantiles"
  override def createAggregationBuffer(): QuantilesBuf = elem match {
    case ElemType.Lng | ElemType.ULng =>
      new QuantilesBuf(null, ClassicItemsUnion.getInstance(classOf[java.lang.Long], k, lngCmp), null)
    case ElemType.Flt =>
      new QuantilesBuf(null, null, ClassicItemsUnion.getInstance(classOf[java.lang.Float], k, floatCmp))
    case _ =>
      new QuantilesBuf(DoublesUnion.builder().setMaxK(k).build(), null, null)
  }

  override def update(buf: QuantilesBuf, input: InternalRow): QuantilesBuf = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) {
        val b = v.asInstanceOf[Array[Byte]]
        if (buf.du != null) deser("Quantiles", b)(buf.du.union(mem(b)))
        else if (buf.lu != null) buf.lu.union(deser("Quantiles", b)(
          ClassicItemsSketch.getInstance(classOf[java.lang.Long], mem(b), lngCmp, longsSerDe)))
        else buf.fu.union(deser("Quantiles", b)(
          ClassicItemsSketch.getInstance(classOf[java.lang.Float], mem(b), floatCmp, floatsSerDe)))
      } else if (buf.du != null) {
        dispatch(v)(l => buf.du.update(l.toDouble), buf.du.update, _ => unsup(), _ => unsup())
      } else if (buf.lu != null) {
        if (isULong) buf.lu.update(java.lang.Long.valueOf(
          ulongBits(v.asInstanceOf[org.apache.spark.sql.types.Decimal])))
        else dispatch(v)(l => buf.lu.update(l), d => buf.lu.update(d.toLong), _ => unsup(), _ => unsup())
      } else {
        dispatch(v)(l => buf.fu.update(l.toFloat), d => buf.fu.update(d.toFloat), _ => unsup(), _ => unsup())
      }
    }
    buf
  }
  override def merge(buf: QuantilesBuf, other: QuantilesBuf): QuantilesBuf = {
    if (buf.du != null) buf.du.union(other.du.getResult)
    else if (buf.lu != null) buf.lu.union(other.lu.getResult)
    else buf.fu.union(other.fu.getResult)
    buf
  }
  // Items-lane blobs are written ORDERED compact (`toByteArray(true, _)`):
  // the single-arg overload writes unordered compact, which
  // `ItemsSketch.getInstance` REJECTS on read ("must be v2, empty, or
  // compact and ordered") — so the un-ordered form broke every long/float
  // lane blob re-merge (latent until q113 exercised one). Ordered compact
  // is also what the C++ quantiles sketch writes.
  override def eval(buf: QuantilesBuf): Any = {
    if (buf.du != null) {
      val r = buf.du.getResult
      if (r.isEmpty) null else r.toByteArray(false)
    } else if (buf.lu != null) {
      val r = buf.lu.getResult
      if (r.isEmpty) null else r.toByteArray(true, longsSerDe)
    } else {
      val r = buf.fu.getResult
      if (r.isEmpty) null else r.toByteArray(true, floatsSerDe)
    }
  }
  override def serialize(buf: QuantilesBuf): Array[Byte] =
    if (buf.du != null) buf.du.getResult.toByteArray(false)
    else if (buf.lu != null) buf.lu.getResult.toByteArray(true, longsSerDe)
    else buf.fu.getResult.toByteArray(true, floatsSerDe)
  override def deserialize(bytes: Array[Byte]): QuantilesBuf = {
    val buf = createAggregationBuffer()
    if (buf.du != null) buf.du.union(mem(bytes))
    else if (buf.lu != null)
      buf.lu.union(ClassicItemsSketch.getInstance(classOf[java.lang.Long], mem(bytes), lngCmp, longsSerDe))
    else
      buf.fu.union(ClassicItemsSketch.getInstance(classOf[java.lang.Float], mem(bytes), floatCmp, floatsSerDe))
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): QuantilesAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantilesAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

// ---------------------------------------------------------------------------
// REQ (reference src/generated.cpp:5096-5164) — Java REQ is float-native
// ---------------------------------------------------------------------------

/** `datasketch_req(k, v_or_sketch)`. Non-float numerics cast to float
  * (documented precision caveat, SURVEY §7.3 item 2). Empty input → NULL. */
case class ReqAgg(
    k: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[ReqSketch] {

  private val isMerge = child.dataType == BinaryType

  override def prettyName: String = "datasketch_req"
  override def createAggregationBuffer(): ReqSketch =
    ReqSketch.builder().setK(k).build()

  override def update(buf: ReqSketch, input: InternalRow): ReqSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) {
        val b = v.asInstanceOf[Array[Byte]]
        buf.merge(deser("REQ", b)(ReqSketch.heapify(mem(b))))
      } else dispatch(v)(l => buf.update(l.toFloat), d => buf.update(d.toFloat), _ => unsup(), _ => unsup())
    }
    buf
  }
  override def merge(buf: ReqSketch, other: ReqSketch): ReqSketch = { buf.merge(other); buf }
  override def eval(buf: ReqSketch): Any = if (buf.isEmpty) null else buf.toByteArray
  override def serialize(buf: ReqSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): ReqSketch = ReqSketch.heapify(mem(bytes))
  override def withNewMutableAggBufferOffset(o: Int): ReqAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReqAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

// ---------------------------------------------------------------------------
// TDigest (reference src/generated.cpp:5888-5920) — Java TDigest is double
// ---------------------------------------------------------------------------

/** `datasketch_tdigest(k, v_or_sketch)`. Empty input → NULL. */
case class TDigestAgg(
    k: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[TDigestDouble] {

  // TDigestDouble takes a short compression; validate before the narrowing
  // cast so an out-of-range K fails loudly instead of silently wrapping.
  require(k >= 1 && k <= Short.MaxValue,
    s"datasketch_tdigest: compression (k) must be in [1, ${Short.MaxValue}], got $k")

  private val isMerge = child.dataType == BinaryType

  override def prettyName: String = "datasketch_tdigest"
  override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k.toShort)

  override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) {
        // reference float-lane blobs widen to the double wire format first
        val b = Kit.tdigestWiden(v.asInstanceOf[Array[Byte]])
        buf.merge(deser("TDigest", b)(TDigestDouble.heapify(mem(b))))
      } else dispatch(v)(l => buf.update(l.toDouble), buf.update, _ => unsup(), _ => unsup())
    }
    buf
  }
  override def merge(buf: TDigestDouble, other: TDigestDouble): TDigestDouble = { buf.merge(other); buf }
  override def eval(buf: TDigestDouble): Any = if (buf.isEmpty) null else buf.toByteArray
  override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): TDigestDouble = TDigestDouble.heapify(mem(bytes))
  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

// ---------------------------------------------------------------------------
// Frequent Items (reference src/frequent_items_sketch.cpp:70-181)
// ---------------------------------------------------------------------------

/** `datasketch_frequent_items([lg_k,] v_or_sketch)`. Every input is
  * stringified with the reference's canonicalization ([[Kit.freqKey]]).
  * Empty input → serialized EMPTY sketch, not NULL (reference
  * `src/frequent_items_sketch.cpp:133-139`).
  */
case class FreqItemsAgg(
    lgK: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase[frequencies.ItemsSketch[String]] {

  private val isMerge = child.dataType == BinaryType

  override def prettyName: String = "datasketch_frequent_items"
  override def nullable: Boolean = false
  override def createAggregationBuffer(): frequencies.ItemsSketch[String] =
    new frequencies.ItemsSketch[String](1 << lgK)

  override def update(buf: frequencies.ItemsSketch[String], input: InternalRow): frequencies.ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) {
        val b = v.asInstanceOf[Array[Byte]]
        buf.merge(deser("Frequent Items", b)(
          frequencies.ItemsSketch.getInstance(mem(b), stringsSerDe)))
      } else buf.update(freqKey(v))
    }
    buf
  }
  override def merge(buf: frequencies.ItemsSketch[String], other: frequencies.ItemsSketch[String]): frequencies.ItemsSketch[String] = {
    buf.merge(other); buf
  }
  override def eval(buf: frequencies.ItemsSketch[String]): Any = buf.toByteArray(stringsSerDe)
  override def serialize(buf: frequencies.ItemsSketch[String]): Array[Byte] = buf.toByteArray(stringsSerDe)
  override def deserialize(bytes: Array[Byte]): frequencies.ItemsSketch[String] =
    frequencies.ItemsSketch.getInstance(mem(bytes), stringsSerDe)
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
