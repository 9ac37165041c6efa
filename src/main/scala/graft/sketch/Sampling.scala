package graft.sketch

import org.apache.datasketches.common.{ArrayOfDoublesSerDe, ArrayOfItemsSerDe, ArrayOfLongsSerDe, ArrayOfStringsSerDe}
import org.apache.datasketches.sampling.{ReservoirItemsSketch, ReservoirItemsUnion, VarOptItemsSketch, VarOptItemsUnion}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import Kit._

/** Sampling sketches — beyond-reference (the DuckDB extension has no
  * sampling family), built on datasketches-java's `sampling` package with
  * the same sketch-as-value lifecycle as every other family.
  *
  * Training-data pipelines sample constantly: uniform row samples for eval
  * sets and profiling, weighted samples for importance/temperature mixing
  * across sources. Both are one-pass, bounded-memory, MERGEABLE here —
  * each executor keeps a K-slot reservoir, partials union through the
  * shuffle, and the result is a storable BLOB probed with scalars. That is
  * the property `TABLESAMPLE`/`rand() < p` approaches lack: an exact-K
  * sample of 100 TB with no second pass and no global sort, resumable
  * across ingest batches by unioning stored sketches.
  *
  *  - `datasketch_reservoir(k, v)` — uniform sample of K items; raw input
  *    builds, BLOB input merges (dual dispatch like the quantile families).
  *  - `datasketch_varopt(k, v, weight)` — variance-optimal weighted
  *    sample; subset-sum estimates from it are unbiased.
  *
  * Determinism note: once n > K eviction is randomized (like the
  * reference's Quantiles family, SURVEY §4); with K ≥ n the sample is the
  * whole input and fully deterministic — the regime the oracle query pins.
  */
object Sampling {

  /** Element lanes: sampling keeps ITEMS, so strings matter (doc ids,
    * source names) alongside numerics. */
  sealed abstract class SElem(val tag: String, val sparkType: DataType) {
    def serde: ArrayOfItemsSerDe[AnyRef]
    /** Spark value → sketch item. */
    def toItem(v: Any): AnyRef
    /** Sketch item → Spark value. */
    def toSpark(o: AnyRef): Any
  }
  object SElem {
    case object Lng extends SElem("long", LongType) {
      def serde = (new ArrayOfLongsSerDe).asInstanceOf[ArrayOfItemsSerDe[AnyRef]]
      def toItem(v: Any): AnyRef = java.lang.Long.valueOf(v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"datasketch_reservoir: expected an integral value, got ${other.getClass.getName}")
      })
      def toSpark(o: AnyRef): Any = o.asInstanceOf[java.lang.Long].longValue()
    }
    case object Dbl extends SElem("double", DoubleType) {
      def serde = (new ArrayOfDoublesSerDe).asInstanceOf[ArrayOfItemsSerDe[AnyRef]]
      def toItem(v: Any): AnyRef = java.lang.Double.valueOf(v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case other => throw new IllegalArgumentException(
          s"datasketch_reservoir: expected a numeric value, got ${other.getClass.getName}")
      })
      def toSpark(o: AnyRef): Any = o.asInstanceOf[java.lang.Double].doubleValue()
    }
    case object Str extends SElem("string", StringType) {
      def serde = (new ArrayOfStringsSerDe).asInstanceOf[ArrayOfItemsSerDe[AnyRef]]
      def toItem(v: Any): AnyRef = v match {
        case s: UTF8String => s.toString
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"datasketch_reservoir: expected a string value, got ${other.getClass.getName}")
      }
      def toSpark(o: AnyRef): Any = UTF8String.fromString(o.asInstanceOf[String])
    }

    def fromTag(s: String): SElem = s match {
      case "long" => Lng
      case "double" => Dbl
      case "string" => Str
      case other => throw new IllegalArgumentException(
        s"unknown sampling element type '$other' (long|double|string)")
    }
    /** Infer the lane from a raw input's Spark type. */
    def ofInput(dt: DataType): Option[SElem] = dt match {
      case LongType | IntegerType | ShortType | ByteType => Some(Lng)
      case DoubleType | FloatType                        => Some(Dbl)
      case StringType                                    => Some(Str)
      case _                                             => None
    }
  }
}

/** `datasketch_reservoir(k, v)` — uniform K-item sample. Buffer is a
  * [[ReservoirItemsUnion]] (accepts raw items AND partial sketches), so
  * the create and merge paths share one implementation; BLOB input (a
  * serialized reservoir sketch) selects the merge path. Empty input →
  * NULL, matching the quantile families.
  */
case class ReservoirAgg(
    k: Int,
    child: Expression,
    elem: Sampling.SElem,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchAggBase[ReservoirItemsUnion[AnyRef]] {

  private val isMerge = child.dataType == BinaryType

  override def prettyName: String = "datasketch_reservoir"
  override def createAggregationBuffer(): ReservoirItemsUnion[AnyRef] =
    ReservoirItemsUnion.newInstance[AnyRef](k)

  override def update(buf: ReservoirItemsUnion[AnyRef], input: InternalRow): ReservoirItemsUnion[AnyRef] = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) {
        val b = v.asInstanceOf[Array[Byte]]
        deser("Reservoir", b)(buf.update(mem(b), elem.serde))
      } else buf.update(elem.toItem(v))
    }
    buf
  }
  override def merge(buf: ReservoirItemsUnion[AnyRef], other: ReservoirItemsUnion[AnyRef]): ReservoirItemsUnion[AnyRef] = {
    val r = other.getResult
    if (r != null) buf.update(r)
    buf
  }
  override def eval(buf: ReservoirItemsUnion[AnyRef]): Any = {
    val r = buf.getResult
    if (r == null || r.getN == 0) null else r.toByteArray(elem.serde)
  }
  override def serialize(buf: ReservoirItemsUnion[AnyRef]): Array[Byte] =
    buf.toByteArray(elem.serde)
  override def deserialize(bytes: Array[Byte]): ReservoirItemsUnion[AnyRef] =
    ReservoirItemsUnion.heapify(mem(bytes), elem.serde)
  override def withNewMutableAggBufferOffset(o: Int): ReservoirAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** `datasketch_varopt(k, v, weight)` — variance-optimal weighted sample
  * (VarOpt): subset-sum estimates over the K kept (item, adjusted-weight)
  * pairs are unbiased with provably minimal variance. BLOB input (2-arg
  * form) merges partial sketches. Empty input → NULL.
  */
case class VarOptAgg(
    k: Int,
    override val children: Seq[Expression],
    elem: Sampling.SElem,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchAggBase[VarOptItemsSketch[AnyRef]] {

  private val isMerge = children.head.dataType == BinaryType

  override def child: Expression = children.head

  override def prettyName: String = "datasketch_varopt"
  override def createAggregationBuffer(): VarOptItemsSketch[AnyRef] =
    VarOptItemsSketch.newInstance[AnyRef](k)

  private def unionInto(buf: VarOptItemsSketch[AnyRef],
                        other: VarOptItemsSketch[AnyRef]): VarOptItemsSketch[AnyRef] = {
    val u = VarOptItemsUnion.newInstance[AnyRef](k)
    u.update(buf)
    u.update(other)
    u.getResult
  }

  override def update(buf: VarOptItemsSketch[AnyRef], input: InternalRow): VarOptItemsSketch[AnyRef] = {
    val v = children.head.eval(input)
    if (v == null) return buf
    if (isMerge) {
      val b = v.asInstanceOf[Array[Byte]]
      val other = deser("VarOpt", b)(
        VarOptItemsSketch.heapify(mem(b), elem.serde))
      unionInto(buf, other)
    } else {
      val w = children(1).eval(input)
      if (w != null) buf.update(elem.toItem(v), w.asInstanceOf[Number].doubleValue())
      buf
    }
  }
  override def merge(buf: VarOptItemsSketch[AnyRef], other: VarOptItemsSketch[AnyRef]): VarOptItemsSketch[AnyRef] =
    if (other.getN == 0) buf else unionInto(buf, other)
  override def eval(buf: VarOptItemsSketch[AnyRef]): Any =
    if (buf.getN == 0) null else buf.toByteArray(elem.serde)
  override def serialize(buf: VarOptItemsSketch[AnyRef]): Array[Byte] =
    buf.toByteArray(elem.serde)
  override def deserialize(bytes: Array[Byte]): VarOptItemsSketch[AnyRef] =
    VarOptItemsSketch.heapify(mem(bytes), elem.serde)
  override def withNewMutableAggBufferOffset(o: Int): VarOptAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VarOptAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(children = c)
}

/** Sampling scalar probes (interpreted, like the reference families'
  * metadata scalars): `samples` unpacks the kept items, `n`/`k`/
  * `num_samples` report state.
  */
case class SamplingScalar(family: String, fn: String, elem: Sampling.SElem,
                          children: Seq[Expression]) extends SketchScalar {

  override def prettyName: String = s"datasketch_${family}_$fn"

  override def dataType: DataType = (family, fn) match {
    case (_, "n")                     => LongType
    case (_, "k") | (_, "num_samples") => IntegerType
    case ("reservoir", "samples")     => ArrayType(elem.sparkType, containsNull = false)
    case ("varopt", "samples") => ArrayType(StructType(Seq(
      StructField("item", elem.sparkType, nullable = false),
      StructField("weight", DoubleType, nullable = false))), containsNull = false)
    case other => throw new IllegalStateException(s"unknown sampling scalar $other")
  }

  override def compute(args: Array[Any]): Any = {
    val bytes = args(0).asInstanceOf[Array[Byte]]
    family match {
      case "reservoir" =>
        val sk = deser("Reservoir", bytes)(ReservoirItemsSketch.heapify(mem(bytes), elem.serde))
        fn match {
          case "n" => sk.getN
          case "k" => sk.getK
          case "num_samples" => sk.getNumSamples
          case "samples" =>
            new GenericArrayData(sk.getSamples.map(elem.toSpark))
        }
      case "varopt" =>
        val sk = deser("VarOpt", bytes)(VarOptItemsSketch.heapify(mem(bytes), elem.serde))
        fn match {
          case "n" => sk.getN
          case "k" => sk.getK
          case "num_samples" => sk.getNumSamples
          case "samples" =>
            val s = sk.getSketchSamples
            val items = s.items()
            val weights = s.weights()
            new GenericArrayData(items.indices.map { i =>
              InternalRow(elem.toSpark(items(i)), weights(i))
            }.toArray[Any])
        }
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}
