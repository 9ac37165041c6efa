package graft.sketch

import java.util.Comparator

import org.apache.datasketches.common.{ArrayOfLongsSerDe, ArrayOfStringsSerDe, SketchesException}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.types._

/** Shared helpers for the sketch engine.
  *
  * Element-type model: the reference (DuckDB datasketches extension) carries the
  * sketch's element type in a named alias type (`sketch_kll_double`, ...;
  * reference `codegen/generated.cpp.j2:205-224`). Spark has no alias types, so we
  * carry the family + element type as (a) the resolved input type at aggregate
  * bind time and (b) `StructField` metadata emitted by our aggregates, consumed
  * at scalar-function bind time (see [[graft.Registration]]).
  */
object Kit {

  /** Element type of a quantile-family sketch. DuckDB's 10 numeric element
    * types (reference `codegen/generator.py:49-60`) collapse onto the three
    * Java sketch specializations: integral → longs, float → floats,
    * double → doubles (unsigned types widen; documented caveat, SURVEY §7.3).
    */
  sealed abstract class ElemType(val tag: String, val sparkType: DataType)
  object ElemType {
    case object Lng extends ElemType("long", LongType)
    case object Flt extends ElemType("float", FloatType)
    case object Dbl extends ElemType("double", DoubleType)

    def fromTag(s: String): ElemType = s match {
      case "long"   => Lng
      case "float"  => Flt
      case "double" => Dbl
      case other    => throw new IllegalArgumentException(s"unknown sketch element type '$other'")
    }

    /** Bind-time mapping from a raw Spark input type (create-aggregate path). */
    def ofInput(dt: DataType): Option[ElemType] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(Lng)
      case FloatType                                     => Some(Flt)
      case DoubleType                                    => Some(Dbl)
      case _                                             => None
    }
  }

  val longsSerDe = new ArrayOfLongsSerDe
  val stringsSerDe = new ArrayOfStringsSerDe
  val longCmp: Comparator[java.lang.Long] = Comparator.naturalOrder[java.lang.Long]()

  def criteria(inclusive: Boolean): QuantileSearchCriteria =
    if (inclusive) QuantileSearchCriteria.INCLUSIVE else QuantileSearchCriteria.EXCLUSIVE

  /** Mirrors the reference's deserialize error wrapping
    * (`codegen/generator.py:71-87` → `InvalidInputException("Failed to
    * deserialize ...")`, tested at `test/sql/datasketch_kll.test:100-114`).
    */
  def deser[T](family: String)(body: => T): T =
    try body
    catch {
      case e: SketchesException =>
        throw new IllegalArgumentException(s"Failed to deserialize $family sketch: ${e.getMessage}", e)
      case e: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(s"Failed to deserialize $family sketch: ${e.getMessage}", e)
    }

  def mem(bytes: Array[Byte]): Memory = Memory.wrap(bytes)

  /** Frequent-items key canonicalization. The reference stringifies every
    * input: VARCHAR passthrough, integrals via std::to_string, float/double
    * via std::to_string's "%f" (6 decimals) — reference
    * `src/frequent_items_sketch.cpp:88-100`. Replicated exactly so estimates
    * agree across engines.
    */
  /** C's %f renders non-finite values as "nan"/"inf"/"-inf"; Java's would
    * yield "NaN"/"Infinity". Match the C text so keys agree with sketches
    * produced by the reference. (Tie-rounding caveat: Java %f uses HALF_UP
    * while C rounds half-to-even; values exactly on a 6th-decimal tie
    * boundary can key differently — not test-visible in the corpus.) */
  private def cFormat(d: Double): String =
    if (d.isNaN) "nan"
    else if (d == Double.PositiveInfinity) "inf"
    else if (d == Double.NegativeInfinity) "-inf"
    else {
      // Whole-number fast path: "%f" of an integral double is just
      // "<long>.000000", and String.format costs ~1 µs/call — the dominant
      // per-row cost when building frequent-items over numeric columns
      // (keys like quantities and ids are almost always integral).
      val l = d.toLong
      if (l.toDouble == d && math.abs(d) < 1e15) {
        if (l == 0L && (java.lang.Double.doubleToRawLongBits(d) != 0L))
          "-0.000000" // preserve %f's signed zero
        else l.toString + ".000000"
      } else "%f".formatLocal(java.util.Locale.ROOT, d)
    }

  def freqKey(v: Any): String = v match {
    case null                                   => null
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case s: String                              => s
    case d: Double                              => cFormat(d)
    case f: Float                               => cFormat(f.toDouble)
    case b: Byte                                => b.toInt.toString
    case s: Short                               => s.toInt.toString
    case i: Int                                 => i.toString
    case l: Long                                => l.toString
    case other                                  => other.toString
  }

  /** Result schema of `datasketch_frequent_items_get_frequent`
    * (reference `src/frequent_items_sketch.cpp:546-555`). */
  val frequentRowType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower_bound", LongType, nullable = false),
    StructField("upper_bound", LongType, nullable = false)))

  /** Metadata tag our aggregates attach so downstream scalar binds can
    * recover family + element type from a stored sketch column. */
  def sketchMetadata(family: String, elem: Option[ElemType]): Metadata = {
    val b = new MetadataBuilder().putString("sketchFamily", family)
    elem.foreach(e => b.putString("sketchElementType", e.tag))
    b.build()
  }
}
