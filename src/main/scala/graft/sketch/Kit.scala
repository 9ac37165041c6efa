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
    /** UBIGINT lane (reference `codegen/generator.py:49-60` ubigint):
      * DECIMAL(20,0) at the Spark surface (the only Spark type that holds
      * [0, 2^64)), raw uint64 bit patterns inside the sketch, ordered by
      * `Long.compareUnsigned` — TRUE unsigned quantile semantics, closing
      * the "widened to signed LONG" deviation for values > 2^63−1. */
    case object ULng extends ElemType("ulong", DecimalType(20, 0))

    def fromTag(s: String): ElemType = s match {
      case "long"   => Lng
      case "float"  => Flt
      case "double" => Dbl
      case "ulong"  => ULng
      case other    => throw new IllegalArgumentException(s"unknown sketch element type '$other'")
    }

    /** Bind-time mapping from a raw Spark input type (create-aggregate path).
      * DECIMAL(20,0) is the UBIGINT convention; other decimals stay
      * unsupported (the reference has no DECIMAL element type). */
    def ofInput(dt: DataType): Option[ElemType] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(Lng)
      case FloatType                                     => Some(Flt)
      case DoubleType                                    => Some(Dbl)
      case d: DecimalType if d.precision == 20 && d.scale == 0 => Some(ULng)
      case _                                             => None
    }
  }

  // ---- UBIGINT (ulong lane) helpers ---------------------------------------

  private val TWO64 = java.math.BigInteger.ONE.shiftLeft(64)

  /** Unsigned 64-bit order — the comparator of the ulong quantile lanes. */
  val ulongCmp: Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  /** DECIMAL(20,0) UBIGINT value → raw uint64 bit pattern (range-checked,
    * mirroring DuckDB's UBIGINT domain error on out-of-range casts). */
  def ulongBits(d: org.apache.spark.sql.types.Decimal): Long = {
    val bi = d.toJavaBigDecimal.toBigIntegerExact
    if (bi.signum < 0 || bi.compareTo(TWO64) >= 0)
      throw new IllegalArgumentException(
        s"ubigint lane: value $bi out of UBIGINT range [0, 2^64)")
    bi.longValue()
  }

  /** Raw uint64 bits → Spark Decimal(20,0). */
  def ulongDecimal(l: Long): org.apache.spark.sql.types.Decimal = {
    val bi =
      if (l >= 0) java.math.BigInteger.valueOf(l)
      else java.math.BigInteger.valueOf(l).add(TWO64)
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(bi), 20, 0)
  }

  /** Probe argument (double-cast by the registration layer, like every
    * quantile-lane probe) → raw uint64 bits; clamped to the domain edges
    * (exact below 2^53 — the same double-pathway precision caveat as the
    * signed long lane's rank/cdf/pmf probes). */
  def ulongBitsOfDouble(d: Double): Long = {
    if (d.isNaN || d <= 0.0) 0L
    else {
      val bi = new java.math.BigDecimal(d).toBigInteger
      if (bi.compareTo(TWO64) >= 0) -1L // all ones = 2^64 - 1
      else bi.longValue()
    }
  }

  val longsSerDe = new ArrayOfLongsSerDe
  val stringsSerDe = new ArrayOfStringsSerDe
  val longCmp: Comparator[java.lang.Long] = Comparator.naturalOrder[java.lang.Long]()
  val floatCmp: Comparator[java.lang.Float] = Comparator.naturalOrder[java.lang.Float]()

  /** Float items serde — datasketches-java ships no ArrayOfFloatsSerDe.
    * 4-byte items in the Memory's (little-endian) byte order, the same
    * item-stream layout as the C++ `quantiles_sketch<float>`
    * (reference `codegen/generator.py:49-60` FLOAT lane). */
  object floatsSerDe extends org.apache.datasketches.common.ArrayOfItemsSerDe[java.lang.Float] {
    type JF = java.lang.Float with Object
    override def serializeToByteArray(item: java.lang.Float): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putFloat(item)
      b.array()
    }
    override def serializeToByteArray(items: Array[JF]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * items.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      items.foreach(f => b.putFloat(f))
      b.array()
    }
    override def deserializeFromMemory(m: Memory, offsetBytes: Long, numItems: Int): Array[JF] = {
      val out = new Array[java.lang.Float](numItems)
      var i = 0
      while (i < numItems) { out(i) = m.getFloat(offsetBytes + 4L * i); i += 1 }
      out.asInstanceOf[Array[JF]]
    }
    override def sizeOf(item: java.lang.Float): Int = 4
    override def sizeOf(m: Memory, offsetBytes: Long, numItems: Int): Int = 4 * numItems
    override def toString(item: java.lang.Float): String = item.toString
    override def getClassOfT: Class[java.lang.Float] = classOf[java.lang.Float]
  }

  def criteria(inclusive: Boolean): QuantileSearchCriteria =
    if (inclusive) QuantileSearchCriteria.INCLUSIVE else QuantileSearchCriteria.EXCLUSIVE

  /** DataSketches serialized preambles carry a family ID at byte 2
    * (datasketches-java `Family`; the C++ formats use the same IDs, so
    * reference-produced blobs sniff identically). Accepted IDs per SQL
    * family name as used at the `deser` call sites. */
  private val familyIds: Map[String, Set[Int]] = Map(
    "Theta" -> Set(1, 2, 3), // ALPHA / QUICKSELECT / COMPACT
    "HLL" -> Set(7), "Quantiles" -> Set(8), "Tuple" -> Set(9),
    "Frequent Items" -> Set(10), "Reservoir" -> Set(11), "VarOpt" -> Set(13),
    "KLL" -> Set(15), "CPC" -> Set(16), "REQ" -> Set(17), "TDigest" -> Set(20),
    "Bloom" -> Set(21))

  private val familyNames: Map[Int, String] = Map(
    1 -> "Theta", 2 -> "Theta", 3 -> "Theta", 4 -> "Theta union",
    5 -> "Theta intersection", 6 -> "Theta a-not-b", 7 -> "HLL",
    8 -> "Quantiles", 9 -> "Tuple", 10 -> "Frequent Items",
    11 -> "Reservoir", 13 -> "VarOpt", 15 -> "KLL", 16 -> "CPC",
    17 -> "REQ", 20 -> "TDigest", 21 -> "Bloom")

  /** Reference-compatible `describe` banner. The C++ reference's describe
    * output opens with a `### <family> sketch summary` line that its own
    * test suite probes via LIKE (`test/sql/datasketch_hll.test:84`,
    * `datasketch_cpc.test:44`, `datasketch_theta.test:139,754-755`); the
    * Java sketches print differently-cased banners ("### HLL SKETCH
    * SUMMARY"), so a reference user's probe queries would silently return
    * false. Describe free text may legally differ, but the banner is the
    * one part the reference pins — emit it verbatim above the Java body. */
  def describeBanner(family: String, body: String): String =
    s"### $family sketch summary:\n$body"

  /** Mirrors the reference's deserialize error wrapping
    * (`codegen/generator.py:71-87` → `InvalidInputException("Failed to
    * deserialize ...")`, tested at `test/sql/datasketch_kll.test:100-114`),
    * plus a preamble family-ID sniff BEFORE the deserializer touches the
    * memory. The wrong family deserializer either throws an opaque internal
    * bounds/format error or — worse — silently reinterprets the bytes (a
    * Theta blob "heapifies" as garbage under some layouts). The reference
    * cannot reach this state: its 36 named alias types make a cross-family
    * probe a bind-time overload error (`codegen/generated.cpp.j2:205-224`);
    * this sniff is the closest runtime analog Spark's untyped BINARY allows.
    */
  def deser[T](family: String, bytes: Array[Byte])(body: => T): T = {
    if (bytes.length < 8)
      throw new IllegalArgumentException(
        s"Failed to deserialize $family sketch: BLOB too short (${bytes.length} bytes)")
    val fid = bytes(2) & 0xFF
    familyIds.get(family).filterNot(_.contains(fid)).foreach { _ =>
      val actual = familyNames.get(fid)
        .map(n => s"a $n sketch (family ID $fid) — probe it with the matching $n functions" +
          " or fix the stored column's sketch tag")
        .getOrElse(s"not a recognizable sketch (family ID $fid)")
      throw new IllegalArgumentException(
        s"Failed to deserialize $family sketch: the BLOB is $actual")
    }
    // Wrap EVERY deserializer failure, as the reference does (its
    // `catch (...)` in codegen/generator.py:71-87 is unconditional): the
    // Java deserializers throw SketchesException for format violations, but
    // a truncated-yet-valid-preamble blob escapes through the
    // datasketches-memory bounds checks (MemoryBoundsException) or plain
    // IndexOutOfBounds depending on family. The body here is only the
    // heapify/wrap call, so a broad catch cannot mask unrelated logic bugs.
    try body
    catch {
      case scala.util.control.NonFatal(e) =>
        val detail = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        throw new IllegalArgumentException(s"Failed to deserialize $family sketch: $detail", e)
    }
  }

  def mem(bytes: Array[Byte]): Memory = Memory.wrap(bytes)

  /** Per-thread bounded memo for deserialized sketches. Probe-shaped
    * queries (q22/q68: one stored BLOB, a dozen scalar probes over it)
    * re-deserialize the same bytes once per scalar call; the memo makes
    * that one deserialization per task thread instead. Sketch objects are
    * read-only through every probe here, and the key is CONTENT (Spark
    * hands each call a fresh copied array, so identity would never hit).
    * Bounds: 32 entries per thread, LRU, blobs over 64 KiB bypass —
    * worst case ~2 MiB per executor thread, no coordination. Failures
    * are never cached: only a successfully deserialized sketch enters.
    *
    * CONTRACT for callers of [[memoDeser]]: the `bytes` array must not be
    * mutated after the call. Wrap-style deserializers (theta `wrapSketch`)
    * return an object that ALIASES the array, and the memo key also holds
    * it; mutating it would corrupt both the cached sketch and key. Every
    * current caller passes a Spark-owned copy that is never written again,
    * and heapify-style deserializers copy out — but a new wrap-style
    * caller that reuses buffers must copy before calling. */
  private final class BlobKey(val tag: String, val bytes: Array[Byte]) {
    // Sampled content hash: per-row probes construct a key per call, and
    // hashing a multi-KB blob per row dominated the q95 rank-transform
    // profile. Ends + middle discriminate real sketch blobs (the tail of
    // a sketch is data, not preamble); equals stays a FULL compare, so a
    // sampled collision costs one memcmp, never a wrong cache hit.
    override val hashCode: Int = {
      val n = bytes.length
      var h = tag.hashCode * 31 + n
      if (n <= 48) {
        var i = 0
        while (i < n) { h = h * 31 + bytes(i); i += 1 }
      } else {
        var i = 0
        while (i < 16) { h = h * 31 + bytes(i); i += 1 }
        val mid = n / 2 - 8
        i = 0
        while (i < 16) { h = h * 31 + bytes(mid + i); i += 1 }
        i = n - 16
        while (i < n) { h = h * 31 + bytes(i); i += 1 }
      }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case b: BlobKey => b.tag == tag && java.util.Arrays.equals(b.bytes, bytes)
      case _          => false
    }
  }
  private val memoMaxEntries = 32
  private val memoMaxBlob = 64 * 1024
  private val deserMemo: ThreadLocal[java.util.LinkedHashMap[BlobKey, AnyRef]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[BlobKey, AnyRef](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[BlobKey, AnyRef]): Boolean =
          size() > memoMaxEntries
      })

  def memoDeser[T <: AnyRef](tag: String, bytes: Array[Byte])(build: => T): T = {
    if (bytes.length > memoMaxBlob) build
    else {
      val m = deserMemo.get()
      val k = new BlobKey(tag, bytes)
      val v = m.get(k)
      if (v != null) v.asInstanceOf[T]
      else { val nv = build; m.put(k, nv); nv }
    }
  }

  /** Widen a C++ `tdigest<float>` blob (reference float lane,
    * `codegen/generator.py:46-47` — 4-byte min/max/centroid-means) to the
    * double-lane wire format datasketches-java reads. The two lanes share
    * the 8-byte preamble (preamble-longs, serVer, type=20, K, flags) and
    * differ only in the width of T fields, so the lane is sniffed
    * unambiguously from the total length:
    *   empty:  8 bytes, lane-agnostic;
    *   single: 8 + 4 (float) vs 8 + 8 (double);
    *   multi:  8 + 8 (numCentroids+unused) + 2·4 (min,max) + n·(4+8)
    *           vs 8 + 8 + 2·8 + n·(8+8) — 24+12n ≠ 32+16n for all n ≥ 0.
    * Double-lane (or unrecognized) input is returned untouched; the
    * deserializer's own error contract then applies. */
  def tdigestWiden(b: Array[Byte]): Array[Byte] = {
    if (b.length < 8 || (b(2) & 0xFF) != 20) return b
    val flags = b(5) & 0xFF
    val isEmpty = (flags & 1) != 0
    val isSingle = (flags & 2) != 0
    val in = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // widened size: each 4-byte T field gains 4 bytes
    def out(tFields: Int): java.nio.ByteBuffer = {
      val o = java.nio.ByteBuffer.allocate(b.length + 4 * tFields)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      o.put(b, 0, 8) // preamble is lane-invariant
      o
    }
    if (isEmpty) b
    else if (isSingle && b.length == 12) {
      val o = out(1)
      o.putDouble(in.getFloat(8).toDouble)
      o.array()
    } else if (!isSingle && b.length >= 16) {
      val n = in.getInt(8)
      if (n <= 0 || b.length != 24 + 12 * n) return b
      // The length test alone can collide with a TRUNCATED double-lane
      // blob (any 24+12n length). Validate the float interpretation's
      // invariants — finite ordered min/max, means inside [min, max],
      // positive weights — before accepting it; reinterpreted garbage
      // bytes fail these, fall through untouched, and hit the
      // deserializer's own error contract instead of decoding silently.
      val mn = in.getFloat(16); val mx = in.getFloat(20)
      var valid = java.lang.Float.isFinite(mn) && java.lang.Float.isFinite(mx) && mn <= mx
      var i = 0
      while (valid && i < n) {
        val m = in.getFloat(24 + 12 * i); val w = in.getLong(24 + 12 * i + 4)
        valid = java.lang.Float.isFinite(m) && m >= mn && m <= mx && w > 0
        i += 1
      }
      if (!valid) return b
      val o = out(2 + n)
      o.put(b, 8, 8) // numCentroids + unused
      o.putDouble(mn.toDouble)
      o.putDouble(mx.toDouble)
      i = 0
      while (i < n) {
        val base = 24 + 12 * i
        o.putDouble(in.getFloat(base).toDouble) // mean
        o.putLong(in.getLong(base + 4)) // weight (uint64, lane-invariant)
        i += 1
      }
      o.array()
    } else b
  }

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
    * recover family + element type — and, for long-lane sketches over
    * narrow integral columns, the original input type so element-typed
    * probes return it (reference `codegen/generator.py:558-563`). */
  def sketchMetadata(family: String, elem: Option[ElemType],
                     inputTag: Option[String] = None): Metadata =
    sketchMetadataTags(family, elem.map(_.tag), inputTag)

  def sketchMetadataTags(family: String, elemTag: Option[String],
                         inputTag: Option[String] = None): Metadata = {
    val b = new MetadataBuilder().putString("sketchFamily", family)
    elemTag.foreach(t => b.putString("sketchElementType", t))
    inputTag.foreach(t => b.putString("sketchInputType", t))
    b.build()
  }
}
