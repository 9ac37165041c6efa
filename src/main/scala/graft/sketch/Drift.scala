package graft.sketch

import org.apache.datasketches.kll.{KllDoublesSketch, KllFloatsSketch}
import org.apache.datasketches.quantiles.DoublesSketch
import org.apache.datasketches.quantilescommon.{KolmogorovSmirnov, QuantilesAPI}
import org.apache.datasketches.req.ReqSketch
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

import Kit._

/** Two-sample Kolmogorov–Smirnov distance between quantile sketches —
  * the sketch-native distribution-drift probe (beyond-parity surface,
  * SURVEY §7.4: the reference computes KS manually from CDF probes in
  * its tests; datasketches-java ships the closed form over the sketches'
  * sorted views).
  *
  * `datasketch_{kll,quantiles,req}_ks(a, b)` return the KS delta (max
  * CDF distance, in [0,1]); the `_ks_test(a, b, p)` forms return the
  * library's reject/accept decision at target p-value `p`. Lanes: KLL
  * double + float (the two KS overloads the library defines), classic
  * quantiles double, REQ (float-native; delta only — REQ's relative
  * rank error admits no constant-epsilon threshold, so `_ks_test`
  * bind-errors, mirroring the library's own rejection). Either-side-
  * empty → NULL
  * (there is no CDF to compare — the same shape as the families'
  * per-family empty finalize, pinned in DriftTfIdfSpec).
  *
  * Why this is the 100 TB answer: the exact two-sample KS needs a global
  * ECDF (a sort or a two-level prefix scan over ALL rows every time the
  * question is asked), while the sketch form compares two KB-sized
  * mergeable summaries that the pipeline is typically already building —
  * week-over-week drift becomes a scalar probe over stored blobs.
  */
case class KsScalar(family: String, fn: String, elem: ElemType, children: Seq[Expression])
    extends SketchScalar {

  override def prettyName: String =
    s"datasketch_${family}_ks" + (if (fn == "test") "_test" else "")

  override def dataType: DataType = fn match {
    case "delta" => DoubleType
    case "test"  => BooleanType
    case other   => throw new IllegalArgumentException(s"unknown ks fn '$other'")
  }

  private def kllD(bytes: Array[Byte]): KllDoublesSketch =
    memoDeser("ks/kll/double", bytes)(
      deser("KLL", bytes)(KllDoublesSketch.heapify(mem(bytes))))
  private def kllF(bytes: Array[Byte]): KllFloatsSketch =
    memoDeser("ks/kll/float", bytes)(
      deser("KLL", bytes)(KllFloatsSketch.heapify(mem(bytes))))
  private def classicD(bytes: Array[Byte]): DoublesSketch =
    memoDeser("ks/quantiles/double", bytes)(
      deser("Quantiles", bytes)(DoublesSketch.heapify(mem(bytes))))
  private def req(bytes: Array[Byte]): ReqSketch =
    memoDeser("ks/req", bytes)(
      deser("REQ", bytes)(ReqSketch.heapify(mem(bytes))))

  override def compute(args: Array[Any]): Any = {
    val ba = args(0).asInstanceOf[Array[Byte]]
    val bb = args(1).asInstanceOf[Array[Byte]]
    (family, elem) match {
      case ("kll", ElemType.Flt) =>
        val (s1, s2) = (kllF(ba), kllF(bb))
        finish(s1, s2, KolmogorovSmirnov.computeKSDelta(s1, s2), args)
      case ("kll", _) =>
        val (s1, s2) = (kllD(ba), kllD(bb))
        finish(s1, s2, KolmogorovSmirnov.computeKSDelta(s1, s2), args)
      case ("req", _) =>
        val (s1, s2) = (req(ba), req(bb))
        finish(s1, s2, KolmogorovSmirnov.computeKSDelta(s1, s2), args)
      case _ =>
        val (s1, s2) = (classicD(ba), classicD(bb))
        finish(s1, s2, KolmogorovSmirnov.computeKSDelta(s1, s2), args)
    }
  }

  /** delta is by-name: never forced when either side is empty (the
    * library's sorted-view accessors throw on an empty sketch). */
  private def finish(s1: QuantilesAPI, s2: QuantilesAPI, delta: => Double,
                     args: Array[Any]): Any =
    if (s1.isEmpty || s2.isEmpty) null
    else fn match {
      case "delta" => delta
      case "test" =>
        KolmogorovSmirnov.kolmogorovSmirnovTest(s1, s2, args(2).asInstanceOf[Double])
    }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}
