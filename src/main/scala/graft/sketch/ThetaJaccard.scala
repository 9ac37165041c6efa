package graft.sketch

import org.apache.datasketches.theta
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import Kit._

/** `datasketch_theta_jaccard(a, b)` → [lower_bound, estimate, upper_bound].
  *
  * Beyond-parity operator (SURVEY §7.4): the reference computes Jaccard
  * manually via estimate arithmetic (`test/sql/datasketch_theta.test:649-666`);
  * the DataSketches library has a dedicated bounded estimator
  * (`JaccardSimilarity`) with proper error bounds, which is what a 100 TB
  * dedup/overlap pipeline should use instead of the ratio of two noisy
  * estimates. */
case class ThetaJaccard(children: Seq[Expression]) extends SketchScalar {

  override def prettyName: String = "datasketch_theta_jaccard"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def wrap(a: Any): theta.Sketch = {
    val b = a.asInstanceOf[Array[Byte]]
    memoDeser("theta", b)(deser("Theta", b)(theta.Sketches.wrapSketch(mem(b))))
  }

  override def compute(args: Array[Any]): Any = {
    val r = org.apache.datasketches.theta.JaccardSimilarity.jaccard(
      wrap(args(0)), wrap(args(1)))
    new GenericArrayData(r)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}
