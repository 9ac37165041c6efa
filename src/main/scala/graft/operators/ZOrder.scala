package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) multi-dimensional data layout.
  *
  * A 100 TB table range-partitioned and sorted on ONE column prunes scans
  * on that column only; filters on any other dimension read everything.
  * Interleaving the bits of several quantized dimensions into one sort
  * key makes rows that are close in EVERY dimension land in the same
  * files, so parquet min/max row-group statistics prune scans on EACH
  * participating dimension — the standard lakehouse layout trick
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`), here as a plain column + a
  * `repartitionByRange` writer that any Spark sink can use.
  *
  * Layout is a WRITE-side cost paid once: the z-key is map-side codegen'd
  * arithmetic, the range partitioning is one shuffle of the rows being
  * written anyway, and nothing changes on the read path — scans just
  * prune more.
  */
object ZOrder {

  /** Max dims: 4 × 15 bits = 60 key bits keeps the key a positive LONG
    * and covers the practical layout arities (2-4 clustering columns). */
  val MaxDims = 4

  /** Quantize a numeric column to the [0, 2^bits) lane expected by
    * [[zorderKey]], given fixed bounds (from table stats / RangeBounds).
    * Out-of-bounds values clamp to the edge cells — layout quality for
    * stragglers, never an error on the write path. NULL and NaN inputs
    * propagate as NULL (matching [[ZOrderKey]], which nulls the whole key
    * on a null dimension) rather than silently piling into cell 0. */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    require(max > min, s"need max > min, got [$min, $max]")
    val cells = (1L << bits).toDouble
    val d = c.cast("double")
    val clamped = least(greatest(
        floor((d - lit(min)) / lit(max - min) * lit(cells)).cast("long"),
        lit(0L)),
      lit((1L << bits) - 1))
    when(d.isNull || isnan(d), lit(null).cast("long")).otherwise(clamped)
  }

  /** The Morton key column: bit j of dimension i lands at position
    * j*dims + i (dimension 0 least significant). Each input must already
    * be a LONG in [0, 2^bits) — [[quantize]] produces that lane. */
  def zorderKey(bits: Int, dims: Column*): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(ZOrderKey(dims.map(GraftShims.expression), bits))
  }

  /** Range-partition + sort by the z-key: the clustered-write shape.
    * `partitionCols` survive downstream as ordinary columns; the z-key
    * itself is dropped after ordering (it is derivable, not data). */
  def layoutBy(df: DataFrame, bits: Int, numPartitions: Int,
               dims: Column*): DataFrame = {
    val keyed = df.withColumn("__graft_zkey", zorderKey(bits, dims: _*))
    keyed.repartitionByRange(numPartitions, col("__graft_zkey"))
      .sortWithinPartitions("__graft_zkey")
      .drop("__graft_zkey")
  }
}

/** `graft_zorder(bits, d0, d1, …)` — interleave 2-4 LONG dimensions into
  * one Morton key. Fails (not clamps) on out-of-range dimension values:
  * a silent clamp HERE would corrupt locality invisibly, and the caller
  * controls quantization ([[ZOrder.quantize]] clamps where that is the
  * right call). */
case class ZOrderKey(children: Seq[Expression], bits: Int) extends Expression {

  override def prettyName: String = "graft_zorder"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > ZOrder.MaxDims)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder takes 2 to ${ZOrder.MaxDims} dimension columns, got ${children.size}")
    else if (bits < 1 || children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder: ${children.size} dims × $bits bits must fit 63 key bits")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder dimensions must be BIGINT (quantize first), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var key = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      key |= GraftRuntime.zorderSpread(v.asInstanceOf[Long], bits, n, i)
      i += 1
    }
    key
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val key = ctx.freshName("zkey")
    val anyNull = ctx.freshName("zNull")
    val parts = evals.zipWithIndex.map { case (e, i) =>
      code"""
        |${e.code}
        |if (${e.isNull}) { $anyNull = true; } else if (!$anyNull) {
        |  $key |= graft.operators.GraftRuntime.zorderSpread(${e.value}, ${bits.toString}, ${n.toString}, ${i.toString});
        |}"""
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        |boolean $anyNull = false;
        |long $key = 0L;
        |$parts
        |final boolean ${ev.isNull} = $anyNull;
        |final long ${ev.value} = $key;
        |""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
