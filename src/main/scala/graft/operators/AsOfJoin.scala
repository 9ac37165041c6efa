package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** As-of (time-travel) join: for every left row, attach the latest right
  * row with the same key and `right.time <= left.time` (inclusive).
  *
  * The classic need — join events to the most recent state snapshot,
  * clicks to the last preceding impression, trades to quotes — has no
  * native Spark operator, and the naive formulations collapse at scale:
  * a range join (`l.k = r.k AND r.t <= l.t`) explodes to one row per
  * (left, earlier-right) pair before aggregation, and a per-key collect
  * serializes whole histories.
  *
  * This implementation is the union + window shape: tag each side, union
  * them (concatenation, no shuffle), then one window over
  * `partitionBy(key) orderBy(time, side)` carries the last non-null right
  * payload forward into each left row. Cost at 100 TB: exactly ONE
  * shuffle of (left + right) rows hash-partitioned by key — the same
  * price as the equi-join everyone already pays — and a per-partition
  * sort; nothing quadratic, no per-key memory beyond the sort spill,
  * AQE skew-split applies to hot keys. Rights sort before lefts at equal
  * timestamps, so the match is inclusive, mirroring ASOF JOIN semantics
  * (e.g. DuckDB's `ON l.k = r.k AND l.t >= r.t`).
  *
  * Right rows should be unique per (key, time); among exact duplicates
  * the retained one is arbitrary (as in other engines' ASOF joins).
  */
object AsOfJoin {

  /** @param valueCols   right-side columns to attach; emitted under their
    *                    own names, or `name + suffix` when the left side
    *                    already has that name. The matched right timestamp
    *                    is always attached as `timeCol + suffix`.
    * @param toleranceMs max lookback: matches older than this many
    *                    milliseconds before `left.time` become NULL
    *                    (timestamp time columns; for numeric time columns
    *                    the value is in the column's own units).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, timeCol: String, valueCols: Seq[String],
               toleranceMs: Option[Long] = None,
               suffix: String = "_right"): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin: valueCols must be non-empty")

    val rSchema = right.schema
    val rvType = StructType(
      StructField("__rts", rSchema(timeCol).dataType) +:
        valueCols.map(c => rSchema(c).copy(name = c)))
    val lrowType = left.schema

    val lTagged = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(rvType).as("__rv"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow"))
    val rTagged = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
      struct((col(timeCol).as("__rts") +: valueCols.map(col)).toIndexedSeq: _*).as("__rv"),
      lit(null).cast(lrowType).as("__lrow"))

    val w = Window.partitionBy("__k").orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val isTs = rSchema(timeCol).dataType == TimestampType
    val inTolerance = toleranceMs match {
      case None => lit(true)
      case Some(tol) if isTs =>
        unix_micros(col("__t")) - unix_micros(col("__m.__rts")) <= tol * 1000L
      case Some(tol) =>
        col("__t") - col("__m.__rts") <= lit(tol)
    }
    val withTol = matched.withColumn("__m",
      when(col("__m").isNotNull && inTolerance, col("__m")))

    val leftCols = left.columns.toSet
    def outName(c: String) = if (leftCols.contains(c)) c + suffix else c
    val out =
      left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        (col("__m.__rts").as(timeCol + suffix) +:
          valueCols.map(c => col(s"__m.$c").as(outName(c))))
    withTol.select(out.toIndexedSeq: _*)
  }
}
