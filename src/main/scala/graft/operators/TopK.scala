package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims.{column, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded top-k selection per group as a partial-aggregable AGGREGATE,
  * not a window.
  *
  * The textbook "top k rows per group" plan — `row_number() OVER
  * (PARTITION BY g ORDER BY s DESC) <= k` — shuffles EVERY row to its
  * group's reducer and sorts the whole group, only to discard all but k
  * rows. At 100 TB that is a full-data shuffle whose sort spills on every
  * hot group. [[TopKByAgg]] instead keeps a k-bounded min-heap as the
  * aggregation buffer, so the map side combines each partition down to
  * ≤ k candidates per group BEFORE the exchange: the shuffle carries at
  * most `partitions × groups × k` tiny rows and the reducer merges heaps
  * in O(k) memory per group. Same answer, no full-data sort, bounded
  * state — the hash aggregate can never spill more than k entries per
  * group.
  *
  * Ordering contract (what makes the result deterministic and
  * oracle-checkable): candidates rank by score DESC, ties broken by id
  * ASC. The finalized value is the kept candidates best-first as
  * `array<struct<score double, id bigint>>`; [[TopK.perGroup]] explodes
  * that to (group, rnk, id, score) rows — the exact shape of the window
  * formulation it replaces.
  */
case class TopKByAgg(
    k: Int,
    score: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByAgg.Heap] {

  require(k >= 1, s"graft_topk_by: k must be >= 1, got $k")

  override def prettyName: String = "graft_topk_by"
  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = TopK.entryArrayType

  override def createAggregationBuffer(): TopKByAgg.Heap = new TopKByAgg.Heap(k)

  override def update(buf: TopKByAgg.Heap, input: InternalRow): TopKByAgg.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByAgg.Heap, other: TopKByAgg.Heap): TopKByAgg.Heap = {
    var j = 0
    while (j < other.size) { buf.offer(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKByAgg.Heap): Any = {
    val (ss, ii) = buf.sortedBestFirst()
    val out = new Array[Any](ss.length)
    var j = 0
    while (j < ss.length) {
      out(j) = new GenericInternalRow(Array[Any](ss(j), ii(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 4-byte n, then n (double score, long id) pairs. k travels in the
    * expression, not the bytes — merge targets already know it. */
  override def serialize(buf: TopKByAgg.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByAgg.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKByAgg.Heap(k)
    var j = 0
    while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByAgg {

  /** k-bounded binary min-heap over (score, id) with root = WORST kept
    * candidate under the rank order (score DESC, id ASC): a new candidate
    * enters iff it beats the root, evicting it. Parallel primitive arrays
    * — no boxing on the update path. */
  final class Heap(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** a=(s1,i1) ranks strictly better than b=(s2,i2)? Total order via
      * Double.compare — NaN ranks greatest, exactly like Spark's
      * DoubleType sort — so a NaN score can always be evicted/compared
      * (IEEE `>` is false in BOTH directions for NaN, which would wedge
      * a NaN at the root forever). */
    @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def offer(s: Double, i: Long): Unit = {
      if (size < k) {
        // grow: sift the new leaf up (heap order = worst at root)
        var c = size
        scores(c) = s; ids(c) = i
        size += 1
        while (c > 0) {
          val p = (c - 1) / 2
          if (beats(scores(p), ids(p), scores(c), ids(c))) {
            val ts = scores(p); val ti = ids(p)
            scores(p) = scores(c); ids(p) = ids(c)
            scores(c) = ts; ids(c) = ti
            c = p
          } else c = 0
        }
      } else if (beats(s, i, scores(0), ids(0))) {
        // replace root, sift down
        scores(0) = s; ids(0) = i
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1; val r = l + 1
          var worst = p
          if (l < size && beats(scores(worst), ids(worst), scores(l), ids(l))) worst = l
          if (r < size && beats(scores(worst), ids(worst), scores(r), ids(r))) worst = r
          if (worst == p) done = true
          else {
            val ts = scores(p); val ti = ids(p)
            scores(p) = scores(worst); ids(p) = ids(worst)
            scores(worst) = ts; ids(worst) = ti
            p = worst
          }
        }
      }
    }

    /** Kept candidates, best first (score DESC, id ASC). */
    def sortedBestFirst(): (Array[Double], Array[Long]) = {
      val idx = Array.range(0, size).sortWith { (a, b) =>
        beats(scores(a), ids(a), scores(b), ids(b))
      }
      (idx.map(scores), idx.map(ids))
    }
  }
}

object TopK {

  val entryType: StructType =
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false)))
  val entryArrayType: DataType = ArrayType(entryType, containsNull = false)

  /** `graft_topk_by(k, score, id)` as a Column. */
  def topkBy(k: Int, score: Column, id: Column): Column =
    column(TopKByAgg(k,
        toExpression(score.cast("double")), toExpression(id.cast("long")))
      .toAggregateExpression())

  /** Top k rows per group, exploded back to rows: (groupCols…, rnk, id,
    * score) with rnk 1-based best-first. Equivalent to the
    * `row_number() <= k` window — minus the full-data shuffle+sort. */
  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
               idCol: String, k: Int): DataFrame = {
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(topkBy(k, col(scoreCol), col(idCol)).as("topk"))
    grouped
      .select(groupCols.map(col) :+ posexplode(col("topk")).as(Seq("pos", "entry")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rnk"),
        col("entry.id").as("id"),
        col("entry.score").as("score")): _*)
  }
}
