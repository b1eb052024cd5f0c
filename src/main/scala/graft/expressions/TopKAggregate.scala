package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-by-score aggregate (custom-operator ladder rung (b)):
  * `top_k_pairs(score, id, k)` keeps, per group, the `k` entries with the
  * highest `(score DESC, id ASC)` order and returns them sorted, as
  * `array<struct<id: bigint, score: double>>`.
  *
  * Why this exists: the DataFrame idiom for per-group top-k —
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k` — must
  * shuffle and sort EVERY candidate row to the group's reducer before any
  * can be discarded. For top-k over a generated candidate space (kNN-graph
  * scoring, LSH/IVF probe results) the candidate set is orders of magnitude
  * larger than `groups × k`, so at 100 TB the window's exchange is the
  * widest stage of the whole job. This aggregate instead folds candidates
  * into a k-bounded ordered buffer INSIDE the partial-aggregation pass
  * (map-side, before the exchange), so the shuffle carries at most
  * `partitions × groups × k` tiny entries — the exchange width no longer
  * depends on the candidate count at all.
  *
  * Semantics:
  *   - ordering is total and deterministic: score descending, id ascending;
  *   - EXACT duplicates (same id AND same score) collapse to one entry —
  *     the natural contract for multi-probe candidate generation, where the
  *     same neighbour reached via several buckets carries the same score;
  *   - null score or null id inputs are ignored;
  *   - partial buffers merge by set-union + re-trim, so the result is
  *     invariant to partitioning (property-tested in PropertySpec).
  *
  * Buffer is a sorted set capped at k; serialization is a flat
  * (size, (score, id)*) byte image, so spill/exchange of partial states is
  * cheap and stable.
  */
case class TopKPairs(left: Expression, right: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k > 0, s"top_k_pairs: k must be positive, got $k")

  private def score: Expression = left
  private def id: Expression = right

  // best-first total order: score desc, then id asc
  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.TreeSet[(Double, Long)] =
    mutable.TreeSet.empty[(Double, Long)](ord)

  private def add(buf: mutable.TreeSet[(Double, Long)],
                  e: (Double, Long)): Unit = {
    // cheap reject: full buffer and e is worse than the current worst
    if (buf.size >= k && ord.compare(e, buf.last) >= 0) ()
    else {
      buf += e
      if (buf.size > k) buf -= buf.last
    }
  }

  override def update(buf: mutable.TreeSet[(Double, Long)],
                      input: InternalRow): mutable.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[(Double, Long)],
                     other: mutable.TreeSet[(Double, Long)]): mutable.TreeSet[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.map { case (s, i) =>
      InternalRow(i, s)
    })

  override def serialize(buf: mutable.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf += ((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_pairs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: id must be BIGINT, got ${id.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
}
