package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k as a partial-aggregable `TypedImperativeAggregate`.
  *
  * The window alternative (`row_number() over (partition by g order by
  * score desc)` then `rk <= k`) sorts EVERY candidate of a group and
  * shuffles them all to the group's reducer — at ANN scale that is the
  * full scored corpus per query. This aggregate keeps a k-entry binary
  * heap per group: map-side partials trim each partition's candidates to
  * k before the exchange, so the shuffle carries at most
  * `k × partitions` rows per group and state is O(k) throughout.
  * Determinism: ordering is (score desc, id asc) with both compared
  * exactly, so the result is input-order-free — required for correct
  * partial merges.
  */
object TopKAgg {

  /** Binary min-heap keyed by (score asc, id desc): the root is the worst
    * retained entry, and an incoming candidate replaces it only if it
    * beats it. O(log k) per row, O(k) state.
    */
  final class TopKBuf(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var n = 0

    /** True iff (s1, id1) ranks strictly better than (s2, id2).
      * `Double.compare` (not `>`/`==`): it is a TOTAL order — NaN sorts
      * above every value and equal to itself, matching Spark's own sort
      * ordering (a NaN cosine ranks first in a score-desc window), and
      * keeps the comparator transitive for the eval-time sort (IEEE `>`
      * is false for every NaN comparison, which would both silently drop
      * NaN candidates from a full heap and break sortWith's contract).
      */
    @inline private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && id1 < id2)
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        // heap order: parent is worse-or-equal than child
        if (better(scores(p), ids(p), scores(i), ids(i))) {
          val ts = scores(p); scores(p) = scores(i); scores(i) = ts
          val ti = ids(p); ids(p) = ids(i); ids(i) = ti
          i = p
        } else i = 0
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // worst of the triple
        if (l < n && better(scores(w), ids(w), scores(l), ids(l))) w = l
        if (r < n && better(scores(w), ids(w), scores(r), ids(r))) w = r
        if (w == i) done = true
        else {
          val ts = scores(w); scores(w) = scores(i); scores(i) = ts
          val ti = ids(w); ids(w) = ids(i); ids(i) = ti
          i = w
        }
      }
    }

    def insert(s: Double, id: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1
        siftUp(n - 1)
      } else if (k > 0 && better(s, id, scores(0), ids(0))) {
        scores(0) = s; ids(0) = id
        siftDown()
      }
    }

    /** Indices of the retained entries sorted best-first. */
    def sortedIndices: Array[Int] =
      Array.range(0, n).sortWith((a, b) => better(scores(a), ids(a), scores(b), ids(b)))

    def serialize(): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + n * 16)
      bb.putInt(k).putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object TopKBuf {
    def deserialize(bytes: Array[Byte]): TopKBuf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new TopKBuf(bb.getInt)
      val n = bb.getInt
      var i = 0
      while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
      buf
    }
  }

  final case class TopKByScore(score: Expression, id: Expression, k: Int,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKBuf] {
    require(k > 0, s"k must be positive: $k")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

    override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

    override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
      buf
    }

    override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
      var i = 0
      while (i < other.n) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
      buf
    }

    override def eval(buf: TopKBuf): Any =
      new GenericArrayData(buf.sortedIndices.map(i =>
        InternalRow(buf.scores(i), buf.ids(i))).toArray[Any])

    override def serialize(buf: TopKBuf): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): TopKBuf =
      TopKBuf.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(score = newChildren(0), id = newChildren(1))
    override def prettyName: String = "graft_topk"
  }

  /** Column builder: `array<struct<score double, id long>>` sorted
    * (score desc, id asc), at most k entries.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score.cast("double")),
      ColumnBridge.expression(id.cast("long")), k).toAggregateExpression())
}
