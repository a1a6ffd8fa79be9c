package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Position-bitset builder as a native Catalyst `TypedImperativeAggregate`
  * — `bitset_agg(pos)` → `array<bigint>` where word `w` bit `b` is set iff
  * position `w*64 + b` appeared in the group. The aggregate behind
  * deletion-vector construction
  * ([[graft.table.GraftTableGenerator.rewritePositionDeletesToDVs]]).
  *
  * Being a real aggregate (not `collect_list` + a driver fold) means
  * map-side PARTIAL aggregation: each map task builds per-group partial
  * bitmaps locally and the shuffle carries one packed blob per
  * (group × task) — independent of how many positions the task saw.
  * `merge` is a word-wise OR. Per-buffer memory is one file's bitset
  * (maxPos/8 bytes), bounded by file row count, never by table size.
  *
  * Duplicate positions are naturally idempotent (set bit twice = set), so
  * upstream need not de-duplicate tombstones.
  */
case class BitsetAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def grown(buf: Array[Long], wordsNeeded: Int): Array[Long] =
    if (wordsNeeded <= buf.length) buf
    else {
      val g = new Array[Long](
        math.max(wordsNeeded, math.max(2, buf.length * 2)))
      System.arraycopy(buf, 0, g, 0, buf.length)
      g
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val p = v.asInstanceOf[Long]
      require(p >= 0, s"bitset_agg position must be >= 0, got $p")
      val w = (p >>> 6).toInt
      val b = grown(buf, w + 1)
      b(w) |= 1L << (p & 63)
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // always fold INTO (possibly grown) b1 — the framework owns b1; b2 is
    // a deserialized input buffer this aggregate shouldn't alias
    val r = grown(b1, b2.length)
    var i = 0
    while (i < b2.length) { r(i) |= b2(i); i += 1 }
    r
  }

  /** Trailing zero words are trimmed so the stored vector is exactly as
    * long as its highest set bit needs. */
  private def trimmed(buf: Array[Long]): Array[Long] = {
    var n = buf.length
    while (n > 0 && buf(n - 1) == 0L) n -= 1
    if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(trimmed(buf))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val t = trimmed(buf)
    val bb = java.nio.ByteBuffer.allocate(t.length * 8)
    bb.asLongBuffer().put(t)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): BitsetAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitsetAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitsetAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bitset_agg"
}
