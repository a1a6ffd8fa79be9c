package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a NATIVE Catalyst
  * `TypedImperativeAggregate` — SQL name `misra_gries(term, capacity)` →
  * `array<struct<term string, cnt_lb bigint>>` (counts are LOWER bounds,
  * sorted by descending count then term).
  *
  * Being a real aggregate function (not a `mapPartitions` pre-pass) means
  * Spark runs it with map-side PARTIAL aggregation and merges SERIALIZED
  * SKETCH BUFFERS: the shuffle carries one ≤`capacity`-entry blob per map
  * task, independent of vocabulary size — at 100 TB that replaces a
  * capacity×partitions row exchange with a buffer per partition, and the
  * sketch composes with `groupBy` keys for free (per-source heavy hitters
  * in one pass).
  *
  * Algorithm (the classic summary, mergeable form): `update` keeps at most
  * `capacity` counters — an unseen term beyond capacity decrements every
  * counter and drops zeros (amortized O(1)/token; any term undercounts by
  * at most inputTokens/capacity). `merge` sums counts, then if over
  * capacity subtracts the (capacity+1)-th largest count from every entry
  * and drops non-positives — the standard mergeable-summaries reduction,
  * which preserves the lower-bound property with additive error. A true
  * heavy hitter (freq > totalTokens/capacity) always survives; with
  * `capacity` ≥ the vocabulary the sketch is exact (both spec-gated).
  */
case class MisraGriesAgg(
    child: Expression,
    capacityExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val capacity: Int = {
    require(capacityExpr.foldable, "misra_gries capacity must be a literal")
    val c = capacityExpr.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"misra_gries capacity must be an integer literal, got $other")
    }
    require(c > 0, s"misra_gries capacity must be positive, got $c")
    c
  }

  override def children: Seq[Expression] = Seq(child, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt_lb", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < capacity => buf.update(t, 1L)
        case None => // decrement step pays for the unadmitted insert
          val ks = buf.keysIterator.toArray
          var i = 0
          while (i < ks.length) {
            val c = buf(ks(i)) - 1
            if (c == 0) buf.remove(ks(i)) else buf.update(ks(i), c)
            i += 1
          }
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > capacity) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val ks = b1.keysIterator.toArray
      var i = 0
      while (i < ks.length) {
        val c = b1(ks(i)) - d
        if (c <= 0) b1.remove(ks(i)) else b1.update(ks(i), c)
        i += 1
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), c)) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
  override def prettyName: String = "misra_gries"
}
