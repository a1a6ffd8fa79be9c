package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment — `nearest_cell(vec, cids, cvs)` →
  * the `cid` whose centroid has the highest cosine with `vec`, with
  * EXACTLY the tie/degenerate rules of the portable lambda chain it
  * replaces in [[graft.ext.Similarity]] (`assignCells`): an undefined
  * cosine (zero-norm vector or centroid, or NaN) scores −1e308 so every
  * row lands in a real cell, and strict `>` over cid-ascending order
  * makes the smallest cid win ties. `cids`/`cvs` must be FOLDABLE
  * cid-sorted literals — they unbox ONCE per operator
  * (the lambda chain re-walked a 256-struct array with boxed
  * accumulators per ROW; measured on the 10^6-vector IVF build this
  * expression turns a ~280 s assignment pass into scan-bound work).
  * Double math runs in the same order as the chain, so assignments are
  * bit-identical and every existing oracle holds. */
case class NearestCellExpr(first: Expression, second: Expression,
                           third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(LongType, _),
            ArrayType(ArrayType(DoubleType, _), _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_cell requires (array<float|double>, foldable array<bigint>, " +
          s"foldable array<array<double>>), got $other")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "nearest_cell"

  @transient private lazy val vecIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // centroids unbox ONCE per operator instance, not per row
  @transient private lazy val cids: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cvs: Array[Array[Double]] = {
    val raw = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(raw.numElements())(i => raw.getArray(i).toDoubleArray())
  }
  @transient private lazy val cnorms: Array[Double] = cvs.map { cv =>
    var s = 0.0; var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }

  override def eval(input: InternalRow): Any = {
    val vRaw = first.eval(input)
    if (vRaw == null) return null
    val vec = vRaw.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var vn = 0.0
    i = 0
    while (i < dim) { vn += v(i) * v(i); i += 1 }
    vn = math.sqrt(vn)
    var best = Double.NegativeInfinity
    var bestCid = -1L
    var c = 0
    while (c < cids.length) {
      val cv = cvs(c)
      val cn = cnorms(c)
      var sim = -1.0e308
      if (cn != 0.0 && vn != 0.0) {
        var d = 0.0
        var k = 0
        val n = math.min(dim, cv.length)
        while (k < n) { d += v(k) * cv(k); k += 1 }
        val s = d / (vn * cn)
        if (!s.isNaN) sim = s
      }
      if (sim > best) { best = sim; bestCid = cids(c) }
      c += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCellExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
