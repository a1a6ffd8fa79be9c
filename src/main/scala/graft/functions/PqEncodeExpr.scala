package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoder — SQL `pq_encode(vec, codebook, nSub)` →
  * `array<int>` of 1-BASED nearest-codeword indices per subspace
  * (squared L2 over the subspace slice; ties and NaN resolve exactly like
  * the portable lambda chain it replaces: codes scan ascending against a
  * `(+∞, code 0)` accumulator under strict `<`, so the smallest code wins
  * a tie and an all-NaN row encodes 0).
  *
  * The portable `transform(sequence(...), aggregate(zip_with(...)))`
  * pipeline it replaces is a stack of `HigherOrderFunction`s — interpreted
  * per ELEMENT with closure dispatch and boxed accumulators. This is one
  * flat primitive loop per row (nSub × nCode × dsub fused multiply-adds
  * over unboxed doubles), which is what turns PQ encoding from the
  * second-costliest bench key into scan-bound work. Distance math is
  * double-precision in the same order as the lambda chain, so results are
  * bit-identical and the DuckDB oracle contract is unchanged.
  */
case class PqEncodeExpr(first: Expression, second: Expression,
                        third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _), IntegerType)
          if third.foldable => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure("pq_encode requires foldable nSub")
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (array<float|double>, array<array<double>>, int), got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = first.nullable || second.nullable
  override def prettyName: String = "pq_encode"

  @transient private lazy val vecIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val nSub: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v >= 1, s"pq_encode nSub must be >= 1, got $v"); v
  }

  override def eval(input: InternalRow): Any = {
    val vRaw = first.eval(input)
    val cbRaw = second.eval(input)
    if (vRaw == null || cbRaw == null) return null
    val vec = vRaw.asInstanceOf[ArrayData]
    val cb = cbRaw.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    require(dim % nSub == 0, s"pq_encode: dim $dim not divisible by nSub $nSub")
    val dsub = dim / nSub
    val nCode = cb.numElements()
    // unbox once per row; codewords are full-dim vectors sliced per subspace
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val cws = new Array[Array[Double]](nCode)
    var c = 0
    while (c < nCode) {
      cws(c) = cb.getArray(c).toDoubleArray()
      require(cws(c).length == dim,
        s"pq_encode: codeword ${c + 1} has dim ${cws(c).length}, vector has $dim")
      c += 1
    }
    val out = new Array[Int](nSub)
    var s = 0
    while (s < nSub) {
      val off = s * dsub
      var best = Double.PositiveInfinity
      var bestC = 0
      c = 0
      while (c < nCode) {
        val cw = cws(c)
        var d = 0.0
        var k = 0
        while (k < dsub) {
          val diff = v(off + k) - cw(off + k)
          d += diff * diff
          k += 1
        }
        if (d < best) { best = d; bestC = c + 1 } // strict <: smallest code wins ties
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqEncodeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
