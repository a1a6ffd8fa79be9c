package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity — SQL `cosine_sim(a, b)` → double; NULL when
  * either vector has zero norm (the `try_divide` convention: degenerate
  * vectors sort LAST under `desc`), when lengths differ, or when an
  * element is NULL (exactly what the portable
  * `try_divide(aggregate(zip_with(...)), sqrt(...)*sqrt(...))` chain
  * yields in those cases).
  *
  * One fused loop computes the dot product and both squared norms —
  * replacing THREE `aggregate(zip_with(...))` HigherOrderFunction stacks
  * (interpreted per element, boxed accumulators) that each rescan the
  * vectors. This is the scan kernel of the whole similarity family
  * (brute-force top-k, IVF probes, dup mining), so it is the operator the
  * 100 TB scan spends its cycles in. Accumulation order matches the
  * lambda chain (sequential, index-ascending), so scores are
  * bit-identical and every oracle contract is unchanged. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private def okElem(dt: DataType): Boolean =
    dt == FloatType || dt == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(le, _), ArrayType(re, _)) if okElem(le) && okElem(re) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float|double> columns, got $other")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val aRaw = left.eval(input)
    val bRaw = right.eval(input)
    if (aRaw == null || bRaw == null) return null
    val a = aRaw.asInstanceOf[ArrayData]
    val b = bRaw.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with would pad nulls → null
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) null else dot / denom // try_divide convention
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
