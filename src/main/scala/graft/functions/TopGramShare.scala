package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native boilerplate detector — SQL `top_gram_share(grams)` → the
  * frequency share of the single most common gram, NULL for an empty
  * array (the `array_max([])` convention the portable chain follows).
  *
  * Replaces `array_max(transform(array_distinct(g), x ->
  * size(filter(g, y -> y = x)))) / size(g)` — O(distinct × total) string
  * comparisons through interpreted HigherOrderFunction closures — with ONE
  * hash-counting pass (O(total)), which is the asymptotic fix, not just a
  * constant-factor one: a pathological boilerplate doc with thousands of
  * distinct grams stops being quadratic. Share values are identical
  * (max count / total as double). */
case class TopGramShare(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_gram_share requires array<string>, got $other")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "top_gram_share"

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return null
    val arr = raw.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // array_max([]) convention
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var max = 0
    var i = 0
    while (i < n) {
      val g = arr.getUTF8String(i)
      if (g != null) {
        // clone: unsafe-backed UTF8Strings may share a reused buffer
        val c = counts.merge(g.clone(), 1, (a, b) => a + b)
        if (c > max) max = c
      }
      i += 1
    }
    if (max == 0) null else max.toDouble / n
  }

  override protected def withNewChildInternal(newChild: Expression): TopGramShare =
    copy(child = newChild)
}
