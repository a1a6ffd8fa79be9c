package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 16-bit SimHash over a token-hash array — SQL
  * `simhash16(hashes)` → int. Bit b is set iff tokens whose hash has bit
  * b set are at least half of all tokens (majority vote, ties set the
  * bit; an EMPTY array sets every bit → 65535, exactly the portable
  * chain's `2*0 >= 0` behavior, so empty docs keep their bucket).
  *
  * Replaces sixteen `size(filter(hs, h -> (shiftright(h, b) & 1) = 1))`
  * passes — 16 × length interpreted closure calls per row — with ONE loop
  * accumulating all 16 bit counts. */
case class Simhash16Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires array<bigint>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash16"

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return null
    val arr = raw.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 16) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) {
      if (2 * counts(b) >= n) out |= (1 << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash16Expr =
    copy(child = newChild)
}
