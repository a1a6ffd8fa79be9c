package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static digest helper shared by interpreted eval and generated code.
  * MessageDigest is not thread-safe → thread-local instance. */
object Md5Hash {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — numerically
    * IDENTICAL to `conv(substr(md5(hex), 1, 15), 16, 10)`: 15 hex chars =
    * the top 7.5 digest bytes = big-endian first 8 bytes >>> 4. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** md5 digest as 4 big-endian unsigned-32-bit values. */
  def lanes4(bytes: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var v = 0L
      var i = 4 * j
      while (i < 4 * j + 4) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
      out(j) = v
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native Catalyst expression: 60-bit md5-prefix hash of a binary column.
  *
  * Semantically equal to the built-in chain
  * `conv(substring(md5(x), 1, 15), 16, 10) cast long` (and to DuckDB's
  * `('0x'||substr(md5(x),1,15))::BIGINT` — the oracle contract is
  * unchanged), but skips the 32-char hex string materialization, the
  * substring copy, and the base-conversion parse — one digest, zero
  * intermediate allocations. Participates in whole-stage codegen via
  * [[doGenCode]] (SURVEY.md §4: preference order (b) — custom Expression
  * over UDF).
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5prefix64 requires binary input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5prefix64"

  protected override def nullSafeEval(input: Any): Any =
    Md5Hash.hash60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

/** Native expression: the md5 digest as 4 unsigned-32-bit lanes
  * (array<long>), numerically identical to
  * `('0x'||substr(md5(x), 1+8j, 8))::BIGINT` for j in 0..3 — one digest
  * feeds 4 MinHash lanes with no hex string in between. */
case class Md5Lanes4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5lanes4 requires binary input, got ${child.dataType}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5lanes4"

  protected override def nullSafeEval(input: Any): Any =
    Md5Hash.lanes4(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.lanes4($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes4 =
    copy(child = newChild)
}

object GraftFunctions {

  /** The native function family as (identifier, info, builder) descriptors —
    * one source of truth for both the live registry path below and the
    * `SparkSessionExtensions.injectFunction` path
    * (`graft.plans.GraftExtensions`). */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("md5prefix64"),
        new ExpressionInfo(classOf[Md5Prefix64].getName, "md5prefix64"),
        (exprs: Seq[Expression]) => Md5Prefix64(exprs.head)),
      (FunctionIdentifier("md5lanes4"),
        new ExpressionInfo(classOf[Md5Lanes4].getName, "md5lanes4"),
        (exprs: Seq[Expression]) => Md5Lanes4(exprs.head)),
      (FunctionIdentifier("norm_alnum"),
        new ExpressionInfo(classOf[NormAlnum].getName, "norm_alnum"),
        (exprs: Seq[Expression]) => NormAlnum(exprs.head)),
      (FunctionIdentifier("ngram_stats"),
        new ExpressionInfo(classOf[NgramStats].getName, "ngram_stats"),
        (exprs: Seq[Expression]) => NgramStats(exprs(0), exprs(1), exprs(2))),
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
        (exprs: Seq[Expression]) => MinhashSig(exprs(0), exprs(1), exprs(2), exprs(3))),
      (FunctionIdentifier("misra_gries"),
        new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
        (exprs: Seq[Expression]) => MisraGriesAgg(exprs(0), exprs(1))),
      (FunctionIdentifier("bitset_agg"),
        new ExpressionInfo(classOf[BitsetAgg].getName, "bitset_agg"),
        (exprs: Seq[Expression]) => BitsetAgg(exprs.head)),
      (FunctionIdentifier("pq_encode"),
        new ExpressionInfo(classOf[PqEncodeExpr].getName, "pq_encode"),
        (exprs: Seq[Expression]) => PqEncodeExpr(exprs(0), exprs(1), exprs(2))),
      (FunctionIdentifier("top_gram_share"),
        new ExpressionInfo(classOf[TopGramShare].getName, "top_gram_share"),
        (exprs: Seq[Expression]) => TopGramShare(exprs.head)),
      (FunctionIdentifier("simhash16"),
        new ExpressionInfo(classOf[Simhash16Expr].getName, "simhash16"),
        (exprs: Seq[Expression]) => Simhash16Expr(exprs.head)),
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
        (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))

  /** Idempotently register graft's native functions on a session (SQL name
    * `md5prefix64`). Called from every entry point AND defensively from
    * query builders, so the functions resolve under any host session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
    // built-in-chain → native-expression optimizer rewrites ride along
    graft.plans.GraftExtensionsLive.ensureInstalled(spark)
  }
}
