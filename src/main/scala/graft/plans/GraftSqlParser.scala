package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

import graft.catalog.GraftUpdateSpecDdl

/** Parser-injection shim (the same pattern Iceberg's Spark extensions
  * use): recognizes the partition-evolution DDL the vanilla Spark parser
  * refuses —
  *
  *   ALTER TABLE t ADD PARTITION FIELD <transform>
  *   ALTER TABLE t DROP PARTITION FIELD <transform>
  *   ALTER TABLE t REPLACE PARTITION FIELD <old> WITH <new>
  *
  * — and lowers it to [[GraftUpdateSpecDdl]] (executed by
  * `GraftDmlStrategy` through the engine's `updateSpec`, exactly like
  * `CALL graft.system.update_spec`). Everything else delegates verbatim,
  * so this shim adds zero cost and zero behavior change to normal SQL.
  * Table names parse through the DELEGATE's multipart-identifier rules
  * (backquotes and all), never by regex.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.partitionFieldDdl(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    GraftSqlParser.partitionFieldDdl(sqlText, delegate)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private val AddRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""".r
  private val ReplaceRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)\s*;?\s*$""".r

  /** Whitespace-free transform text, the engine's canonical spec-string
    * form (`bucket(4, id)` → `bucket(4,id)`). */
  private def transform(s: String): String = s.replaceAll("\\s+", "")

  def partitionFieldDdl(sqlText: String,
                        delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case AddRe(table, tr) =>
        Some(GraftUpdateSpecDdl(delegate.parseMultipartIdentifier(table),
          add = Seq(transform(tr)), drop = Nil))
      case DropRe(table, tr) =>
        Some(GraftUpdateSpecDdl(delegate.parseMultipartIdentifier(table),
          add = Nil, drop = Seq(transform(tr))))
      case ReplaceRe(table, oldTr, newTr) =>
        Some(GraftUpdateSpecDdl(delegate.parseMultipartIdentifier(table),
          add = Seq(transform(newTr)), drop = Seq(transform(oldTr))))
      case _ => None
    }
}
