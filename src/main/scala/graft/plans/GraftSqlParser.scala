package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LocalRelation, LogicalPlan, RenameTable, ShowViews}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.{GraftAlterViewPropsCommand, GraftCatalog, GraftCreateViewCommand, GraftDropViewCommand, GraftRenameViewCommand, GraftShowViewsCommand, GraftUpdateSpecDdl, GraftViews}

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
class GraftSqlParser(session: SparkSession,
                     delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.partitionFieldDdl(sqlText, delegate)
      .getOrElse(GraftSqlParser.routeViews(session, delegate.parsePlan(sqlText)))

  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    GraftSqlParser.partitionFieldDdl(sqlText, delegate)
      .getOrElse(GraftSqlParser.routeViews(session,
        delegate.parsePlanWithParameters(sqlText, ctx)))

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
  private val WriteOrderRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+ORDERED\s+BY\s+(.+?)\s*;?\s*$""".r
  private val WriteUnorderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+UNORDERED\s*;?\s*$""".r
  private val RefDdlRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+(CREATE\s+OR\s+REPLACE|CREATE|DROP|REPLACE)\s+(BRANCH|TAG)\s+""" +
     """(IF\s+NOT\s+EXISTS\s+|IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)""" +
     """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""").r

  /** Swap freshly-parsed CREATE/DROP VIEW plans that target a graft
    * catalog for the engine's own view commands — BEFORE the analyzer
    * runs, because Spark 4.1's ResolveSessionCatalog rejects any
    * non-session catalog for views ahead of injected resolution rules.
    * Everything else (temp views, session-catalog views) passes through
    * untouched. */
  def routeViews(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case cv: CreateView => cv.child match {
        case ui: UnresolvedIdentifier =>
          GraftViews.target(session, ui.nameParts) match {
            case Some((g, ident)) =>
              val sql = cv.originalText.getOrElse(
                throw new UnsupportedOperationException(
                  s"CREATE VIEW $ident: no SQL text available"))
              val cm = session.sessionState.catalogManager
              GraftCreateViewCommand(g, ident, sql, cm.currentCatalog.name,
                cm.currentNamespace, cv.userSpecifiedColumns.map(_._1),
                cv.allowExisting, cv.replace, cv.properties)
            case None => cv
          }
        case _ => cv
      }
      // `ALTER VIEW graft.db.v AS <sql>` — replace-in-place (must exist)
      case av: AlterViewAs => av.child match {
        case uv: UnresolvedView =>
          GraftViews.target(session, uv.multipartIdentifier) match {
            case Some((g, ident)) if g.viewExists(ident) =>
              val cm = session.sessionState.catalogManager
              GraftCreateViewCommand(g, ident, av.originalText,
                cm.currentCatalog.name, cm.currentNamespace, Nil,
                allowExisting = false, replace = true, Map.empty,
                mustExist = true)
            case _ => av
          }
        case _ => av
      }
      // `ALTER VIEW graft.db.v SET/UNSET TBLPROPERTIES` — Spark 4.1's
      // ResolveRelations rejects view lookups in non-session catalogs, so
      // these route here like every other graft view verb
      case sp: org.apache.spark.sql.catalyst.plans.logical.SetViewProperties =>
        sp.child match {
          case uv: UnresolvedView =>
            GraftViews.target(session, uv.multipartIdentifier) match {
              case Some((g, ident)) if g.viewExists(ident) =>
                GraftAlterViewPropsCommand(g, ident,
                  sets = sp.properties.toSeq, unsets = Nil)
              case _ => sp
            }
          case _ => sp
        }
      case up: org.apache.spark.sql.catalyst.plans.logical.UnsetViewProperties =>
        up.child match {
          case uv: UnresolvedView =>
            GraftViews.target(session, uv.multipartIdentifier) match {
              case Some((g, ident)) if g.viewExists(ident) =>
                GraftAlterViewPropsCommand(g, ident, sets = Nil,
                  unsets = up.propertyKeys, unsetIfExists = up.ifExists)
              case _ => up
            }
          case _ => up
        }
      // `ALTER VIEW graft.db.v RENAME TO db.v2` — same catalog only
      case rt: RenameTable if rt.isView => rt.child match {
        case utv: UnresolvedTableOrView =>
          GraftViews.target(session, utv.multipartIdentifier) match {
            case Some((g, from)) if g.viewExists(from) =>
              val cm = session.sessionState.catalogManager
              val toParts =
                if (rt.newName.length > 1 &&
                    cm.isCatalogRegistered(rt.newName.head)) {
                  if (!cm.catalog(rt.newName.head).isInstanceOf[GraftCatalog])
                    throw new UnsupportedOperationException(
                      s"RENAME VIEW across catalogs is not supported")
                  rt.newName.tail
                } else rt.newName
              val to = Identifier.of(
                if (toParts.length > 1) toParts.init.toArray else from.namespace,
                toParts.last)
              GraftRenameViewCommand(g, from, to)
            case _ => rt
          }
        case _ => rt
      }
      // `SHOW VIEWS [IN graft.db] [LIKE 'pat']` — answered straight off
      // the warehouse listing (views are metadata documents; the listing
      // is O(files in the namespace dir))
      case sv: ShowViews => sv.namespace match {
        case un: UnresolvedNamespace =>
          GraftViews.namespace(session, un.multipartIdentifier) match {
            case Some((g, ns)) =>
              // listing + pattern-matching happen at EXECUTION, inside the
              // command node (quoted filter-pattern semantics, not raw regex)
              GraftShowViewsCommand(g, ns, sv.pattern, sv.output)
            case None => sv
          }
        case _ => sv
      }
      // `SHOW PARTITIONS graft.db.t [PARTITION (k=v, …)]` — graft tables
      // have no SupportsPartitionManagement, so the native route rejects
      // them; answered off the snapshot log's live manifest instead
      case sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions =>
        sp.table match {
          case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
            GraftViews.target(session, ut.multipartIdentifier) match {
              case Some((g, id)) =>
                val filter: Map[String, String] = sp.pattern match {
                  case Some(u: org.apache.spark.sql.catalyst.analysis
                      .UnresolvedPartitionSpec) => u.spec
                  case _ => Map.empty
                }
                graft.catalog.GraftShowPartitionsCommand(g,
                  (id.namespace :+ id.name).mkString("."), filter, sp.output)
              case None => sp
            }
          case _ => sp
        }
      case dv: DropView => dv.child match {
        // single-part names prefer a session TEMP view of that name, per
        // Spark's own resolution order
        case ui: UnresolvedIdentifier
            if ui.nameParts.size > 1 || session.sessionState.catalog
              .getTempView(ui.nameParts.head).isEmpty =>
          GraftViews.target(session, ui.nameParts) match {
            case Some((g, ident)) => GraftDropViewCommand(g, ident, dv.ifExists)
            case None => dv
          }
        case _ => dv
      }
      case other => other
    }

  /** Whitespace-free transform text, the engine's canonical spec-string
    * form (`bucket(4, id)` → `bucket(4,id)`). */
  private def transform(s: String): String = s.replaceAll("\\s+", "")

  def partitionFieldDdl(sqlText: String,
                        delegate: ParserInterface): Option[LogicalPlan] = {
    // the regexes are intentionally loose (lazy `.+?` captures), so a
    // statement that merely CONTAINS the keywords inside a string literal
    // or comment can false-match — when the captured table name is not a
    // parseable identifier, fall back to the delegate's normal parse
    // instead of failing inside parseMultipartIdentifier
    def tryBuild(table: String)(mk: Seq[String] => LogicalPlan)
        : Option[LogicalPlan] =
      scala.util.Try(delegate.parseMultipartIdentifier(table))
        .toOption.map(mk)
    sqlText match {
      case AddRe(table, tr) =>
        tryBuild(table)(GraftUpdateSpecDdl(_, add = Seq(transform(tr)),
          drop = Nil))
      case DropRe(table, tr) =>
        tryBuild(table)(GraftUpdateSpecDdl(_, add = Nil,
          drop = Seq(transform(tr))))
      case ReplaceRe(table, oldTr, newTr) =>
        tryBuild(table)(GraftUpdateSpecDdl(_, add = Seq(transform(newTr)),
          drop = Seq(transform(oldTr))))
      // Iceberg write-order DDL: `ALTER TABLE t WRITE ORDERED BY c1 [ASC]
      // [, c2 …]` / `WRITE UNORDERED` — ascending only (each column may
      // say ASC explicitly; DESC/NULLS clauses fall through to the
      // delegate's parse error rather than silently dropping direction)
      case WriteOrderRe(table, colsRaw) =>
        val cols = colsRaw.split(",").map(_.trim).toSeq
          .map(c => c.replaceAll("(?i)\\s+ASC$", "").trim)
        if (cols.exists(c => c.isEmpty || c.contains(" ") || c.contains("(")))
          None
        else tryBuild(table)(graft.catalog.GraftWriteOrderDdl(_, cols))
      case WriteUnorderedRe(table) =>
        tryBuild(table)(graft.catalog.GraftWriteOrderDdl(_, Nil))
      // Iceberg ref DDL: ALTER TABLE t CREATE|DROP BRANCH|TAG name
      // [IF [NOT] EXISTS] [AS OF VERSION v]
      case RefDdlRe(table, verb, kind, ifc, name, asOf) =>
        val v = verb.toUpperCase.replaceAll("\\s+", " ")
        // IF NOT EXISTS pairs with CREATE only, IF EXISTS with DROP only
        // (REPLACE has no tolerance clause) — a mismatched clause like
        // `CREATE BRANCH IF EXISTS b` must fall through to the delegate's
        // parse error, not silently invert the tolerance semantics
        val ifOk = Option(ifc)
          .map(_.toUpperCase.replaceAll("\\s+", " ").trim).forall {
            case "IF NOT EXISTS" => v == "CREATE"
            case "IF EXISTS" => v == "DROP"
            case _ => false
          }
        if (!ifOk) None
        else tryBuild(table)(graft.catalog.GraftRefDdl(_,
          create = v.startsWith("CREATE"),
          isBranch = kind.equalsIgnoreCase("BRANCH"),
          refName = name, ifClause = ifc != null,
          asOfVersion = Option(asOf).map(_.toLong),
          replace = v.endsWith("REPLACE")))
      case _ => None
    }
  }
}
