package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Lower, Md5, RegExpReplace, StringTrim, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Md5Prefix64, NormAlnum}

/** Optimizer rule (SURVEY §4 tier (c): `Rule[LogicalPlan]` via
  * `SparkSessionExtensions`): rewrites the two built-in expression chains
  * this engine documents as its portable formulations into their native
  * equivalents, so USER-written SQL — not just queries built through
  * `graft.ext` — gets the fast path:
  *
  *   trim(regexp_replace(lower(x), '[^a-z0-9]+', ' '))  →  norm_alnum(x)
  *   conv(substr(md5(x), 1, 15), 16, 10)                →  cast(md5prefix64(x) as string)
  *
  * Both rewrites are semantics-preserving (the equivalence specs in
  * `FunctionsSpec` are exactly the proofs) and fire only on the literal
  * argument patterns; anything else is left to the built-ins.
  */
object GraftRewrites extends Rule[LogicalPlan] {

  private val NormRegex = UTF8String.fromString("[^a-z0-9]+")
  private val Space = UTF8String.fromString(" ")

  private def intLit(e: Expression, v: Int): Boolean = e match {
    case Literal(x: Int, _) => x == v
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ')) — the text-norm chain
      case StringTrim(
            RegExpReplace(Lower(child), Literal(r: UTF8String, StringType),
              Literal(s: UTF8String, StringType), pos), None)
          if r == NormRegex && s == Space && intLit(pos, 1) =>
        NormAlnum(child)
      // conv(substr(md5(x), 1, 15), 16, 10) — the 60-bit hash chain; conv
      // yields the decimal-digit string, so the native long casts to string
      case Conv(Substring(Md5(child), p1, p15), b16, b10, _)
          if intLit(p1, 1) && intLit(p15, 15) && intLit(b16, 16) && intLit(b10, 10) =>
        Cast(Md5Prefix64(child), StringType)
    }
}

/** `spark.sql.extensions`-loadable installer (`new SparkSession.Builder()
  * .config("spark.sql.extensions", "graft.plans.GraftExtensions")`):
  * injects [[GraftRewrites]] and registers the native function family on
  * every session built with it. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => GraftRewrites)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => RangeJoinStrategy)
    // DSv2 catalog surface: MoR plan substitution for graft relations and
    // DELETE/UPDATE/MERGE command capture + their execution strategy
    ext.injectResolutionRule(s => graft.catalog.GraftCatalogRule(s))
    ext.injectPlannerStrategy(s => graft.catalog.GraftDmlStrategy(s))
    // partition-evolution DDL (`ALTER TABLE … ADD/DROP/REPLACE PARTITION
    // FIELD`) — syntax vanilla Spark refuses — plus CREATE/DROP VIEW
    // routing for graft catalogs; everything else delegates
    ext.injectParser((s, delegate) => new GraftSqlParser(s, delegate))
    ext.injectTableFunction((GraftTableFunction.identifier,
      GraftTableFunction.info, GraftTableFunction.builder))
    ext.injectTableFunction((GraftTableFunction.changesIdentifier,
      GraftTableFunction.changesInfo, GraftTableFunction.changesBuilder))
    ext.injectTableFunction((GraftTableFunction.atIdentifier,
      GraftTableFunction.atInfo, GraftTableFunction.atBuilder))
    ext.injectTableFunction((GraftTableFunction.lineageIdentifier,
      GraftTableFunction.lineageInfo, GraftTableFunction.lineageBuilder))
    ext.injectTableFunction((GraftTableFunction.statsIdentifier,
      GraftTableFunction.statsInfo, GraftTableFunction.statsBuilder))
    ext.injectTableFunction((GraftTableFunction.metaIdentifier,
      GraftTableFunction.metaInfo, GraftTableFunction.metaBuilder))
    graft.functions.GraftFunctions.descriptors.foreach(ext.injectFunction)
  }
}

/** Idempotent live-session installer for sessions built without the
  * extensions config (the shared test session, driver-owned sessions):
  * `experimental.extraOptimizations` accepts rules post-construction. */
object GraftExtensionsLive {
  def ensureInstalled(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq GraftRewrites)) {
      spark.experimental.extraOptimizations = cur :+ GraftRewrites
    }
    AsOfJoinApi.ensureInstalled(spark)
    RangeJoinApi.ensureInstalled(spark)
    GraftTableFunction.ensureRegistered(spark)
  }
}
