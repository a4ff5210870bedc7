package org.apache.spark.sql.graftext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Materialized-view query rewrite — the optimizer half of
  * [[graft.table.MaterializedView]]: an aggregate a user writes against
  * the BASE table is transparently answered from the maintained MV.
  *
  * A registration binds a base table path to an MV parquet path with
  * the MV's fixed shape: `groupBy(g).agg(count(1) AS n, sum(cast(v AS
  * DECIMAL(18,4))) AS total)`. The rule matches exactly that aggregate
  * over a scan of the base path — same grouping column, count and/or
  * the decimal sum of the registered value column, no intervening
  * Filter (a filtered aggregate is NOT answerable from a
  * whole-table MV) — and substitutes a Project over the MV relation.
  * Output attributes keep their original names AND ExprIds, so every
  * parent operator is untouched.
  *
  * At 100 TB this is the difference between scanning the corpus and
  * scanning |groups| rows — the reason warehouses maintain MVs at all.
  * Staleness contract: the rule serves whatever MV snapshot was
  * registered; refreshing the MV ([[graft.table.MaterializedView
  * .maintain]] + re-register) is the maintenance pipeline's job, same
  * as any scheduled-refresh MV system.
  *
  * Soundness: the rewrite fires only on an EXACT shape match (count =
  * MV's n_rows by definition; the sum matches only the registered value
  * column under the MV's own decimal cast), so substituting the MV
  * relation preserves semantics by the maintain ≡ refresh invariant
  * (MaterializedViewSpec). Termination: the rewritten plan scans the MV
  * path, which is never a registered base path, so the rule cannot fire
  * twice on the same subtree. */
object MvRewrite extends Rule[LogicalPlan] {

  /** basePath → (mv analyzed plan, groupCol, valueCol, base-table file
    * fingerprint at register time). */
  private final case class Mv(plan: LogicalPlan, groupCol: String,
    valueCol: String, baseFingerprint: String)
  private val registry = new ConcurrentHashMap[String, Mv]()

  /** Register (or replace) the MV serving `basePath`. `mvPath` must hold
    * the [[graft.table.MaterializedView.refresh]] shape
    * (groupCol, n_rows, total). The base table's current file listing
    * is fingerprinted so a later rewrite of the base parquet (new file
    * names) disables the now-stale substitution instead of silently
    * serving the old snapshot. */
  def register(spark: SparkSession, basePath: String, mvPath: String,
      groupCol: String, valueCol: String): Unit = {
    val plan = spark.read.parquet(mvPath).queryExecution.analyzed
    val fp = fingerprintOf(spark.read.parquet(basePath).inputFiles)
    registry.put(normalize(basePath), Mv(plan, groupCol, valueCol, fp))
  }

  def clear(): Unit = registry.clear()

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Order-insensitive digest of a file listing. Parquet writers stamp
    * unique part names, so any base-table rewrite/append/delete changes
    * the listing — file names are the cheap in-memory staleness signal
    * (the FileIndex already holds them; no extra I/O at rule time). */
  private def fingerprintOf(files: Array[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.sorted.foreach(f => md.update(f.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The registered MV for a plan that is a bare scan (or pure column
    * Project over a scan) of a registered base path. Requires the scan
    * to read EXACTLY the registered path (a multi-path scan whose first
    * root merely happens to be registered must not lose its other
    * paths' rows) and the base listing to still match the registered
    * fingerprint (a rewritten base disables the stale MV). */
  private def mvFor(plan: LogicalPlan): Option[Mv] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      mvFor(child)
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths match {
          case Seq(single) =>
            Option(registry.get(normalize(single.toString)))
              .filter(_.baseFingerprint ==
                fingerprintOf(fs.location.inputFiles))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child,
          _) =>
        mvFor(child) match {
          case Some(mv) if g.name == mv.groupCol =>
            rewrite(agg, g, aggExprs, mv).getOrElse(agg)
          case _ => agg
        }
    }
  }

  private def rewrite(agg: Aggregate, g: AttributeReference,
      aggExprs: Seq[NamedExpression], mv: Mv): Option[LogicalPlan] = {
    // substitute a FRESH relation instance: if one query aggregates the
    // base table twice, two rewrites sharing the registered plan would
    // plant duplicate ExprIds in one tree
    val freshPlan = mv.plan.transform {
      case lr: LogicalRelation => lr.newInstance()
    }
    val out = freshPlan.output
    val (mvG, mvN, mvT) = (out(0), out(1), out(2))

    def mapped(e: NamedExpression): Option[NamedExpression] = e match {
      case a: AttributeReference if a.semanticEquals(g) =>
        Some(Alias(mvG, a.name)(exprId = a.exprId))
      case al @ Alias(AggregateExpression(Count(Seq(Literal(1, _))), _,
          false, None, _), name) =>
        Some(Alias(mvN, name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(s: Sum, _, false, None, _),
          name) => s.child match {
        case Cast(v: AttributeReference, dt: DecimalType, _, _)
            if dt.precision == 18 && dt.scale == 4 &&
              v.name == mv.valueCol =>
          Some(Alias(Cast(mvT, s.dataType), name)(exprId = al.exprId))
        case _ => None
      }
      case _ => None
    }

    val rewritten = aggExprs.map(mapped)
    if (rewritten.forall(_.isDefined))
      Some(Project(rewritten.map(_.get), freshPlan))
    else None
  }
}
