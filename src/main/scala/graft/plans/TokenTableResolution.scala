package graft.plans

import graft.table.TokenTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst resolution rule: `SELECT ... FROM graft.`/path/to/table``
  * resolves to the TokenTable's current-snapshot scan, and
  * `graft_v<N>.`/path`` time-travels to version N — so SQL text reaches
  * the table format without a full DSv2 catalog (SURVEY.md §4.2 lists
  * the DSv2 catalog as a stretch goal; this rule is the Catalyst-native
  * middle step and exercises the `Rule[LogicalPlan]` extension point).
  *
  * Injected via [[graft.GraftExtensions]] (`injectResolutionRule`).
  */
case class TokenTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  private val Versioned = "graft_v(\\d+)".r

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedRelation(Seq(ns, path), _, _) if isGraft(ns) && TokenTable.exists(path) =>
      val t = TokenTable.open(spark, path)
      val snap = ns match {
        case Versioned(v) => t.snapshotAt(v.toLong)
        case _ => t.current
      }
      t.scan(snap).queryExecution.analyzed
    case u => u
  }

  private def isGraft(ns: String): Boolean =
    ns == "graft" || Versioned.pattern.matcher(ns).matches()
}
