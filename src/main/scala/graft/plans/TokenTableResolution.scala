package graft.plans

import graft.table.TokenTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.EqualTo
import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, LogicalPlan, MergeIntoTable, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst resolution rule: `SELECT ... FROM graft.`/path/to/table``
  * resolves to the TokenTable's current-snapshot scan,
  * `graft_v<N>.`/path`` time-travels to version N, and
  * `MERGE INTO graft.`/path`` compiles to [[GraftMergeCommand]] — so
  * both read and upsert SQL text reach the table format without a full
  * DSv2 catalog (SURVEY.md §4.2 lists the DSv2 catalog as a stretch
  * goal; this rule is the Catalyst-native middle step and exercises the
  * `Rule[LogicalPlan]` extension point).
  *
  * Injected via [[graft.GraftExtensions]] (`injectResolutionRule`).
  * Traversal is TOP-DOWN: a MergeIntoTable must convert as a whole
  * before the bottom-up relation rewrite would dissolve its target
  * UnresolvedRelation into a scan (losing the table path).
  */
case class TokenTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  private val Versioned = "graft_v(\\d+)".r

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case m: MergeIntoTable =>
      stripAlias(m.targetTable) match {
        case UnresolvedRelation(Seq(ns, path), _, _) if ns == "graft" && TokenTable.exists(path) =>
          convertMerge(m, path)
        case _ => m
      }
    case UnresolvedRelation(Seq(ns, path), _, _) if isGraft(ns) && TokenTable.exists(path) =>
      val t = TokenTable.open(spark, path)
      val snap = ns match {
        case Versioned(v) => t.snapshotAt(v.toLong)
        case _ => t.current
      }
      t.scan(snap).queryExecution.analyzed
    case u => u
  }

  /** Supported MERGE shape — the engine's dedup-upsert (north-star M6):
    * `ON t.doc_id = s.doc_id WHEN MATCHED THEN UPDATE SET * WHEN NOT
    * MATCHED THEN INSERT *`, both clauses unconditional. Anything else
    * (conditional clauses, DELETE, explicit assignments, by-source
    * clauses, non-doc_id keys) fails loudly rather than silently
    * diverging from ANSI MERGE semantics.
    */
  private def convertMerge(m: MergeIntoTable, path: String): LogicalPlan = {
    def bad(reason: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO graft.`$path`: $reason (supported form: ON t.doc_id = " +
          "s.doc_id WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *)")
    m.mergeCondition match {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
        if l.nameParts.last == "doc_id" && r.nameParts.last == "doc_id" => ()
      case other => bad(s"unsupported merge condition $other")
    }
    m.matchedActions match {
      case Seq(UpdateStarAction(None)) => ()
      case other => bad(s"unsupported matched actions $other")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case other => bad(s"unsupported not-matched actions $other")
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      bad("not-matched-by-source clauses are unsupported")
    GraftMergeCommand(path, m.sourceTable)
  }

  /** `MERGE INTO x AS t` parses the target as SubqueryAlias(t, rel). */
  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, child) =>
      stripAlias(child)
    case other => other
  }

  private def isGraft(ns: String): Boolean =
    ns == "graft" || Versioned.pattern.matcher(ns).matches()
}
