package graft.plans

import graft.maintain.Update
import graft.table.TokenTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** Runnable command behind native `UPDATE graft.\`path\` SET ... WHERE
  * ...` SQL text: assignments and condition arrive bound by
  * [[TokenTableResolution]] (resolved — the analyzer rejects commands
  * carrying unresolved expressions) and are re-anchored BY NAME onto the
  * engine's scan before [[graft.maintain.Update.updateWhere]] runs.
  */
case class GraftUpdateCommand(path: String,
    assignments: Seq[(String, Expression)], condition: Expression)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("updated_rows", LongType, nullable = false)(),
    AttributeReference("rewritten_files", LongType, nullable = false)(),
    AttributeReference("untouched_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = TokenTable.open(spark, path)
    def byName(e: Expression): Expression = e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }
    val assigns = assignments.map { case (n, v) =>
      n -> GraftSqlBridge.column(byName(v))
    }
    val jobId = s"sql-update-${java.util.UUID.randomUUID().toString.take(8)}"
    val res = Update.updateWhere(t, assigns,
      GraftSqlBridge.column(byName(condition)), jobId)
    Seq(Row(res.snapshot.version, res.updatedRows, res.rewrittenFiles.toLong,
      res.untouchedFiles))
  }
}
