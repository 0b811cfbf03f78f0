package graft.plans

import graft.maintain.Delete
import graft.table.TokenTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** Runnable command behind native `DELETE FROM graft.\`path\` WHERE ...`
  * SQL text ([[TokenTableResolution]] builds it from the parsed
  * DeleteFromTable): routes the WHERE condition through
  * [[graft.maintain.Delete.deleteWhere]] — manifest-stats three-way file
  * classification (untouched / metadata-only drop / copy-on-write
  * rewrite), one atomic snapshot — and returns the commit facts.
  *
  * The condition may arrive resolved (a catalog session's analyzer bound
  * it to the DSv2 relation) or unresolved (manual rule application on
  * parsed text); either way it is re-anchored BY NAME onto the engine's
  * own scan plan, whose attribute ids necessarily differ from the parse
  * -time relation's.
  */
case class GraftDeleteCommand(path: String, condition: Expression)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("deleted_rows", LongType, nullable = false)(),
    AttributeReference("dropped_files", LongType, nullable = false)(),
    AttributeReference("rewritten_files", LongType, nullable = false)(),
    AttributeReference("untouched_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = TokenTable.open(spark, path)
    val unresolved = condition.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }
    val jobId = s"sql-delete-${java.util.UUID.randomUUID().toString.take(8)}"
    val res = Delete.deleteWhere(t, GraftSqlBridge.column(unresolved), jobId)
    Seq(Row(res.snapshot.version, res.deletedRows, res.droppedFiles.toLong,
      res.rewrittenFiles.toLong, res.untouchedFiles))
  }
}
