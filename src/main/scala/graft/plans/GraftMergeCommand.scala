package graft.plans

import graft.maintain.Merge
import graft.table.TokenTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Runnable command behind native `MERGE INTO graft.\`path\`` SQL text
  * ([[TokenTableResolution]] builds it from the parsed MergeIntoTable):
  * analyzes the source subtree, routes it through
  * [[graft.maintain.Merge.mergeInto]] (first-wins source dedup, segment
  * -index file pruning, anti-join rewrite, one atomic snapshot), and
  * returns the commit facts as the command's result row.
  *
  * Source rows carry a constant precedence — SQL text has no arrival
  * order — so duplicate source doc_ids resolve by the deterministic
  * token-hash tie-break (Merge.dedupFirstWins), matching the engine's
  * D1 semantics rather than erroring like ANSI MERGE cardinality checks.
  */
case class GraftMergeCommand(path: String, source: LogicalPlan)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("touched_files", LongType, nullable = false)(),
    AttributeReference("untouched_files", LongType, nullable = false)(),
    AttributeReference("source_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = TokenTable.open(spark, path)
    // Pass the source through unprojected: Merge.mergeInto aligns it to
    // the table's physical schema by (logical or physical) name and
    // null-fills evolved columns the source doesn't carry.
    val src = GraftSqlBridge.ofRows(spark, source)
      .withColumn("__prec", lit(0L))
    val jobId = s"sql-merge-${java.util.UUID.randomUUID().toString.take(8)}"
    val res = Merge.mergeInto(t, src, "__prec", jobId)
    Seq(Row(res.snapshot.version, res.touchedFiles.toLong,
      res.untouchedFiles.toLong, res.sourceRows))
  }
}
