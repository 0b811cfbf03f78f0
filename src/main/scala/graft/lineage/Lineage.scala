package graft.lineage

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.table.{DataFile, Format, TokenTable}
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Checkpointed per-partition lineage (north-star M7).
  *
  * Every maintenance job writes, per task (= bin / bucket / rewrite
  * unit): input files -> output files -> token counts, to an atomic
  * marker *before* the single snapshot commit. Resume = skip tasks whose
  * marker exists and reuse their outputs. Data lands before the
  * checkpoint advances and replay is idempotent — exactly the
  * reference's flush-then-commit ordering (X1,
  * `/root/reference/src/kafka/mod.rs:187-231`): a crash between task
  * completion and snapshot commit re-runs nothing that finished and
  * commits once.
  */
object Lineage {

  case class TaskRecord(
      jobId: String,
      taskId: String,
      inputFiles: Seq[String],
      outputFiles: Seq[DataFile],
      rows: Long,
      tokenCount: Long,
      status: String,
      durationMs: Long)

  /** Driver-side job plan: task -> input files, persisted before any
    * task runs so a resumed job re-executes the *same* plan.
    */
  case class JobPlan(jobId: String, operation: String, parentVersion: Long,
      tasks: Map[String, Seq[String]])

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def jobDir(table: TokenTable, jobId: String): Path =
    Paths.get(table.location, Format.LineageDir, jobId)

  private def taskPath(table: TokenTable, jobId: String, taskId: String): Path =
    jobDir(table, jobId).resolve(s"task-$taskId.json")
  private def planPath(table: TokenTable, jobId: String): Path =
    jobDir(table, jobId).resolve("plan.json")

  /** Persist the plan once; on resume return the original plan so task
    * identity is stable across crashes.
    */
  def planOrResume(table: TokenTable, plan: JobPlan): JobPlan = {
    val p = planPath(table, plan.jobId)
    if (Files.exists(p)) mapper.readValue(Files.readString(p), classOf[JobPlan])
    else {
      Format.atomicWrite(p, mapper.writeValueAsString(plan))
      plan
    }
  }

  def completeTask(table: TokenTable, rec: TaskRecord): Unit =
    Format.atomicWrite(taskPath(table, rec.jobId, rec.taskId),
      mapper.writeValueAsString(rec))

  def loadTask(table: TokenTable, jobId: String, taskId: String): Option[TaskRecord] = {
    val p = taskPath(table, jobId, taskId)
    if (Files.exists(p)) Some(mapper.readValue(Files.readString(p), classOf[TaskRecord]))
    else None
  }

  /** All completed task records of a job (the job's metrics table). */
  def taskRecords(table: TokenTable, jobId: String): Seq[TaskRecord] = {
    val dir = jobDir(table, jobId)
    if (!Files.isDirectory(dir)) return Nil
    val st = Files.list(dir)
    try {
      st.iterator().asScala
        .filter(_.getFileName.toString.startsWith("task-"))
        .map(p => mapper.readValue(Files.readString(p), classOf[TaskRecord]))
        .toSeq
    } finally st.close()
  }

  /** Metrics as a DataFrame (rows/tokens/duration per task) — the
    * engine's analog of the reference's monitoring counters
    * (`/root/reference/src/monitoring/mod.rs:85-128`).
    */
  def metrics(spark: SparkSession, table: TokenTable, jobId: String): DataFrame = {
    import spark.implicits._
    taskRecords(table, jobId)
      .map(r => (r.jobId, r.taskId, r.inputFiles.size, r.outputFiles.size,
        r.rows, r.tokenCount, r.status, r.durationMs))
      .toDF("job_id", "task_id", "input_files", "output_files",
        "rows", "token_count", "status", "duration_ms")
  }
}
