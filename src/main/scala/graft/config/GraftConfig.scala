package graft.config

import graft.GraftError

/** Engine configuration with the reference's validation rules
  * (`/root/reference/src/config/mod.rs:96-177`): hard errors on empty
  * mandatory fields, warn + default for tuning knobs.
  *
  * The reference parses YAML; this engine takes `key=value` pairs (CLI /
  * properties style) — same validation semantics, no YAML dependency.
  */
case class GraftConfig(
    tablePath: String,
    sourceTopics: Seq[String], // reference: kafka.topics (mandatory, non-empty)
    groupId: String, // reference: kafka.group_id (mandatory)
    maxBufferSize: Int, // rows per flush; reference default 10_000
    maxWaitSecs: Int, // flush interval ceiling; reference default 360
    targetFileBytes: Long, // compaction/clustering target (ours)
    writeMode: WriteMode, // Insert (append) | Upsert (merge on doc_id)
    monitoringEnabled: Boolean,
    monitoringEndpoint: Option[String],
    logLevel: String)

sealed trait WriteMode
object WriteMode {
  /** Reference `Insert` -> plain append. */
  case object Insert extends WriteMode
  /** Reference `Upsert` is actually append-with-schema-merge
    * (`src/pipeline/mod.rs:224-227` maps it to WriteMode::MergeSchema,
    * NOT a key-based merge — recorded discrepancy); ours is a real
    * MERGE INTO on doc_id (north-star M6), an intentional upgrade.
    */
  case object Upsert extends WriteMode
}

object GraftConfig {
  val DefaultMaxBufferSize = 10000 // src/kafka/mod.rs:142
  val DefaultMaxWaitSecs = 360 // src/kafka/mod.rs:141
  val DefaultTargetFileBytes: Long = 128L * 1024 * 1024

  /** Parse + validate `key=value` pairs. Mirrors the reference's rules:
    * - missing/empty table path, topics, group id -> hard ConfigError
    * - monitoring enabled without endpoint -> hard ConfigError
    * - invalid/absent buffer & wait values -> default (reference warns)
    */
  def load(kv: Map[String, String]): Either[GraftError.ConfigError, GraftConfig] = {
    def mandatory(key: String): Either[GraftError.ConfigError, String] =
      kv.get(key).map(_.trim).filter(_.nonEmpty)
        .toRight(GraftError.ConfigError(s"mandatory config '$key' is missing or empty"))
    def intOr(key: String, dflt: Int): Int =
      kv.get(key).flatMap(_.toIntOption).filter(_ > 0).getOrElse(dflt)
    for {
      table <- mandatory("table.path")
      topics <- mandatory("source.topics").map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      _ <- if (topics.nonEmpty) Right(())
           else Left(GraftError.ConfigError("mandatory config 'source.topics' is missing or empty"))
      group <- mandatory("source.group_id")
      monEnabled = kv.get("monitoring.enabled").contains("true")
      monEndpoint = kv.get("monitoring.endpoint").map(_.trim).filter(_.nonEmpty)
      _ <- if (monEnabled && monEndpoint.isEmpty)
             Left(GraftError.ConfigError("monitoring enabled but 'monitoring.endpoint' is empty"))
           else Right(())
      mode <- kv.getOrElse("write.mode", "insert").toLowerCase match {
        case "insert" => Right(WriteMode.Insert)
        case "upsert" => Right(WriteMode.Upsert)
        case other => Left(GraftError.ConfigError(s"unknown write.mode '$other'"))
      }
    } yield GraftConfig(
      tablePath = table,
      sourceTopics = topics,
      groupId = group,
      maxBufferSize = intOr("pipeline.max_buffer_size", DefaultMaxBufferSize),
      maxWaitSecs = intOr("pipeline.max_wait_secs", DefaultMaxWaitSecs),
      targetFileBytes = kv.get("table.target_file_bytes").flatMap(_.toLongOption)
        .filter(_ > 0).getOrElse(DefaultTargetFileBytes),
      writeMode = mode,
      monitoringEnabled = monEnabled,
      monitoringEndpoint = monEndpoint,
      logLevel = kv.getOrElse("logging.level", "WARN"))
  }

  /** Parse `k=v` argument strings (CLI form). */
  def loadArgs(args: Seq[String]): Either[GraftError.ConfigError, GraftConfig] =
    load(args.flatMap { a =>
      a.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap)
}
