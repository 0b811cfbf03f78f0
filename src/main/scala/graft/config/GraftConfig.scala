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
    messageFormat: MessageFormat, // Json | Grpc (reference config/mod.rs:37)
    monitoringEnabled: Boolean,
    monitoringEndpoint: Option[String],
    logLevel: String)

/** Payload format of the source messages (reference
  * `/root/reference/src/config/mod.rs:44-49`): Json routes through
  * [[graft.ingest.Ingest.parse]], Grpc through the proto3 wire decode
  * ([[graft.ingest.Ingest.parseProto]]) — the arm the reference
  * declares but leaves as a `todo!()` stub.
  *
  * DECLARATION-ONLY at the streaming entry point (ADVICE r5): the
  * consumer loop ([[graft.streaming.StreamingIngest]]) carries a
  * string-payload source and always runs the JSON parse; binary-payload
  * pipelines call [[graft.ingest.Ingest.parseProto]] directly (as the
  * driver's `p2_proto_parse` query does). Routing the Grpc arm from the
  * config requires the consumer source to grow a byte-payload schema —
  * out of scope until a binary source exists.
  */
sealed trait MessageFormat
object MessageFormat {
  case object Json extends MessageFormat
  case object Grpc extends MessageFormat
}

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
      format <- kv.getOrElse("source.message_format", "json").toLowerCase match {
        case "json" => Right(MessageFormat.Json)
        case "grpc" => Right(MessageFormat.Grpc)
        case other => Left(GraftError.ConfigError(s"unknown source.message_format '$other'"))
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
      messageFormat = format,
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

  /** Reference YAML key names -> this engine's config keys
    * (`/root/reference/src/config/mod.rs:10-87`): a file written for the
    * reference loads here unchanged.
    */
  private val ReferenceKeyAliases = Map(
    "kafka.topics" -> "source.topics",
    "kafka.group_id" -> "source.group_id",
    "delta.table_path" -> "table.path",
    "delta.mode" -> "write.mode",
    "delta.message_format" -> "source.message_format",
    "monitoring.service_name" -> "monitoring.service_name")

  /** Load + validate a CONFIG FILE (the reference's entry point,
    * `config/mod.rs:96-127`): a minimal YAML subset — nested maps by
    * indentation, `- item` sequences, `key: value` scalars, `#`
    * comments, quoted strings — flattened to dotted keys, with the
    * reference's own key names aliased in, then routed through the same
    * [[load]] validation. No YAML dependency (zero-egress environment);
    * the subset covers the reference's entire config surface.
    */
  def loadFile(path: String): Either[GraftError.ConfigError, GraftConfig] =
    fileKv(path).fold(Left(_), load)

  /** The config file as this engine's key space (reference YAML key
    * names aliased in) — for callers that merge file keys with CLI
    * overrides ([[graft.Main]]) before validation.
    */
  def fileKv(path: String): Either[GraftError.ConfigError, Map[String, String]] = {
    val lines =
      try java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
        .toArray(Array.empty[String]).toSeq
      catch {
        case e: java.io.IOException =>
          return Left(GraftError.ConfigError(s"cannot read config file $path: ${e.getMessage}"))
      }
    flattenYaml(lines).map(_.map { case (k, v) =>
      ReferenceKeyAliases.getOrElse(k, k) -> v
    })
  }

  /** Flatten the YAML subset to dotted keys; list values join with ','
    * (the form [[load]] splits back). Returns ConfigError on structure
    * the subset does not cover (tabs, flow collections, multi-doc).
    */
  private[config] def flattenYaml(lines: Seq[String])
      : Either[GraftError.ConfigError, Map[String, String]] = {
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
          (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
      else t
    }
    // YAML inline comments: '#' preceded by whitespace, outside quotes,
    // starts a comment ('level: INFO # prod' → value INFO, not
    // 'INFO # prod'). '#' inside a quoted value is data.
    def stripInlineComment(s: String): String = {
      var inSingle = false; var inDouble = false
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' if !inDouble => inSingle = !inSingle
          case '"' if !inSingle => inDouble = !inDouble
          case '#' if !inSingle && !inDouble &&
              (i == 0 || s.charAt(i - 1).isWhitespace) =>
            return s.substring(0, i)
          case _ =>
        }
        i += 1
      }
      s
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Stack of (indent, key-path).
    var stack = List.empty[(Int, String)]
    for ((raw, i) <- lines.zipWithIndex) {
      val noComment = if (raw.trim.startsWith("#")) "" else raw
      if (noComment.trim.nonEmpty) {
        if (noComment.contains('\t'))
          return Left(GraftError.ConfigError(s"config line ${i + 1}: tabs are not supported"))
        val indent = noComment.takeWhile(_ == ' ').length
        val body = noComment.trim
        stack = stack.dropWhile(_._1 >= indent)
        val prefix = stack.headOption.map(_._2 + ".").getOrElse("")
        def rejectFlow(v: String): Option[GraftError.ConfigError] = {
          val t = v.trim
          if (t.nonEmpty && (t.head == '[' || t.head == '{'))
            Some(GraftError.ConfigError(s"config line ${i + 1}: flow collections " +
              "('[...]'/'{...}') are not supported; use block sequences"))
          else None
        }
        if (body.startsWith("- ")) {
          val parent = stack.headOption.map(_._2).getOrElse(
            return Left(GraftError.ConfigError(s"config line ${i + 1}: list item without a key")))
          val itemRaw = stripInlineComment(body.drop(2))
          rejectFlow(itemRaw).foreach(e => return Left(e))
          val item = unquote(itemRaw)
          out(parent) = out.get(parent).filter(_.nonEmpty)
            .map(_ + "," + item).getOrElse(item)
          stack = (indent, parent) :: stack // keep parent live for siblings
        } else body.split(":", 2) match {
          case Array(k, v0) =>
            val v = stripInlineComment(v0)
            if (v.trim.isEmpty) { // nested map opener (possibly 'key:  # note')
              stack = (indent, prefix + k.trim) :: stack
              out.getOrElseUpdate(prefix + k.trim, "")
            } else {
              rejectFlow(v).foreach(e => return Left(e))
              out(prefix + k.trim) = unquote(v)
            }
          case _ =>
            return Left(GraftError.ConfigError(s"config line ${i + 1}: expected 'key: value'"))
        }
      }
    }
    // Map openers that never received children/values are dropped.
    Right(out.toMap.filter(_._2.nonEmpty))
  }
}
