package graft

/** Error taxonomy mirroring the reference's `AppError` hierarchy
  * (`/root/reference/src/handlers/mod.rs:7-100`): the same six
  * categories with display strings unit-tested identically
  * (reference tests `src/handlers/mod.rs:104-150`).
  */
sealed abstract class GraftError(val category: String, val detail: String)
    extends RuntimeException(s"$category: $detail") {
  override def toString: String = s"$category: $detail"
}

object GraftError {
  /** Reference `ConfigError`. */
  final case class ConfigError(d: String) extends GraftError("Config Error", d)
  /** Reference `KafkaError` — source-side failures. */
  final case class SourceError(d: String) extends GraftError("Source Error", d)
  /** Reference `PipelineError` — dedup/buffer/flush failures. */
  final case class PipelineError(d: String) extends GraftError("Pipeline Error", d)
  /** Reference `ParseError` — payload parse/validation failures. */
  final case class ParseError(d: String) extends GraftError("Parse Error", d)
  /** Reference `DeltaError` — table/commit failures. */
  final case class TableError(d: String) extends GraftError("Table Error", d)
  /** Reference `MonitoringError`. */
  final case class MetricsError(d: String) extends GraftError("Monitoring Error", d)
}
