package graft.config

import graft.GraftError
import org.scalatest.funsuite.AnyFunSuite

/** G1 config validation tests, translated from the reference's suite
  * (`/root/reference/src/config/mod.rs:181-289`): valid load, each
  * missing mandatory field, warn-and-default for tuning knobs. Plus G2
  * error-display tests (`src/handlers/mod.rs:104-150`).
  */
class ConfigSpec extends AnyFunSuite {
  private val valid = Map(
    "table.path" -> "/tmp/t",
    "source.topics" -> "a,b",
    "source.group_id" -> "g1",
    "pipeline.max_buffer_size" -> "500",
    "pipeline.max_wait_secs" -> "60")

  test("valid config loads with explicit values") {
    val c = GraftConfig.load(valid).toOption.get
    assert(c.tablePath == "/tmp/t")
    assert(c.sourceTopics == Seq("a", "b"))
    assert(c.groupId == "g1")
    assert(c.maxBufferSize == 500 && c.maxWaitSecs == 60)
    assert(c.writeMode == WriteMode.Insert)
  }

  test("each missing mandatory field is a hard error") {
    for (k <- Seq("table.path", "source.topics", "source.group_id")) {
      val r = GraftConfig.load(valid - k)
      assert(r.isLeft, s"expected error when $k missing")
      assert(r.swap.toOption.get.detail.contains(k))
    }
    // Empty string counts as missing (reference trims + rejects).
    assert(GraftConfig.load(valid + ("table.path" -> "  ")).isLeft)
  }

  test("invalid tuning knobs fall back to the reference defaults") {
    val c = GraftConfig.load(valid
      + ("pipeline.max_buffer_size" -> "not-a-number")
      - "pipeline.max_wait_secs").toOption.get
    assert(c.maxBufferSize == GraftConfig.DefaultMaxBufferSize) // 10000
    assert(c.maxWaitSecs == GraftConfig.DefaultMaxWaitSecs) // 360
  }

  test("monitoring enabled without endpoint is a hard error") {
    assert(GraftConfig.load(valid + ("monitoring.enabled" -> "true")).isLeft)
    assert(GraftConfig.load(valid + ("monitoring.enabled" -> "true")
      + ("monitoring.endpoint" -> "http://x")).isRight)
  }

  test("unknown write.mode is a hard error; upsert parses") {
    assert(GraftConfig.load(valid + ("write.mode" -> "bogus")).isLeft)
    assert(GraftConfig.load(valid + ("write.mode" -> "upsert"))
      .toOption.get.writeMode == WriteMode.Upsert)
  }

  test("error taxonomy display strings (G2, mirrors reference handlers tests)") {
    assert(GraftError.ConfigError("x").toString == "Config Error: x")
    assert(GraftError.SourceError("x").toString == "Source Error: x")
    assert(GraftError.PipelineError("x").toString == "Pipeline Error: x")
    assert(GraftError.ParseError("x").toString == "Parse Error: x")
    assert(GraftError.TableError("x").toString == "Table Error: x")
    assert(GraftError.MetricsError("x").toString == "Monitoring Error: x")
    // They are real exceptions with the category in the message.
    assert(GraftError.TableError("boom").getMessage.contains("Table Error"))
  }

  test("loadFile: reference-shaped YAML loads with aliased keys (G1 file parity)") {
    val yaml =
      """# kafka-delta-rs-style config (reference src/config/mod.rs)
        |kafka:
        |  broker: "localhost:9092"
        |  topics:
        |    - events
        |    - clicks
        |  group_id: graft-cg
        |delta:
        |  table_path: /tmp/graft_cfg_table
        |  mode: Upsert
        |pipeline:
        |  max_buffer_size: 5000
        |  max_wait_secs: 60
        |logging:
        |  level: INFO
        |monitoring:
        |  enabled: true
        |  service_name: graft
        |  endpoint: /metrics
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yaml")
    java.nio.file.Files.write(f, yaml.getBytes)
    val cfg = GraftConfig.loadFile(f.toString).toOption.get
    assert(cfg.tablePath == "/tmp/graft_cfg_table")
    assert(cfg.sourceTopics == Seq("events", "clicks"))
    assert(cfg.groupId == "graft-cg")
    assert(cfg.maxBufferSize == 5000 && cfg.maxWaitSecs == 60)
    assert(cfg.writeMode == WriteMode.Upsert)
    assert(cfg.monitoringEnabled && cfg.monitoringEndpoint.contains("/metrics"))
    assert(cfg.logLevel == "INFO")
  }

  test("loadFile: validation still fires through the file path; IO errors are ConfigError") {
    val bad =
      """kafka:
        |  topics:
        |    - t
        |  group_id: g
        |monitoring:
        |  enabled: true
        |""".stripMargin // no table path, no endpoint
    val f = java.nio.file.Files.createTempFile("graft_cfg_bad", ".yaml")
    java.nio.file.Files.write(f, bad.getBytes)
    assert(GraftConfig.loadFile(f.toString).isLeft)
    assert(GraftConfig.loadFile("/nonexistent/cfg.yaml").isLeft)
    // Tabs are outside the supported subset: loud error, not silence.
    val tabbed = java.nio.file.Files.createTempFile("graft_cfg_tab", ".yaml")
    java.nio.file.Files.write(tabbed, "kafka:\n\ttopics: x\n".getBytes)
    assert(GraftConfig.loadFile(tabbed.toString).isLeft)
  }

  test("loadFile: inline comments strip; quoted '#' is data; flow collections are loud errors") {
    def kv(yaml: String) = {
      val f = java.nio.file.Files.createTempFile("graft_cfg_inline", ".yaml")
      java.nio.file.Files.write(f, yaml.getBytes)
      GraftConfig.fileKv(f.toString)
    }
    // 'level: INFO # prod' must parse as INFO, not 'INFO # prod'
    // (ADVICE r3: the comment silently became part of the value).
    val c = kv(
      """logging:
        |  level: INFO  # production default
        |kafka:   # section note
        |  group_id: "g#1"
        |  topics:
        |    - events  # main stream
        |""".stripMargin).toOption.get
    assert(c("logging.level") == "INFO")
    assert(c("source.group_id") == "g#1", "quoted '#' is data, not a comment")
    assert(c("source.topics") == "events")
    // Flow collections are outside the subset: loud error, never a
    // silently-wrong literal scalar.
    assert(kv("kafka:\n  topics: [a, b]\n").isLeft)
    assert(kv("delta:\n  opts: {k: v}\n").isLeft)
    assert(kv("kafka:\n  topics:\n    - [a]\n").isLeft)
  }
}
