package graft

import graft.config.GraftConfig
import graft.ingest.{Ingest, TokenGen}
import graft.maintain.{Cluster, Compact, Expire, Merge}
import graft.table.TokenTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point: `spark-submit --class graft.Main app.jar
  * <command> k=v ...` — the engine's operational surface (the north
  * rule's "launched via spark-submit on a multi-executor cluster"; on a
  * real cluster only `--master`/`--num-executors` change).
  */
object Main {
  private val usage =
    """usage: graft.Main <command> [k=v ...] [config=FILE.yaml]
      |  (config=FILE loads a kafka-delta-rs-shaped YAML; CLI k=v overrides)
      |  create    table.path=PATH
      |  gen       table.path=PATH rows=N commits=K [dup_rate=0.1] [offset=0]
      |  compact   table.path=PATH [table.target_file_bytes=B] [job.id=ID] [parallelism=P]
      |  zorder    table.path=PATH [table.target_file_bytes=B] [job.id=ID]
      |  hilbert   table.path=PATH [table.target_file_bytes=B] [job.id=ID]
      |  merge     table.path=PATH rows=N [offset=0] [job.id=ID]
      |  expire    table.path=PATH [retain=2]
      |  scan      table.path=PATH
      |  describe  table.path=PATH""".stripMargin

  /** Commit boundaries: cut i = i*rows/commits, so sizes differ by at
    * most 1 and the boundaries cover every row (a plain rows/commits
    * truncation silently dropped rows % commits rows).
    */
  def commitCuts(rows: Long, commits: Int): IndexedSeq[Long] = {
    require(commits >= 1, s"commits must be >= 1, got $commits")
    require(rows >= 0, s"rows must be >= 0, got $rows")
    (0 to commits).map(i => i.toLong * rows / commits)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val cmd = args.head
    val cliKv = args.tail.flatMap(_.split("=", 2) match {
      case Array(k, v) => Some(k -> v); case _ => None
    }).toMap
    // `config=FILE` loads a reference-shaped YAML config (G1 file
    // parity); CLI k=v pairs override file keys, mirroring the
    // reference's YAML + CLI merge (src/config/mod.rs:96-127).
    val kv: Map[String, String] = cliKv.get("config") match {
      case Some(f) => GraftConfig.fileKv(f) match {
        case Right(fileKeys) => fileKeys ++ (cliKv - "config")
        case Left(err) =>
          System.err.println(err.toString)
          sys.exit(2)
      }
      case None => cliKv
    }
    def need(k: String): String = kv.getOrElse(k,
      { System.err.println(s"missing $k\n$usage"); sys.exit(2); "" })

    val spark = SparkSession.builder()
      .appName(s"graft-$cmd")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel(kv.getOrElse("logging.level", "WARN"))

    val t0 = System.nanoTime()
    cmd match {
      case "create" =>
        TokenTable.create(spark, need("table.path"))
        println(s"created ${need("table.path")}")
      case "gen" =>
        val t = TokenTable.open(spark, need("table.path"))
        val rows = need("rows").toLong
        val commits = kv.getOrElse("commits", "1").toInt
        val dup = kv.getOrElse("dup_rate", "0.0").toDouble
        val off = kv.getOrElse("offset", "0").toLong
        val cuts = commitCuts(rows, commits)
        (0 until commits).foreach { c =>
          t.append(TokenGen.asTokenRows(TokenGen.generate(
            spark, cuts(c + 1) - cuts(c), dupRate = dup, idOffset = off + cuts(c))))
        }
        println(s"appended ${cuts.last} rows in $commits commits -> v${t.currentVersion}")
      case "compact" =>
        val t = TokenTable.open(spark, need("table.path"))
        val res = Compact.run(t,
          kv.getOrElse("table.target_file_bytes",
            GraftConfig.DefaultTargetFileBytes.toString).toLong,
          kv.getOrElse("job.id", s"compact-${java.util.UUID.randomUUID()}"),
          kv.getOrElse("parallelism", "8").toInt)
        println(s"compacted ${res.filesIn} -> ${res.filesOut} files " +
          s"(${res.binsRewritten} bins, ${res.bytesIn} bytes in, resumed=${res.resumedTasks})")
      case "zorder" | "hilbert" | "cluster-docid" =>
        val t = TokenTable.open(spark, need("table.path"))
        val curve = cmd match {
          case "zorder" => Cluster.ZOrder
          case "hilbert" => Cluster.Hilbert
          case _ => Cluster.ByDocId
        }
        val res = Cluster.run(t, curve,
          kv.getOrElse("job.id", s"$cmd-${java.util.UUID.randomUUID()}"),
          kv.getOrElse("table.target_file_bytes",
            GraftConfig.DefaultTargetFileBytes.toString).toLong,
          // cluster-docid is incremental unless full=true (the periodic
          // consolidating pass incremental mode relies on); curves
          // always rewrite fully.
          incremental = !kv.getOrElse("full", "false").toBoolean)
        println(s"$cmd: ${res.buckets} buckets (${res.saltedBuckets} salted, " +
          s"${res.carriedFiles} carried) -> v${res.snapshot.version}")
      case "merge" =>
        val t = TokenTable.open(spark, need("table.path"))
        val src = TokenGen.generate(spark, need("rows").toLong,
          idOffset = kv.getOrElse("offset", "0").toLong)
        val res = Merge.mergeInto(t, src, "offset",
          kv.getOrElse("job.id", s"merge-${java.util.UUID.randomUUID()}"))
        println(s"merged ${res.sourceRows} source rows; " +
          s"touched=${res.touchedFiles} untouched=${res.untouchedFiles}")
      case "expire" =>
        val t = TokenTable.open(spark, need("table.path"))
        val res = Expire.run(t, kv.getOrElse("retain", "2").toInt,
          kv.getOrElse("grace_ms", "3600000").toLong)
        println(s"expired ${res.expiredSnapshots.mkString(",")}; deleted ${res.deletedFiles} files")
      case "scan" =>
        val t = TokenTable.open(spark, need("table.path"))
        // Time travel: scan any retained snapshot with version=N.
        val snap = kv.get("version").map(v => t.snapshotAt(v.toLong)).getOrElse(t.current)
        val r = t.scan(snap).agg(count(lit(1)), sum(col("n_tok").cast("long"))).head()
        val secs = (System.nanoTime() - t0) / 1e9
        val toks = Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
        println(f"scan: ${r.getLong(0)} rows, $toks tokens in $secs%.2fs " +
          f"(${toks / math.max(secs, 1e-9)}%.0f tokens/s)")
      case "describe" =>
        val t = TokenTable.open(spark, need("table.path"))
        val s = t.current
        val files = t.filesLocal(s)
        println(s"version=${s.version} op=${s.operation} files=${files.size} " +
          s"rows=${files.map(_.rows).sum} tokens=${files.map(_.sumNtok).sum} " +
          s"bytes=${files.map(_.bytes).sum}")
        s.summary.toSeq.sorted.foreach { case (k, v) => println(s"  $k=$v") }
      case other =>
        System.err.println(s"unknown command '$other'\n$usage"); sys.exit(2)
    }
    spark.stop()
  }
}
