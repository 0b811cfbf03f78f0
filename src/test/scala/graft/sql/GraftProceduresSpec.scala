package graft.sql

import graft.SparkSpec
import graft.ingest.TokenGen
import graft.table.TokenTable

/** `CALL graft.system.<proc>(...)` stored procedures: each maintenance
  * op callable from plain SQL, with positional and named arguments,
  * defaults applied, state preserved, and results returned as a
  * relation.
  */
class GraftProceduresSpec extends SparkSpec {

  private def withCatalog[A](f: => A): A = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    try f finally spark.conf.unset("spark.sql.catalog.graft")
  }

  /** A table with many small files (8 commits x 2 partitions). */
  private def seeded(name: String, rows: Int = 400, commits: Int = 8): String = {
    val loc = tmpDir(name)
    val t = TokenTable.create(spark, loc)
    val per = rows / commits
    (0 until commits).foreach { c =>
      t.append(TokenGen.asTokenRows(
        TokenGen.generate(spark, per, idOffset = c.toLong * per, numPartitions = 2)))
    }
    loc
  }

  test("CALL system.compact bin-packs, returns counts, preserves state") {
    withCatalog {
      val loc = seeded("proc_compact")
      val before = checksum(TokenTable.open(spark, loc).scan())
      val filesBefore = TokenTable.open(spark, loc).filesLocal(
        TokenTable.open(spark, loc).current).size

      val r = spark.sql(
        s"CALL graft.system.compact(table => '$loc', target_bytes => ${64 * 1024 * 1024})")
      val row = r.head()
      assert(r.columns.toSeq == Seq(
        "version", "bins_rewritten", "files_in", "files_out", "bytes_in"))
      assert(row.getAs[Int]("files_in") > row.getAs[Int]("files_out"),
        "compaction must reduce file count on a many-small-files table")

      val t = TokenTable.open(spark, loc)
      assert(t.filesLocal(t.current).size < filesBefore)
      assert(checksum(t.scan()) == before, "compaction must preserve table state")
    }
  }

  test("CALL system.compact(rechunk => true) consolidates fragmented groups") {
    withCatalog {
      val loc = tmpDir("proc_rechunk")
      val t = TokenTable.create(spark, loc)
      spark.conf.set("graft.write.rowGroupBytes", (48 * 1024).toString)
      try {
        t.append(TokenGen.asTokenRows(TokenGen.generate(
          spark, 8000, minLen = 64, maxLen = 128, numPartitions = 1)))
      } finally spark.conf.unset("graft.write.rowGroupBytes")
      val f0 = t.filesLocal(t.current).head
      assert(f0.groups > 10, s"fixture must be fragmented: ${f0.groups}")
      val before = checksum(t.scan())
      val target = math.max(1L << 20, f0.bytes / 2) // file too big for default candidacy
      val row = spark.sql(
        s"CALL graft.system.compact(table => '$loc', target_bytes => $target, " +
          "parallelism => 2, rechunk => true)").head()
      assert(row.getAs[Int]("bins_rewritten") == 1)
      val after = TokenTable.open(spark, loc)
      assert(after.filesLocal(after.current).forall(_.groups <= 2),
        "rechunk must consolidate row groups")
      assert(checksum(after.scan()) == before)
    }
  }

  test("CALL system.rollback restores an ancestor; bad version fails loudly") {
    withCatalog {
      val loc = seeded("proc_rollback")
      val t = TokenTable.open(spark, loc)
      val v0 = t.currentVersion
      val keep = checksum(t.scan())
      graft.maintain.Delete.deleteWhere(t,
        org.apache.spark.sql.functions.col("n_tok") > 50, "procrb-del")
      val row = spark.sql(
        s"CALL graft.system.rollback(table => '$loc', version => $v0)").head()
      assert(row.getAs[Long]("rolled_back_to") == v0)
      assert(row.getAs[Long]("version") == v0 + 2)
      assert(checksum(TokenTable.open(spark, loc).scan()) == keep)
      intercept[Exception] {
        spark.sql(s"CALL graft.system.rollback(table => '$loc', version => 99)").collect()
      }
    }
  }

  test("CALL system.schema_history tracks evolution and flags the changing versions") {
    withCatalog {
      val loc = seeded("proc_schemahist", rows = 40, commits = 2)
      spark.sql(s"ALTER TABLE graft.`$loc` ADD COLUMN lang STRING")
      spark.sql(s"ALTER TABLE graft.`$loc` RENAME COLUMN lang TO language")
      val rows = spark.sql(
        s"CALL graft.system.schema_history('$loc')").collect()
      // v0 create, v1-v2 appends, v3 add, v4 rename.
      assert(rows.length == 5)
      val byVersion = rows.map(r => r.getLong(0) -> r).toMap
      assert(byVersion(0L).getBoolean(3), "v0 introduces the schema")
      assert(!byVersion(1L).getBoolean(3) && !byVersion(2L).getBoolean(3),
        "appends do not change the schema")
      assert(byVersion(3L).getBoolean(3) && byVersion(3L).getString(2).contains("lang"))
      assert(byVersion(4L).getBoolean(3) && byVersion(4L).getString(2).contains("language"))
      assert(!byVersion(2L).getString(2).contains("lang"))
    }
  }

  test("CALL system.cluster with each curve; bad curve fails loudly") {
    withCatalog {
      val loc = seeded("proc_cluster")
      val before = checksum(TokenTable.open(spark, loc).scan())
      for (curve <- Seq("zorder", "hilbert", "by_doc_id")) {
        val row = spark.sql(
          s"CALL graft.system.cluster('$loc', '$curve')").head()
        assert(row.getAs[Int]("buckets") >= 1)
        assert(checksum(TokenTable.open(spark, loc).scan()) == before,
          s"$curve clustering must preserve table state")
      }
      // After the by_doc_id pass the layout is disjoint: a repeat call
      // carries files (incremental default); full => true forces a
      // complete rewrite.
      val again = spark.sql(
        s"CALL graft.system.cluster(table => '$loc', curve => 'by_doc_id', " +
          "target_bytes => 65536)").head()
      assert(again.getAs[Int]("carried_files") > 0,
        "repeat by_doc_id cluster must carry in-layout files")
      val forced = spark.sql(
        s"CALL graft.system.cluster(table => '$loc', curve => 'by_doc_id', " +
          "target_bytes => 65536, full => true)").head()
      assert(forced.getAs[Int]("carried_files") == 0)
      assert(checksum(TokenTable.open(spark, loc).scan()) == before)

      val e = intercept[Exception] {
        spark.sql(s"CALL graft.system.cluster('$loc', 'peano')").collect()
      }
      assert(e.getMessage.contains("peano"))
    }
  }

  test("CALL system.expire_snapshots prunes history; snapshots lists the rest") {
    withCatalog {
      val loc = seeded("proc_expire")
      val headBefore = TokenTable.open(spark, loc).currentVersion
      assert(spark.sql(s"CALL graft.system.snapshots('$loc')").count() ==
        headBefore + 1)

      val row = spark.sql(
        s"CALL graft.system.expire_snapshots(table => '$loc', retain_last => 2, grace_ms => 0)")
        .head()
      assert(row.getAs[Int]("expired_snapshots") == (headBefore + 1 - 2).toInt)

      val left = spark.sql(s"CALL graft.system.snapshots('$loc')")
      assert(left.count() == 2)
      assert(left.select("version").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(headBefore - 1, headBefore))
      // Latest state still scans exactly.
      assert(TokenTable.open(spark, loc).scan().count() == 400)
    }
  }

  test("procedures work under any catalog name") {
    spark.conf.set("spark.sql.catalog.lake", "graft.sql.GraftCatalog")
    try {
      val loc = seeded("proc_altname", rows = 100, commits = 2)
      assert(spark.sql(s"CALL lake.system.snapshots('$loc')").count() == 3)
      val r = spark.sql(
        s"CALL lake.system.compact(table => '$loc', target_bytes => 1048576)").head()
      assert(r.getAs[Int]("files_in") > 0)
      assert(spark.sql(
        s"SELECT count(*) FROM lake.`$loc`").head().getLong(0) == 100)
    } finally spark.conf.unset("spark.sql.catalog.lake")
  }

  test("CALL system.files lists the inventory with exact stats; version pins a snapshot") {
    withCatalog {
      val loc = seeded("proc_files", rows = 200, commits = 4)
      val t = TokenTable.open(spark, loc)
      val manifest = t.filesLocal(t.current)
      val listed = spark.sql(s"CALL graft.system.files('$loc')")
      assert(listed.count() == manifest.size)
      assert(listed.selectExpr("sum(bytes)").head().getLong(0) ==
        manifest.map(_.bytes).sum)
      assert(listed.selectExpr("sum(rows)").head().getLong(0) == 200L)
      assert(listed.selectExpr("min(min_doc_id)").head().getString(0) ==
        manifest.map(_.minDocId).min)
      // Pin an earlier version: fewer files.
      val atV1 = spark.sql(
        s"CALL graft.system.files(table => '$loc', version => 1)")
      assert(atV1.count() < manifest.size && atV1.count() > 0)
      // NULL arguments fail loudly (string AND numeric — InternalRow
      // getters would otherwise coerce NULL to 0), as do non-positive
      // sizes and a mistyped snapshots path.
      val e = intercept[Exception] {
        spark.sql("CALL graft.system.files(CAST(NULL AS STRING))").collect()
      }
      assert(e.getMessage.toLowerCase.contains("null"))
      val e2 = intercept[Exception] {
        spark.sql(s"CALL graft.system.compact(table => '$loc', " +
          "target_bytes => CAST(NULL AS BIGINT))").collect()
      }
      assert(e2.getMessage.toLowerCase.contains("null"))
      val e3 = intercept[Exception] {
        spark.sql(s"CALL graft.system.compact(table => '$loc', target_bytes => 0)")
          .collect()
      }
      assert(e3.getMessage.contains("positive"))
      val e4 = intercept[Exception] {
        spark.sql("CALL graft.system.snapshots('/no/such/table')").collect()
      }
      assert(e4.getMessage.contains("no table"))
    }
  }

  test("unknown procedure and SHOW PROCEDURES") {
    withCatalog {
      val e = intercept[Exception] {
        spark.sql("CALL graft.system.frobnicate('/nope')").collect()
      }
      assert(e.getMessage.contains("frobnicate"))
      val listed = spark.sql("SHOW PROCEDURES IN graft.system")
        .select("procedure_name").collect().map(_.getString(0)).toSet
      assert(Set("compact", "cluster", "expire_snapshots", "snapshots", "files")
        .subsetOf(listed))
    }
  }
}
