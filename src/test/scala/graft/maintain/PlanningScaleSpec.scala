package graft.maintain

import graft.SparkSpec
import graft.table.{DataFile, Manifests, Snapshot, TokenTable}

/** Maintenance planning at 10^6 files (VERDICT r3 task 4): bin packing,
  * the merge segment index, and survivor-manifest writes all work off
  * the streamed manifest iterator with bounded driver structures — no
  * full-inventory `filesLocal` materialization on any maintenance path.
  * (The data files deliberately do not exist: planning is pure metadata;
  * a path that touched data would fail loudly here.)
  */
class PlanningScaleSpec extends SparkSpec {
  import spark.implicits._

  private val N = 1000000

  /** One table with a 10^6-row manifest inventory across 4 manifests:
    * file i spans doc_<i>0..doc_<i>9, sizes cycle so ~half are
    * compaction candidates.
    */
  private lazy val table: TokenTable = {
    val loc = tmpDir("plan_scale")
    val t = TokenTable.create(spark, loc)
    (0 until 4).foreach { m =>
      Manifests.writeLocal(s"$loc/metadata/manifest-big-$m",
        (m * (N / 4) until (m + 1) * (N / 4)).map { i =>
          DataFile(f"data/f$i%07d.parquet",
            bytes = if (i % 2 == 0) 1L << 20 else 100L << 20,
            rows = 10L,
            minDocId = f"doc_$i%07d0", maxDocId = f"doc_$i%07d9",
            minNtok = 16, maxNtok = 32, sumNtok = 240L,
            minSource = "web", maxSource = "web")
        })
    }
    val snap = Snapshot(1, 0, TokenTable.tokenSchema.json, "append",
      (0 until 4).map(m => s"metadata/manifest-big-$m"), Map.empty, 2L)
    assert(graft.table.Format.tryPublish(loc, snap))
    t
  }

  test("compaction plans 10^6 files via the stream with a bounded candidate heap") {
    val t0 = System.nanoTime()
    val (bins, total) = Compact.planBinsStreaming(
      t.filesStream(t.current), targetBytes = 64L << 20,
      maxCandidates = 10000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(total == N)
    val plannedFiles = bins.map(_.size).sum
    assert(plannedFiles > 0 && plannedFiles <= 10000,
      s"candidate cap must bound the plan, planned $plannedFiles")
    // The capped heap keeps the SMALLEST candidates: every planned file
    // is a 1MB file, no 100MB file sneaks in.
    assert(bins.flatten.forall(_.bytes == 1L << 20))
    // Deterministic: replanning the same stream yields the same bins.
    val (bins2, _) = Compact.planBinsStreaming(
      t.filesStream(t.current), targetBytes = 64L << 20, maxCandidates = 10000)
    assert(bins.map(_.map(_.path)) == bins2.map(_.map(_.path)))
    assert(secs < 60, s"planning must be a metadata pass, took $secs s")
  }

  private def t = table

  test("merge segment index: exact and coarse (capped) plans agree on soundness") {
    val keys = Seq("doc_00000720", "doc_04253001", "doc_09999917").toDF("doc_id")
    // Explicit huge cap = the exact path (2x10^6 endpoints exceed the
    // default cap, by design).
    val exact = Merge.planPrune(() => t.filesStream(t.current), keys,
      () => t.files(t.current), boundsCap = 2 * N + 10)
    assert(exact.totalFiles == N)
    assert(exact.prune.touchedPaths ==
      Set("data/f0000072.parquet", "data/f0425300.parquet", "data/f0999991.parquet"))
    assert(exact.touched.map(_.path).toSet == exact.prune.touchedPaths)

    // Tiny endpoint cap forces the distributed every-k-th coarsening:
    // the coarse plan must be a SUPERSET of the exact one (sound) and
    // still a vanishing fraction of the inventory (useful).
    val coarse = Merge.planPrune(() => t.filesStream(t.current), keys,
      () => t.files(t.current), boundsCap = 512)
    assert(coarse.prune.bounds.length <= 512 + 2 * 3 + 8,
      s"endpoint array must respect the cap, got ${coarse.prune.bounds.length}")
    assert(exact.prune.touchedPaths.subsetOf(coarse.prune.touchedPaths),
      "coarse pruning must never miss a file the exact plan touches")
    assert(coarse.prune.touchedPaths.size < N / 50,
      s"coarse plan should stay selective, touched ${coarse.prune.touchedPaths.size}")
  }

  test("clustering plans 10^6 files via the stream with a bounded carry heap") {
    val t0 = System.nanoTime()
    // Carry floor below the 100MB files: ~500k candidates, far over the
    // cap — the heap must bound the carry set, never the inventory.
    val (carried, inv) = Cluster.planCarryStreaming(
      t.filesStream(t.current), carryMinBytes = 64L << 20, cap = 10000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(inv.files == N)
    assert(inv.rows == 10L * N)
    assert(inv.maxNtok == 32 && inv.sourceBounds == Set("web"))
    assert(!inv.anyMissingDocStats)
    assert(carried.nonEmpty && carried.size <= 10000,
      s"carry cap must bound the plan, carried ${carried.size}")
    assert(carried.forall(_.bytes == 100L << 20),
      "only files above the carry floor qualify")
    // Mutual doc_id-range disjointness (the carry soundness invariant).
    val ord = graft.functions.Search.utf8Ordering
    val sorted = carried.sortBy(_.minDocId)(ord)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(ord.lt(a.maxDocId, b.minDocId),
        s"carried files must be range-disjoint: ${a.path} vs ${b.path}")
      case _ =>
    }
    // Deterministic: replanning the same stream yields the same set.
    val (carried2, _) = Cluster.planCarryStreaming(
      t.filesStream(t.current), carryMinBytes = 64L << 20, cap = 10000)
    assert(carried.map(_.path) == carried2.map(_.path))
    // The curve path's fold: same totals, one streamed pass.
    val inv2 = Cluster.summarize(t.filesStream(t.current))
    assert(inv2 == inv)
    assert(secs < 60, s"planning must be a metadata pass, took $secs s")
  }

  test("survivor manifest for 10^6 files writes distributed, counts exact") {
    val removed = (0 until 100).map(i => f"data/f$i%07d.parquet").toSet
    val extra = Seq(DataFile("data/new-0.parquet", 5L << 20, 1000L,
      "doc_a", "doc_b", 16, 32, 24000L, "web", "web"))
    val rel = t.writeSurvivorManifest(t.current, removed, extra)
    val snap2 = t.current.copy(version = 2, manifests = Seq(rel))
    val rows = t.files(snap2)
    assert(rows.count() == N - 100 + 1)
    assert(rows.filter(_.path == "data/new-0.parquet").count() == 1)
    assert(rows.filter(f => removed.contains(f.path)).count() == 0)
  }
}
