package graft.maintain

import graft.SparkSpec
import graft.ingest.TokenGen
import graft.table.TokenTable

/** ByDocId range clustering: preserves state, produces doc_id-disjoint
  * files, and makes MERGE file pruning actually selective.
  */
class ClusterByDocIdSpec extends SparkSpec {

  test("cluster-by-docid: state preserved, files have near-disjoint doc_id ranges") {
    val dir = tmpDir("cbd")
    val t = TokenTable.create(spark, dir)
    (0 until 8).foreach { i =>
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 300, idOffset = i * 300L, numPartitions = 2)))
    }
    val before = checksum(t.scan())
    val res = Cluster.run(t, Cluster.ByDocId, "job-cbd", targetBytes = 64L * 1024)
    assert(res.buckets > 2)
    assert(checksum(t.scan()) == before)

    // Sorted by minDocId, consecutive files must not overlap much:
    // with an exact range partition on unique keys, overlaps only occur
    // at boundary duplication — assert strictly increasing min ranges
    // and >= 80% of consecutive pairs fully disjoint.
    val files = t.filesLocal(t.current).sortBy(_.minDocId)
    val pairs = files.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
    val disjoint = pairs.count { case (a, b) => a.maxDocId <= b.minDocId }
    assert(disjoint.toDouble / pairs.size >= 0.8,
      s"only $disjoint/${pairs.size} consecutive file pairs are doc_id-disjoint")
  }

  test("after cluster-by-docid, MERGE with a narrow key range touches few files") {
    val dir = tmpDir("cbd2")
    val t = TokenTable.create(spark, dir)
    (0 until 8).foreach { i =>
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 300, idOffset = i * 300L, numPartitions = 2)))
    }
    Cluster.run(t, Cluster.ByDocId, "job-cbd2", targetBytes = 64L * 1024)
    val filesTotal = t.filesLocal(t.current).size
    // Narrow source: 20 consecutive ids out of 2400.
    val src = TokenGen.generate(spark, 20, idOffset = 1000, numPartitions = 1)
    val res = Merge.mergeInto(t, src, "offset", "job-cbd2-merge")
    assert(res.touchedFiles < filesTotal / 2,
      s"expected pruning: touched ${res.touchedFiles} of $filesTotal files")
    assert(res.untouchedFiles + res.touchedFiles == filesTotal)
    assert(t.scan().count() == 2400, "narrow merge must only update, not grow")
  }
}
