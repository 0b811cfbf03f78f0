package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the training-data ops that have no DuckDB oracle
  * (approximate algorithms) plus sanity coverage of the exact ones.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("LSH ANN achieves useful recall vs brute-force top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 5, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, nQueries = 5, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 12 planes over 64-dim gaussian vectors: same-bucket candidates are
    // few; recall is approximate by design — assert it's clearly better
    // than random (random would be ~10/500 = 2%).
    assert(recall >= 0.2, s"LSH recall $recall vs brute force")
    // Every ANN neighbor must be a real row, never the query itself.
    assert(approx.forall { case (q, n) => q != n })
  }

  test("embedding near-dup detection finds planted duplicates") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // embeddingDups plants exact duplicates internally: vec_id%10==0
    // re-keyed +10000 with identical embedding.
    val dups = Similarity.embeddingDups(emb)
      .as[(Long, Long)].collect().toSet
    val expected = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id", ($"vec_id" + Similarity.PlantedIdOffset))
      .as[(Long, Long)].collect().toSet
    // Identical vectors always share every LSH bucket -> 100% recall on
    // exact duplicates (quantized cosine of identical vectors is 1).
    assert(expected.subsetOf(dups),
      s"missed ${(expected -- dups).size} of ${expected.size} planted dups")
  }

  test("simhash hamming join finds exact duplicates and verifies distance") {
    val aug = Dedup.augmented(spark, dir)
    val pairs = Dedup.simhashHamming(aug)
      .select($"a", $"b", $"hamming").as[(Long, Long, Long)].collect()
    // Exact duplicates (+200000) have identical word multisets -> the
    // same 60-bit simhash -> hamming 0 -> always in some shared band.
    val exactPlanted = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id".cast("long"), ($"doc_id" + 200000).cast("long"))
      .as[(Long, Long)].collect().toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(exactPlanted.subsetOf(found),
      s"simhash missed ${(exactPlanted -- found).size} exact duplicates")
    // Every emitted pair respects the verified hamming bound.
    assert(pairs.forall(_._3 <= Dedup.SimhashMaxHamming))
  }

  test("IVF ANN achieves useful recall vs brute-force top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 5, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, nQueries = 5, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4 of 16 cells probed = ~25% of the corpus scanned; near neighbors
    // concentrate in nearby cells, so recall must beat the scan rate.
    assert(recall >= 0.3, s"IVF recall $recall vs brute force")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("Lloyd-trained IVF centroids do not lose recall vs the hash-pick seeds") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 5, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(iters: Int): Double = {
      val approx = Similarity.ivfTopK(emb, nQueries = 5, k = 10, lloydIters = iters)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val untrained = recallAt(0) // iters=0 == the pure hash-pick construction
    val trained = recallAt(2)
    assert(trained >= untrained,
      s"k-means centroids lost recall: trained=$trained < hash-pick=$untrained")
  }

  test("IVF at adaptiveCentroids(1e5) ~ sqrt(N) cells keeps recall on a 10^5-vector corpus") {
    // Synthetic clustered corpus: 10^5 vectors in 300 natural clusters
    // (center by hash, small per-vector jitter), dim 16 — the regime the
    // sqrt(N) rule of thumb targets (VERDICT r3 stretch task). All
    // deterministic column expressions, no local RNG.
    import org.apache.spark.sql.functions._
    val n = 100000L
    val emb = spark.range(n).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)), d =>
        (pmod(xxhash64(pmod(xxhash64($"id"), lit(300L)), d), lit(200L)) - 100L +
          pmod(xxhash64($"id", d), lit(11L)) - 5L).cast("float")
      ).as("embedding"))
    val c = Similarity.adaptiveCentroids(n)
    assert(c >= 300 && c <= 320, s"sqrt rule: got $c")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 5, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, nQueries = 5, k = 10,
      nCentroids = c, nProbe = 8, lloydIters = 1, sampleMod = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 8 of ~316 cells probed = ~2.5% of the corpus scanned; clustered
    // neighbors must concentrate: recall far above the scan rate.
    assert(recall >= 0.5, s"IVF recall $recall at C=$c, nProbe=8 (scan rate ~2.5%)")
  }

  test("multimodal: frame sampling and resize preserve byte-level invariants") {
    val media = Multimodal.mediaTable(spark, dir)
    val frames = Multimodal.sampleFrames(media, frameSize = 32, stride = 2).collect()
    assert(frames.nonEmpty)
    // Every sampled frame index is even (stride 2) and <= frameSize long.
    assert(frames.forall(f => f.frame_idx % 2 == 0 && f.frame_len <= 32 && f.frame_len > 0))
    // Frame sums reconstruct from the source payload exactly.
    val payloads = media.collect().map(r => r.doc_id -> r.media).toMap
    frames.take(50).foreach { f =>
      val p = payloads(f.doc_id)
      val off = (f.frame_idx * 32).toInt
      val expected = p.slice(off, off + f.frame_len.toInt).map(_ & 0xff).map(_.toLong).sum
      assert(f.frame_sum == expected, s"doc ${f.doc_id} frame ${f.frame_idx}")
    }
    // Resize keeps every 4th byte; length is ceil(n/4).
    val resized = Multimodal.resize(media, factor = 4).collect().map(r => r.doc_id -> r).toMap
    payloads.foreach { case (id, p) =>
      val r = resized(id)
      assert(r.media.length == (p.length + 3) / 4)
      assert(r.n_bytes == r.media.length.toLong)
      r.media.zipWithIndex.foreach { case (b, i) => assert(b == p(i * 4)) }
    }
  }

  test("multimodal: partition-wise feature extraction is deterministic and schema-correct") {
    val media = Multimodal.mediaTable(spark, dir)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "first_byte", "feat"))
    val r = feats.orderBy($"doc_id").head()
    assert(r.feat.length == 8)
    // Deterministic across runs (stub decoder is pure).
    val c1 = feats.agg(sum($"n_bytes")).head().getLong(0)
    val c2 = Multimodal.extractFeatures(media).agg(sum($"n_bytes")).head().getLong(0)
    assert(c1 == c2 && c1 > 0)
    // n_bytes metadata matches the actual payload length.
    assert(media.filter(octet_length($"media") =!= $"n_bytes").count() == 0)
  }

  test("minhash LSH finds planted near-duplicates with high recall") {
    val aug = Dedup.augmented(spark, dir)
    val pairs = Dedup.minhashLsh(aug).select($"a", $"b").as[(Long, Long)]
      .collect().toSet
    // Exact duplicates (+200000) must ALL be found (identical signatures).
    val exactPlanted = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id".cast("long"), ($"doc_id" + 200000).cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(exactPlanted.subsetOf(pairs),
      s"minhash missed ${(exactPlanted -- pairs).size} exact duplicates")
    // Near-duplicates (+100000, one appended word): high but not
    // necessarily perfect recall.
    val nearPlanted = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id".cast("long"), ($"doc_id" + 100000).cast("long"))
      .as[(Long, Long)].collect().toSet
    val recall = (nearPlanted & pairs).size.toDouble / nearPlanted.size
    assert(recall >= 0.8, s"minhash near-dup recall $recall")
  }

  test("corpus split is deterministic, keyed on doc_id only, and near the target ratios") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = docs.select($"doc_id", Corpus.splitCol($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    // Same assignment on a differently-partitioned copy of the ids.
    val b = docs.select($"doc_id").repartition(7)
      .select($"doc_id", Corpus.splitCol($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    assert(a == b, "split must be a pure function of doc_id")
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1, s"train frac ${frac("train")}")
    assert(frac.keySet == Set("train", "val", "test"))
  }

  test("contamination finds planted duplicates that straddle the train/eval boundary") {
    val aug = Dedup.augmented(spark, dir)
    val pairs = Corpus.contamination(
        train = aug.filter($"doc_id" % 17 =!= 0),
        eval = aug.filter($"doc_id" % 17 === 0))
      .select($"train_id", $"eval_id").as[(Long, Long)].collect().toSet
    // Every eval doc (id%17==0, id%4==0) whose exact copy id+200000 is
    // in train must be flagged (identical shingle sets).
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" % 17 === 0 && $"doc_id" % 4 === 0 &&
        ($"doc_id" + 200000) % 17 =!= 0)
      .select(($"doc_id" + 200000), $"doc_id")
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must plant cross-boundary duplicates")
    assert(expected.subsetOf(pairs),
      s"missed ${(expected -- pairs).size} of ${expected.size} planted contaminations")
  }

  test("text ops: language ID prefers the marker language; fingerprint collapses word order") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist zu den"),
      (3L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "und")
    val fps = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta alpha"))
      .toDF("doc_id", "text")
      .select(TextOps.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1), "fingerprint must ignore order and multiplicity")
  }

  test("repetition metrics: permille dup fractions for words, grams, lines") {
    val dir = tmpDir("rep_docs")
    Seq((1L, "a b a b"), (2L, "x\nx\ny"), (3L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.repetitionQuery(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // "a b a b": 4 words 2 distinct -> 500pm; bigrams [a b, b a, a b] ->
    // dup 333pm, top gram "a b" covers 2/3 -> 666pm; trigrams
    // [a b a, b a b] -> 0; one line -> 0.
    assert(out(1L) == ((4L, 500L, 333L, 0L, 0L, 666L)))
    // "x\nx\ny": words [x,x,y] -> 333pm; lines [x,x,y] -> 333pm;
    // bigrams [x x, x y] unique -> top 500pm.
    assert(out(2L) == ((3L, 333L, 0L, 0L, 333L, 500L)))
    // Empty text: zeros except the n<width collapse yields one '' gram,
    // so the top gram trivially covers 1000pm.
    assert(out(3L) == ((0L, 0L, 0L, 0L, 0L, 1000L)))
  }

  test("line_dedup_doc: first occurrence wins, empties and trailing parts exact") {
    import graft.functions.TextGrams
    val cases = Seq(
      "a\nb\na\nc" -> "a\nb\nc",
      "x" -> "x",
      "" -> "",
      "a\n\nb\n\na\n" -> "a\n\nb", // blank lines dedup like any line
      "same\nsame\nsame" -> "same",
      "NAV\nbody text\nNAV" -> "NAV\nbody text")
    val out = cases.map(_._1).toDF("text")
      .select(TextGrams.lineDedupDoc($"text").as("d")).as[String].collect()
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want ${want.replace("\n", "\\n")} got ${got.replace("\n", "\\n")}")
    }
    // SQL registration parity.
    graft.functions.TextGrams.register(spark)
    assert(spark.sql("SELECT line_dedup_doc('p\np\nq')").head().getString(0) == "p\nq")
  }

  test("scrub redacts emails and URLs exactly, counts per doc") {
    val rows = Seq(
      (1L, "hello bob@ex.com and carol+x@sub.ex.org end"),
      (2L, "see https://a.b/c?skip and http://plain.net/p_1 done"),
      (3L, "mixed joe@x.io at https://y.z/joe today"),
      (4L, "nothing to scrub here")).toDF("doc_id", "text")
    val got = TextOps.scrub(rows)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == Seq(
      (1L, 2L, 0L), (2L, 0L, 2L), (3L, 1L, 1L), (4L, 0L, 0L)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    assert(got(0)._4 == md5("hello <EMAIL> and <EMAIL> end"))
    // '?' is outside the URL class: the match stops before it.
    assert(got(1)._4 == md5("see <URL>?skip and <URL> done"))
    assert(got(2)._4 == md5("mixed <EMAIL> at <URL> today"))
    assert(got(3)._4 == md5("nothing to scrub here"))
  }
}
