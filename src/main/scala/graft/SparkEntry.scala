package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry with a matching `oracleSql` is verified by the
  * driver against DuckDB on the same parquet tables; maintenance-engine
  * entries (m1/m2/m6/m4) build a real TokenTable, run the operator, and
  * scan back — so the oracle checks the engine end-to-end.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full maintenance cycle (ingest -> compact -> scan).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.m1CompactScan(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // North-star maintenance ops (end-to-end TokenTable round-trips)
    "m1_compact_scan" -> ((s, d) => Queries.m1CompactScan(s, d)),
    "m2_zorder_scan" -> ((s, d) => Queries.m2ZorderScan(s, d)),
    "m2_hilbert_scan" -> ((s, d) => Queries.m2HilbertScan(s, d)),
    "m6_merge_scan" -> ((s, d) => Queries.m6MergeScan(s, d)),
    "m6_merge_sql_scan" -> ((s, d) => Queries.m6MergeSqlScan(s, d)),
    "m8_catalog_sql_scan" -> ((s, d) => Queries.m8CatalogSqlScan(s, d)),
    "m8_call_procedures_scan" -> ((s, d) => Queries.m8CallProceduresScan(s, d)),
    "m9_delete_sql_scan" -> ((s, d) => Queries.m9DeleteSqlScan(s, d)),
    "m9_update_sql_scan" -> ((s, d) => Queries.m9UpdateSqlScan(s, d)),
    "m10_schema_evolution_scan" -> ((s, d) => Queries.m10SchemaEvolutionScan(s, d)),
    "m4_expire_scan" -> ((s, d) => Queries.m4ExpireScan(s, d)),
    "m5_timetravel_scan" -> ((s, d) => Queries.m5TimeTravelScan(s, d)),
    "m5_rollback_scan" -> ((s, d) => Queries.m5RollbackScan(s, d)),
    "m5_incremental_scan" -> ((s, d) => Queries.m5IncrementalScan(s, d)),
    "m5_agg_pushdown" -> ((s, d) => Queries.m5AggPushdownScan(s, d)),
    "m2_docid_cluster_scan" -> ((s, d) => Queries.m2DocIdClusterScan(s, d)),
    "m7_lineage_metrics" -> ((s, d) => Queries.m7LineageMetrics(s, d)),
    // Reference-pipeline operators (SURVEY.md §2)
    "d1_dedup_firstwins" -> ((s, d) => Queries.d1DedupFirstWins(s, d)),
    "d2_sort_limit" -> ((s, d) => Queries.d2SortLimit(s, d)),
    "t1_batch_trigger" -> ((s, d) => Queries.t1BatchTrigger(s, d)),
    "p1_parse_project" -> ((s, d) => Queries.p1ParseProject(s, d)),
    "p1_typed_parse" -> ((s, d) => Queries.p1TypedParse(s, d)),
    "p2_proto_parse" -> ((s, d) => Queries.p2ProtoParse(s, d)),
    "m3_stats_agg" -> ((s, d) => Queries.m3StatsAgg(s, d)),
    "m4_orphan_antijoin" -> ((s, d) => Queries.m4OrphanAntiJoin(s, d)),
    // Training-data pipeline operators
    "text_analyze" -> ((s, d) => ops.TextOps.analyze(s, d)),
    "dedup_exact" -> ((s, d) => ops.Dedup.exact(ops.Dedup.augmented(s, d))),
    "dedup_minhash_lsh" -> ((s, d) => ops.Dedup.minhashLsh(ops.Dedup.augmented(s, d))),
    "dedup_simhash" -> ((s, d) => ops.Dedup.simhashDups(ops.Dedup.augmented(s, d))),
    "dedup_simhash_hamming" -> ((s, d) => ops.Dedup.simhashHamming(ops.Dedup.augmented(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => ops.Dedup.ngramJaccard(ops.Dedup.augmented(s, d))),
    "sim_bruteforce_topk" -> ((s, d) =>
      ops.Similarity.bruteForceTopK(s.read.parquet(s"$d/embeddings.parquet"))),
    "sim_lsh_ann" -> ((s, d) =>
      ops.Similarity.lshTopK(s.read.parquet(s"$d/embeddings.parquet"))),
    "dedup_embedding" -> ((s, d) =>
      ops.Similarity.embeddingDups(s.read.parquet(s"$d/embeddings.parquet"))),
    "multimodal_features" -> ((s, d) => ops.Multimodal.featureSummary(s, d)),
    "multimodal_frames" -> ((s, d) => ops.Multimodal.frames(s, d)),
    "corpus_split" -> ((s, d) => ops.Corpus.splitCounts(s, d)),
    "corpus_contamination" -> ((s, d) => ops.Corpus.contaminationQuery(s, d)),
    "sim_ivf_ann" -> ((s, d) =>
      ops.Similarity.ivfTopK(s.read.parquet(s"$d/embeddings.parquet"))),
    "dedup_clusters" -> ((s, d) => ops.Components.dupClusters(s, d)),
    "corpus_pack" -> ((s, d) => ops.Corpus.packQuery(s, d)),
    "corpus_sample" -> ((s, d) => ops.Corpus.sampleQuery(s, d)),
    "corpus_domain_mix" -> ((s, d) => ops.Corpus.domainMixQuery(s, d)),
    "corpus_quality_filter" -> ((s, d) => ops.Corpus.qualityFilterQuery(s, d)),
    "dedup_lines" -> ((s, d) => ops.Dedup.lineDedupQuery(s, d)),
    "dedup_substring" -> ((s, d) => ops.Dedup.substringDedupQuery(s, d)),
    "corpus_vocab" -> ((s, d) => ops.TextOps.vocabQuery(s, d)),
    "text_scrub" -> ((s, d) => ops.TextOps.scrubQuery(s, d)),
    "text_line_dedup_doc" -> ((s, d) => ops.TextOps.lineDedupDocQuery(s, d)),
    "text_repetition" -> ((s, d) => ops.TextOps.repetitionQuery(s, d)),
    "text_lang_confusion" -> ((s, d) => ops.TextOps.langConfusionQuery(s, d)),
    "text_lm_perplexity" -> ((s, d) => ops.LmScore.scoreQuery(s, d)),
    "corpus_pipeline_e2e" -> ((s, d) => ops.Corpus.pipelineQuery(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "m1_compact_scan" -> Queries.tokenizedDocsSql,
    "m2_zorder_scan" -> Queries.tokenizedDocsSql,
    "m2_hilbert_scan" -> Queries.tokenizedDocsSql,
    "m6_merge_scan" -> Queries.m6MergeSql,
    "m6_merge_sql_scan" -> Queries.m6MergeSql, // same post-merge state via SQL text
    "m8_catalog_sql_scan" -> Queries.m6MergeSql, // same state, built via DSv2 catalog SQL
    "m8_call_procedures_scan" -> Queries.tokenizedDocsSql, // CALL procs are state-preserving
    "m9_delete_sql_scan" -> Queries.m9DeleteSql,
    "m9_update_sql_scan" -> Queries.m9UpdateSql,
    "m10_schema_evolution_scan" -> Queries.m10SchemaEvolutionSql,
    "m4_expire_scan" -> Queries.tokenizedDocsSql,
    "m5_timetravel_scan" -> Queries.tokenizedDocsSql,
    "m5_rollback_scan" -> Queries.tokenizedDocsSql, // rollback restores the base state
    "m5_incremental_scan" -> Queries.m5IncrementalSql,
    "m5_agg_pushdown" -> Queries.m5AggPushdownSql,

    "m2_docid_cluster_scan" -> Queries.tokenizedDocsSql,
    "m7_lineage_metrics" -> Queries.m7Sql,
    "d1_dedup_firstwins" -> Queries.d1Sql,
    "d2_sort_limit" -> Queries.d2Sql,
    "t1_batch_trigger" -> Queries.t1Sql,
    "p1_parse_project" -> Queries.p1Sql,
    "p1_typed_parse" -> Queries.p1TypedSql,
    "p2_proto_parse" -> Queries.p2ProtoSql,
    "m3_stats_agg" -> Queries.m3Sql,
    "m4_orphan_antijoin" -> Queries.m4Sql,
    "text_analyze" -> ops.TextOps.analyzeSql,
    "dedup_exact" -> ops.Dedup.exactSql,
    "dedup_minhash_lsh" -> ops.Dedup.minhashSql,
    "dedup_simhash" -> ops.Dedup.simhashSql,
    "dedup_simhash_hamming" -> ops.Dedup.simhashHammingSql,
    "dedup_ngram_jaccard" -> ops.Dedup.ngramJaccardSql,
    "sim_bruteforce_topk" -> ops.Similarity.bruteForceSql,
    "sim_lsh_ann" -> ops.Similarity.lshTopKSql(),
    "dedup_embedding" -> ops.Similarity.embeddingDupsSql(),
    "multimodal_features" -> ops.Multimodal.featureSummarySql,
    "multimodal_frames" -> ops.Multimodal.framesSql,
    "corpus_split" -> ops.Corpus.splitCountsSql,
    "corpus_contamination" -> ops.Corpus.contaminationSql,
    "sim_ivf_ann" -> ops.Similarity.ivfTopKSql(),
    "dedup_clusters" -> ops.Components.dupClustersSql,
    "corpus_pack" -> ops.Corpus.packSql,
    "corpus_sample" -> ops.Corpus.sampleSql,
    "corpus_domain_mix" -> ops.Corpus.domainMixSql,
    "corpus_quality_filter" -> ops.Corpus.qualityFilterSql,
    "dedup_lines" -> ops.Dedup.lineDedupSql,
    "dedup_substring" -> ops.Dedup.substringDedupSql,
    "corpus_vocab" -> ops.TextOps.vocabSql,
    "text_scrub" -> ops.TextOps.scrubSql,
    "text_line_dedup_doc" -> ops.TextOps.lineDedupDocSql,
    "text_repetition" -> ops.TextOps.repetitionSql,
    "text_lang_confusion" -> ops.TextOps.langConfusionSql,
    "text_lm_perplexity" -> ops.LmScore.scoreSql,
    "corpus_pipeline_e2e" -> ops.Corpus.pipelineSql,
  )
}
