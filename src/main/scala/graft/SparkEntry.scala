package graft

import graft.operators._
import graft.sources.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every SURVEY §2 operator key appears in `queries`; SQL-expressible
  * ones have DuckDB oracles in `oracleSql` (column names match the
  * Spark aliases exactly — the driver hash-compares by sorted column
  * name). Pipeline/model ops are rows-only here and pinned by the
  * golden-fixture ScalaTest suites instead.
  */
object SparkEntry {

  /** Flagship: full KG-construction pipeline on sf0.001 -> triples. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.triples(spark, "/root/testdata/sf0.001")

  /** Corpus row count per dir, memoized (round-2 VERDICT "What's
    * wrong" #2): the testdata is read-only, and without the cache every
    * CONSTRUCTION of the four ranking queries re-ran a count job
    * (cheap parquet-metadata scan, but once per Explain/Verify call).
    */
  private val docsNCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def docsN(s: SparkSession, dir: String): Long =
    docsNCache.computeIfAbsent(dir,
      d => s.read.parquet(s"$d/documents.parquet").count()).longValue()

  /** Committed output dir of the memoized pipe_stream run, per input. */
  private val streamOutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Committed banded-signature dedup index per input dir (the
    * write-once index table q_dedup_incremental's corpus side reads —
    * an index build is an action by nature, memoized like the IVF
    * build; applicationId-scoped path, same reasoning as pipe_sink).
    */
  private val dedupIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def dedupIndexTable(s: SparkSession, dir: String): String =
    dedupIndexCache.computeIfAbsent((s.sparkContext.applicationId, dir), { case (_, d) =>
      // raw-dir hash suffix: the sanitizer is lossy, distinct input
      // dirs must never share a committed index path (round-4 advisor)
      val table = s"${sys.props("java.io.tmpdir")}/graft_dedup_idx_" +
        s"${d}_${s.sparkContext.applicationId}".replaceAll("[^a-zA-Z0-9.]", "_") +
        "_" + java.lang.Long.toHexString(graft.util.Det.hashStr(d))
      val corpus = operators.Dedup
        .withPlantedDups(s.read.parquet(s"$d/documents.parquet"), 20)
        .filter(col("doc_id") < 480)
      operators.Dedup.writeIndex(corpus, table)
      table
    })

  /** Committed span-window index per input dir (SpanDedup.writeWindows
    * — the table q_span_dedup_indexed/q_span_index/q_span_probe read).
    * Built as base-write over the standing corpus (doc_id < 480) plus a
    * crawl-increment APPEND of the rest, so the committed table
    * exercises both maintenance paths before anything reads it.
    */
  private val spanIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def spanIndexTable(s: SparkSession, dir: String): String =
    spanIndexCache.computeIfAbsent((s.sparkContext.applicationId, dir), { case (_, d) =>
      val table = s"${sys.props("java.io.tmpdir")}/graft_span_idx_" +
        s"${d}_${s.sparkContext.applicationId}".replaceAll("[^a-zA-Z0-9.]", "_") +
        "_" + java.lang.Long.toHexString(graft.util.Det.hashStr(d))
      val docs = operators.SpanDedup.withPlantedPassages(
        s.read.parquet(s"$d/documents.parquet"))
      operators.SpanDedup.writeWindows(docs.filter(col("doc_id") < 480), table)
      operators.SpanDedup.appendWindows(docs.filter(col("doc_id") >= 480), table,
        snapshotId = "windows-incr")
      table
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregations / ranking (SURVEY §2.3) ----
    // round 6: the whole ranking family runs over the SHUFFLE-FREE
    // per-document tf (Ranking.tfFromDocs — sort + run-length encode
    // inside the row, guide §2.4); rows/values are identical to the
    // exploded groupBy form (same tokenizer, exact integer counts)
    "q_tf" -> ((s, dir) => Ranking.tfFromDocs(s, dir)),
    "q_df_idf" -> ((s, dir) => Ranking.dfIdfOverTf(Ranking.tfFromDocs(s, dir), docsN(s, dir))),
    "q_tfidf_stats" -> ((s, dir) => Ranking.tfidfStatsOverTf(Ranking.tfFromDocs(s, dir), docsN(s, dir))),
    "q_popularity" -> ((s, dir) => Ranking.popularityOverTf(Ranking.tfFromDocs(s, dir), docsN(s, dir))),
    "q_lu_rank" -> ((s, dir) => Ranking.luRankOverTf(Ranking.tfFromDocs(s, dir), docsN(s, dir), 50)),
    "q_lu_distribution" -> ((s, dir) => Ranking.distribution(s, dir)),
    // full CUBE over (lang, source) — the remaining grouping-sets shape
    // next to q_lu_distribution's ROLLUP
    "q_lu_cube" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("sum_chars"))),
    // ---- relational coverage: joins / windows / set ops / json (SURVEY §2.4-2.6) ----
    "q_agg_lineitem" -> ((s, dir) => Relational.aggLineitem(s, dir)),
    "q_join_broadcast" -> ((s, dir) => Relational.joinBroadcast(s, dir)),
    "q_join_salted" -> ((s, dir) => Relational.joinSalted(s, dir)),
    "q_join_bucketed" -> ((s, dir) => Relational.bucketJoin(s, dir)),
    "q_anti_join" -> ((s, dir) => Relational.antiJoin(s, dir)),
    "q_join_outer" -> ((s, dir) => Relational.joinOuter(s, dir)),
    "q_semi_join" -> ((s, dir) => Relational.semiJoin(s, dir)),
    "q_window_rank" -> ((s, dir) => Relational.windowRank(s, dir)),
    "q_window_frame" -> ((s, dir) => Relational.windowFrame(s, dir)),
    "q_topk_docs" -> ((s, dir) => Relational.topkDocs(s, dir)),
    "q_union_events" -> ((s, dir) => Relational.unionEvents(s, dir)),
    "q_dedup_events" -> ((s, dir) => Relational.dedupEvents(s, dir)),
    "q_json_props" -> ((s, dir) => Relational.jsonProps(s, dir)),
    "q_setops_users" -> ((s, dir) => Relational.setOpsUsers(s, dir)),
    // ---- text analysis (training-data ops) ----
    "q_token_count" -> ((s, dir) => TextAnalysis.tokenCounts(s, dir)),
    "q_quality" -> ((s, dir) => TextAnalysis.quality(s, dir)),
    // learned quality head: frozen averaged-perceptron weights scored
    // as a pure Catalyst linear expression; the independent SQL oracle
    // re-derives the features AND the score with the weights inlined
    "q_quality_learned" -> ((s, dir) => TextAnalysis.qualityLearned(s, dir)),
    // Gopher-style repetition rules (duplicate token/trigram fractions,
    // alpha ratio) — independently re-derived in DuckDB list SQL
    "q_repetition" -> ((s, dir) => TextAnalysis.repetition(s, dir)),
    // PII redaction with planted positives; the md5 of the scrubbed
    // text pins byte-equality of the redaction itself (independent SQL)
    "q_pii_scrub" -> ((s, dir) => TextAnalysis.piiScrub(s, dir)),
    // benchmark decontamination: per-doc trigram overlap against a
    // broadcast eval-set shingle table (the first 25 docs — in-corpus,
    // so detection provably fires at 1.0); independent SQL oracle
    "q_contamination" -> ((s, dir) => TextAnalysis.contamination(s, dir, 25)),
    // decontamination over BPE SUBWORD trigrams (cross word boundaries,
    // robust to re-tokenization) — same broadcast overlap stage;
    // VALUES oracle (BPE is not SQL-expressible)
    "q_contamination_bpe" -> ((s, dir) => TextAnalysis.contaminationBpe(s, dir, 25)),
    // greedy fixed-budget sequence packing per (source, shard) — the
    // training-batch prep step; independent SQL oracle. Budgeted by
    // regex-word counts so DuckDB can re-derive the whole rule;
    // q_pack_bpe below is the production-budget twin (real BPE tokens)
    "q_pack_greedy" -> ((s, dir) => TextAnalysis.packGreedy(s, dir, 512)),
    // real subword token counts from the frozen committed BPE merge
    // table (broadcast encoder in mapPartitions); VALUES oracle — BPE
    // is not DuckDB-expressible, determinism pinned at CPUS=2/8
    "q_bpe_tokens" -> ((s, dir) => TextAnalysis.bpeTokenCounts(s, dir).drop("source")),
    // packing budgeted by REAL BPE tokens — same packGreedyOver rule,
    // the budget a training batch actually fills
    "q_pack_bpe" -> ((s, dir) => TextAnalysis.packGreedyOver(
      TextAnalysis.bpeTokenCounts(s, dir)
        .select(col("doc_id"), col("source"), col("n_bpe_tokens").as("n_tokens")),
      1024, 8)),
    // END-TO-END curation funnel: lang gate -> learned quality gate ->
    // PII scrub -> span scrub (within survivors) -> exact dedup ->
    // greedy packing, as ONE composed job; each stage is the exact
    // rule gated individually, and the DuckDB oracle re-derives the
    // WHOLE funnel from the raw table (fully independent, end to end)
    "q_curation_funnel" -> ((s, dir) => Curation.funnel(s, dir)),
    // substring-level exact dedup (round-4 VERDICT "What's missing"
    // #1): repeated-passage detection + span removal at token-window
    // granularity, planted boilerplate passages, md5-pinned scrubbed
    // text; independent DuckDB list-SQL oracles re-derive both from
    // the window STRINGS (the Spark side joins on xxhash64 keys)
    "q_span_dedup" -> ((s, dir) => SpanDedup.spanScrub(
      SpanDedup.withPlantedPassages(s.read.parquet(s"$dir/documents.parquet")))),
    "q_span_pairs" -> ((s, dir) => SpanDedup.spanDupPairs(
      SpanDedup.withPlantedPassages(s.read.parquet(s"$dir/documents.parquet")))),
    // the scrub fed from the COMMITTED windows index (base write +
    // crawl-increment append both exercised by the builder): the
    // corpus text is scanned exactly once (the rebuild) — both
    // window-side stages scan the index table; output byte-equal to
    // the inline q_span_dedup, same independent DuckDB oracle
    "q_span_dedup_indexed" -> ((s, dir) => SpanDedup.spanScrubOver(
      SpanDedup.withPlantedPassages(s.read.parquet(s"$dir/documents.parquet")),
      SpanDedup.readWindows(s, spanIndexTable(s, dir)))),
    // the committed windows table itself under the gate: totals the
    // oracle re-derives from the window STRINGS (the xxhash64 key
    // never leaves the Spark side)
    "q_span_index" -> ((s, dir) =>
      SpanDedup.readWindows(s, spanIndexTable(s, dir))
        .agg(count(lit(1)).as("n_windows"),
          countDistinct(col("ngram")).as("n_ngrams"),
          countDistinct(col("doc_id")).as("n_docs"))),
    // crawl-increment probe: which NEW docs (doc_id >= 480) carry
    // passages already present in the standing corpus — fresh windows
    // (small, re-extracted) semi-joined against the corpus side of
    // the committed index; the standing corpus is never re-extracted
    "q_span_probe" -> ((s, dir) => {
      val docs = SpanDedup.withPlantedPassages(
        s.read.parquet(s"$dir/documents.parquet"))
      val freshWins = SpanDedup.windows(docs.filter(col("doc_id") >= 480))
      val corpusIdx = SpanDedup.readWindows(s, spanIndexTable(s, dir))
        .filter(col("doc_id") < 480)
      freshWins.join(corpusIdx.select(col("h"), col("ngram")).distinct(),
          Seq("h", "ngram"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_known_windows"))
    }),
    "q_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(s, dir)),
    "q_rolling_fp" -> ((s, dir) => TextAnalysis.rollingFingerprint(s, dir)),
    "q_langid" -> ((s, dir) => TextAnalysis.langIdTable(s, dir)),
    "q_sample_stratified" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(
        s.read.parquet(s"$dir/documents.parquet"),
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.1))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_doc"))),
    "q_filter_lang" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .filter(col("lang") === "en")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))),
    // ---- dedup family ----
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(s, dir)),
    "q_minhash_buckets" -> ((s, dir) =>
      Dedup.minhashBuckets(s.read.parquet(s"$dir/documents.parquet"))),
    "q_simhash" -> ((s, dir) =>
      Dedup.simhashTable(s.read.parquet(s"$dir/documents.parquet"))),
    // ---- near-dup PAIR detection (deterministic planted positives:
    //      withPlantedDups derives edited/verbatim twins from the
    //      read-only docs table, so each stage provably fires) ----
    "q_minhash_pairs" -> ((s, dir) => Dedup.minhashPairs(
      Dedup.withPlantedDups(s.read.parquet(s"$dir/documents.parquet"), 20), 0.6)),
    "q_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(
      Dedup.withPlantedDups(s.read.parquet(s"$dir/documents.parquet"), 20,
        edit = false), 3)),
    "q_jaccard_verify" -> ((s, dir) => Dedup.ngramJaccardPairs(
      Dedup.withPlantedDups(s.read.parquet(s"$dir/documents.parquet"), 20), 0.5)),
    "q_cosine_dup" -> ((s, dir) => Similarity.cosineDupPairsOf(
      Similarity.withPlantedNearVecs(Similarity.loadEmbeddings(s, dir), 20), 0.99)),
    // pairs -> exact-Jaccard VERIFY -> connected-component clusters ->
    // one canonical doc per cluster (the collapse that makes near-dup
    // detection actionable; union of the minhash + simhash detector
    // outputs). Only VERIFIED edges reach the collapse: CC chains
    // transitively, so estimate-only edges would let one borderline
    // false candidate merge unrelated clusters (round-3 VERDICT #2).
    // The collapse itself runs with a TableIO state table — the
    // crash-resumable production shape (fresh dir per construction so
    // bench timings measure full runs, never a resume).
    "q_dedup_clusters" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/documents.parquet")
      val mhDocs = Dedup.withPlantedDups(raw, 20)
      val shDocs = Dedup.withPlantedDups(raw, 20, edit = false)
      // ONE verify pass (round-4 VERDICT "What's wrong" #3: verifying
      // each detector's candidates separately joined the corpus text
      // table 4× and re-shingled the heavily-overlapping planted twins
      // twice): the candidate sets union + distinct FIRST, then a
      // single verifyPairs fetches texts and computes exact Jaccard
      // once per unique pair. Verification runs against the VERBATIM-
      // planted frame: base-doc texts are identical across both frames,
      // and for planted twins verbatim Jaccard (1.0) ≥ edited (~0.97) —
      // both clear the 0.6 gate, so the edge set (and the oracle) is
      // unchanged (regen-diff confirmed).
      val cand = Dedup.minhashPairs(mhDocs, 0.6).select("doc_a", "doc_b")
        .unionByName(Dedup.simhashPairs(shDocs, 3).select("doc_a", "doc_b"))
        .distinct()
      val edges = Dedup.verifyPairs(shDocs, cand, 0.6)
        .select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"))
      val state = java.nio.file.Files.createTempDirectory("graft_cc")
      try {
        // run id = the unique scratch dir name: one id per (edge set,
        // construction), so the ownership check is meaningful
        Dedup.clusters(edges, stateTable = Some(s"$state/labels"),
          runId = state.getFileName.toString)
      } finally {
        // convergence (or failure) has happened by now; the result
        // lives in checkpointed blocks, so the scratch state table can
        // go — and must go on the FAILURE path too, or retries
        // accumulate label tables in tmp forever
        scala.util.Using.resource(java.nio.file.Files.walk(state))(
          _.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete))
      }
    }),
    // incremental ingest: near-dups of a NEW batch (planted twins of
    // old docs + the tail of the corpus) against the existing corpus —
    // no old-x-old candidates, cost scales with the increment. The
    // corpus side reads the COMMITTED banded-signature index table
    // (written once per dir via Dedup.writeIndex, memoized) — the
    // production shape: a daily crawl never re-minhashes the corpus
    "q_dedup_incremental" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/documents.parquet")
      val fresh = Dedup.withPlantedDups(raw, 20).filter(col("doc_id") >= 480)
      Dedup.incrementalPairsIndexed(
        Dedup.readIndex(s, dedupIndexTable(s, dir)), fresh, 0.6)
    }),
    // the COMMITTED index table itself under the gate: per-band row
    // counts and bucket cardinality of the write-once banded-signature
    // index (manifest-committed TableIO snapshot) — what a dedup
    // operator monitors to spot band skew before it becomes a hot
    // bucket at ingest time
    "q_dedup_index" -> ((s, dir) =>
      Dedup.readIndex(s, dedupIndexTable(s, dir))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_sigs"),
          countDistinct(col("bucket")).as("n_buckets"),
          countDistinct(col("doc_id")).as("n_docs"))),
    // the actual corpus prune: every cluster keeps its representative,
    // everything else drops; untouched docs pass through
    "q_dedup_keep" -> ((s, dir) => {
      val docs = Dedup.withPlantedDups(s.read.parquet(s"$dir/documents.parquet"), 20)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // canonical prune DELETES documents — only verified edges may
      // feed the collapse that decides what survives (round-3 VERDICT)
      val pairs = Dedup.verifyPairs(docs,
          Dedup.minhashPairs(docs, 0.6).select("doc_a", "doc_b"), 0.6)
        .select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"))
      val kept = Dedup.canonicalKeep(docs, Dedup.clusters(pairs))
      docs.agg(count(lit(1)).as("n_docs")).crossJoin(
        kept.agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("kept_id_sum")))
        .select(col("n_docs"), col("n_kept"),
          (col("n_docs") - col("n_kept")).as("n_dropped"), col("kept_id_sum"))
    }),
    // ---- similarity search ----
    "q_embed_dims" -> ((s, dir) =>
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), size(col("embedding")).as("dim"), col("label"))),
    // int8 quantization of the embedding table (4x storage at 100 TB)
    // with measured per-label reconstruction error
    "q_embed_quant" -> ((s, dir) => Similarity.quantizeError(s, dir)),
    "q_ann_brute" -> ((s, dir) => Similarity.bruteForceTopK(s, dir, 5, 5)),
    "q_ann_lsh" -> ((s, dir) => Similarity.lshTopK(s, dir, 5, 5)),
    "q_ann_ivf" -> ((s, dir) => // index build (an action) + probe
      Similarity.ivfTopK(s, dir, Similarity.buildIvfCentroids(s, dir, 16), 5, 5)),
    // measured IVF recall vs the exact baseline at a realistic cell
    // count (k=64 cells, broadcast centroid table; nprobe=16 — random
    // high-dim embeddings need a fat probe, still a 4x candidate prune)
    "q_ann_ivf_recall" -> ((s, dir) => Similarity.ivfRecall(s, dir,
      Similarity.buildIvfCentroids(s, dir, 64), 5, 10, nprobe = 16)),
    // the 4x-memory serving path end to end: IVF probe against the
    // int8-DEQUANTIZED corpus (queries full precision), recall vs the
    // float exact baseline — quantization + ANN composed, not just
    // measured in isolation
    "q_ann_quant_recall" -> ((s, dir) => Similarity.ivfQuantRecall(s, dir,
      Similarity.buildIvfCentroids(s, dir, 64), 5, 10, nprobe = 16)),
    // ---- misc scalar / stats ops (SURVEY §2.2-2.5) ----
    "q_clean_text" -> ((s, dir) => Misc.cleanDocs(s, dir)),
    "q_distinct_docs" -> ((s, dir) => Misc.distinctDocs(s, dir)),
    // HLL++ sketch (order/partition-independent -> deterministic):
    // the approximate-distinct path a 100 TB metrics rollup uses where
    // exact countDistinct would shuffle every key
    "q_hll_distinct" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("lang"))
        .agg(approx_count_distinct(col("doc_id")).as("approx_docs"),
          approx_count_distinct(col("source"), 0.02).as("approx_sources"),
          countDistinct(col("doc_id")).as("exact_docs"))),
    // sessionization: gap-based session windows over the events stream
    // (the grouping a behavioral-data pipeline runs); oracle = the
    // lag/cumsum SQL formulation of the same 6h-gap rule
    "q_sessionize" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          sum(col("n_events")).as("n_events"))),
    "pipe_frame_freq" -> ((s, dir) => Misc.frameFreq(s, dir)),
    "q_pos_tag" -> ((s, dir) => Misc.posTagTable(s, dir)),
    // streaming surface under the same correctness gate: the full
    // pipeline run as an AvailableNow streaming query into a fresh
    // temp table, summarized per predicate from the committed output.
    // The run is memoized per input dir — a streaming query is an
    // action by nature, and without the cache every construction
    // (Explain, repeated Verify) would re-run the whole pipeline
    "pipe_stream" -> ((s, dir) => {
      val out = streamOutCache.computeIfAbsent(dir, _ => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
        graft.streaming.Streaming.runAvailableNow(s, s"$dir/documents.parquet",
          s"$tmp/ckpt", s"$tmp/out")
        s"$tmp/out"
      })
      s.read.parquet(out)
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
    }),
    "pipe_norm_date" -> ((s, _) => Misc.normDateTable(s)),
    "pipe_norm_quantity" -> ((s, _) => Misc.normQuantityTable(s)),
    "pipe_conf_pctl" -> ((s, dir) => Misc.confidencePctl(Pipeline.triples(s, dir))),
    // ---- multimodal (stub decode; real plumbing) ----
    "q_media_stats" -> ((s, dir) => Multimodal.mediaStats(Corpus.spansTable(s, dir))),
    "q_media_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.mediaMeta(Corpus.spansTable(s, dir)), 30)
        .groupBy(col("media_ref"), col("n_frames"))
        .agg(count(lit(1)).as("n_sampled"), max(col("ts_ms")).as("last_ts_ms"))),
    "q_media_resize" -> ((s, dir) =>
      Multimodal.resizePlan(Multimodal.mediaMeta(Corpus.spansTable(s, dir)), 512)),
    "q_media_feats" -> ((s, dir) =>
      Multimodal.mediaFeatures(Multimodal.mediaMeta(Corpus.spansTable(s, dir)))
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n_media"),
          round(sum(aggregate(col("feat"), lit(0.0), (a, x) => a + x * x)), 6)
            .as("sum_sq_norm"),
          round(avg(element_at(col("feat"), 1)), 6).as("avg_c0"))),
    // ---- KG pipeline (golden-fixture-pinned; rows-only here) ----
    "pipe_scan_docs" -> ((s, dir) =>
      Corpus.spansTable(s, dir).toDF()
        .select(col("doc_id"), size(col("spans")).as("n_spans"))),
    "pipe_sentences" -> ((s, dir) => {
      Extraction.sentences(Pipeline.docsFor(s, dir))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sentences"))
    }),
    "pipe_tokenize" -> ((s, dir) =>
      Extraction.sentences(Pipeline.docsFor(s, dir)).toDF()
        .select(col("doc_id"), col("sentence_offset"),
          size(col("tokens")).as("n_tokens"))),
    "pipe_sentence_order" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("sentence_offset"))
      Extraction.sentences(Pipeline.docsFor(s, dir)).toDF()
        .select(col("doc_id"), col("sentence_offset"),
          row_number().over(w).as("sentence_idx"))
    }),
    "pipe_extract_n2n" -> ((s, dir) =>
      Extraction.matchN2n(Extraction.sentences(Pipeline.docsFor(s, dir)))
        .groupBy(col("lu"), col("frame")).agg(count(lit(1)).as("n"))),
    "pipe_extract_121" -> ((s, dir) =>
      Extraction.match121(Extraction.sentences(Pipeline.docsFor(s, dir)))
        .groupBy(col("lu"), col("frame")).agg(count(lit(1)).as("n"))),
    "pipe_extract_syn" -> ((s, dir) =>
      Extraction.matchSyntactic(Extraction.sentences(Pipeline.docsFor(s, dir)))
        .groupBy(col("lu"), col("frame")).agg(count(lit(1)).as("n"))),
    "pipe_classify" -> ((s, dir) => {
      val docs = Pipeline.docsFor(s, dir)
      val lus = Extraction.matchN2n(Extraction.sentences(docs))
      val bc = s.sparkContext.broadcast(Classification.defaultModel)
      Classification.classify(lus, bc)
        .groupBy(col("frame"))
        .agg(count(lit(1)).as("n"), round(avg(col("confidence")), 6).as("avg_conf"))
    }),
    "pipe_featurize" -> ((s, dir) => {
      val lus = Extraction.matchN2n(Extraction.sentences(Pipeline.docsFor(s, dir)))
      val bc = s.sparkContext.broadcast(Classification.defaultModel)
      Classification.featurize(lus, bc)
        .groupBy(col("lu"))
        .agg(count(lit(1)).as("n_sentences"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("n_features")).as("sum_features"),
          sum(col("feat_sum")).as("sum_feat_hash"))
    }),
    "pipe_classify_learned" -> ((s, dir) => {
      val lus = Extraction.matchN2n(Extraction.sentences(Pipeline.docsFor(s, dir)))
      val bcL = s.sparkContext.broadcast(graft.ml.LinearModel.default)
      val bcR = s.sparkContext.broadcast(Classification.defaultModel)
      Classification.classifyLearned(lus, bcL, bcR)
        .groupBy(col("frame"))
        .agg(count(lit(1)).as("n"), round(avg(col("confidence")), 6).as("avg_conf"))
    }),
    "pipe_link" -> ((s, dir) => {
      val docs = Pipeline.docsFor(s, dir)
      val lus = Extraction.matchN2n(Extraction.sentences(docs))
      val bc = s.sparkContext.broadcast(Classification.defaultModel)
      Linking.link(Classification.classify(lus, bc))
        .groupBy(col("fe"), col("etype"))
        .agg(count(lit(1)).as("n"), countDistinct(col("qid")).as("n_qids"))
    }),
    "pipe_link_salted" -> ((s, dir) => {
      val docs = Pipeline.docsFor(s, dir)
      val lus = Extraction.matchN2n(Extraction.sentences(docs))
      val bc = s.sparkContext.broadcast(Classification.defaultModel)
      Linking.linkSalted(Classification.classify(lus, bc))
        .groupBy(col("fe"), col("etype"))
        .agg(count(lit(1)).as("n"), countDistinct(col("qid")).as("n_qids"))
    }),
    "pipe_triples" -> ((s, dir) => Pipeline.flatten(Pipeline.triples(s, dir))),
    "pipe_triples_learned" -> ((s, dir) => Pipeline.flatten(
      Pipeline.triplesOver(Pipeline.docsFor(s, dir),
        graft.sources.Corpus.semiDocs(s, dir), learned = true))),
    "pipe_rejected" -> ((s, dir) => Pipeline.rejected(s, dir)
      .groupBy(col("frame"), col("reason")).agg(count(lit(1)).as("n"))),
    "pipe_qs" -> ((s, dir) => Serialize.quickStatements(Pipeline.triples(s, dir))),
    // media spans as triple provenance (the interleaved-media axis):
    // QS lines gain `S4656 "media_ref"` when the source sentence sits
    // under a media span
    "pipe_qs_media" -> ((s, dir) => Serialize.quickStatementsWithMedia(
      Pipeline.triples(s, dir), Serialize.mediaContext(Pipeline.docsFor(s, dir)))),
    "q_media_provenance" -> ((s, dir) =>
      Pipeline.triples(s, dir)
        .join(Serialize.mediaContext(Pipeline.docsFor(s, dir)),
          Seq("doc_id", "sentence_offset"), "left")
        .groupBy(col("media_ctx").isNotNull.as("has_media_ctx"))
        .agg(count(lit(1)).as("n_triples"),
          countDistinct(col("doc_id")).as("n_docs"))),
    "pipe_dedup_global" -> ((s, dir) =>
      Serialize.dedupStatements(Pipeline.triples(s, dir))),
    "pipe_span_invariant" -> ((s, dir) => {
      val docs = Pipeline.docsFor(s, dir)
      Serialize.spanInvariant(docs, Pipeline.textPath(docs))
        .agg(count(lit(1)).as("n_docs_checked"),
          sum(when(!col("sig_ok"), 1L).otherwise(0L)).as("n_violations"))
    }),
    // curation over the INTERLEAVED spans table (both graft axes in
    // one op): gates score the concatenated text spans, survivors
    // keep the full span sequence — spans_sig in the output is the
    // BASELINE span invariant; VALUES oracle (the spans table is
    // Spark-synthesized), sig equality spec-pinned in CurationSpec
    "pipe_curate_spans" -> ((s, dir) =>
      Curation.curateSpans(Corpus.spansTable(s, dir))),
    "pipe_checkpoint" -> ((s, dir) =>
      Checkpoint.stageMetrics(Pipeline.triples(s, dir), "verify", "triples", 16, 0L)),
    // sink_triples (SURVEY §2.1): flagship triples written through the
    // partitioned TableIO sink (partitionBy pred_bucket + manifest
    // commit), then read back from the COMMITTED table and summarized.
    "pipe_sink" -> ((s, dir) => {
      import graft.sources.TableIO
      val flat = Pipeline.flatten(Pipeline.triples(s, dir))
        .withColumn("pred_bucket", pmod(hash(col("pred")), lit(8)))
      // per-session path: expireOrphans below must never see (and
      // delete) a CONCURRENT session's in-flight snapshot directory
      val table = s"${sys.props("java.io.tmpdir")}/graft_sink_" +
        s"${dir}_${s.sparkContext.applicationId}".replaceAll("[^a-zA-Z0-9.]", "_") +
        "_" + java.lang.Long.toHexString(graft.util.Det.hashStr(dir))
      TableIO.write(flat, table, partitionBy = Seq("pred_bucket"), snapshotId = "verify")
      TableIO.expireOrphans(table) // drop generations the Overwrite unreferenced
      TableIO.read(s, table)
        .groupBy(col("pred_bucket"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("pred")).as("n_preds"))
        .withColumn("pred_bucket", col("pred_bucket").cast("int"))
    }),
    // watermark + event-time window aggregation run as a stream
    // (AvailableNow, memory sink); the oracle is INDEPENDENT hand-
    // written DuckDB SQL (tumbling-window floor arithmetic)
    "pipe_stream_window" -> ((s, dir) =>
      graft.streaming.Streaming.eventWindowCounts(s, dir)
        .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("sum_cents"))),
    // watermark-scoped stateful dedup run as a stream: the events table
    // arrives TWICE across micro-batches; dropDuplicates within
    // withWatermark must collapse it back to the raw table (the oracle
    // is independent SQL over the single-copy events)
    "pipe_stream_dedup" -> ((s, dir) =>
      graft.streaming.Streaming.dedupedEventCounts(s, dir)),
    // streaming incremental curation: the crawl increment (fresh +
    // re-crawled docs, double-fed across micro-batches) through the
    // curation gates, a STREAM-STATIC anti-join against the standing
    // corpus's scrubbed fingerprints, and cross-batch md5 dedup;
    // independent SQL oracle re-derives the admitted set
    "pipe_stream_curation" -> ((s, dir) =>
      graft.streaming.Streaming.curatedIngest(s, dir)),
    "pipe_eval" -> ((s, dir) => Pipeline.evaluate(s, dir))
  )

  /** DuckDB-equivalent SQL per query key: hand-written SQL over the
    * raw testdata tables where expressible, plus generated
    * literal-VALUES oracles (tools/OracleGen, frozen at sf0.01 — the
    * driver's correctness scale) for the deterministic pipeline
    * queries. Regenerate the VALUES set after any fixture change:
    * `sbt "runMain graft.tools.OracleGen /root/testdata/sf0.01"`.
    */
  def oracleSql: Map[String, String] =
    staticOracleSql ++ graft.tools.OracleGen.keys.flatMap(valuesOracle)

  private def valuesOracle(key: String): Option[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/oracles/$key.sql")
    if (in == null) None
    else {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try Some(key -> src.mkString) finally { src.close(); in.close() }
    }
  }

  /** q_quality_learned oracle: independent DuckDB re-derivation of the
    * features and the linear score with the FROZEN learned weights
    * inlined (%.17e — parsed as DOUBLE, exact round-trip; plain decimal
    * literals parse as DECIMAL and can drift an ulp through the
    * decimal→double cast). It checks the scoring end to end; the
    * training itself is pinned by LearnedSpec.
    */
  private def qualityLearnedOracle: String = {
    val w = graft.ml.QualityModel.default.map(v => f"$v%.17e")
    val score = s"${w(0)} + ${w(1)} * f1 + ${w(2)} * f2 + ${w(3)} * f3 + " +
      s"${w(4)} * f4 + ${w(5)} * f5 + ${w(6)} * f6"
    s"""WITH q AS (
         SELECT doc_id, text,
                list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS toks
         FROM documents),
       t AS (
         SELECT doc_id, text, toks, len(toks) AS n,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                     ELSE []::VARCHAR[] END AS tris
         FROM q),
       f AS (
         SELECT doc_id, n,
                least(CAST(n AS DOUBLE), 2.0e2) / 2.0e2 AS f1,
                CASE WHEN n = 0 THEN 0.0e0 ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / n / 1.0e1 END AS f2,
                CASE WHEN n = 0 THEN 0.0e0 ELSE len(list_filter(toks, x -> x IN ('a','and','in','of','the')))::DOUBLE / n END AS f3,
                CASE WHEN n = 0 THEN 0.0e0 ELSE 1.0e0 - len(list_distinct(toks))::DOUBLE / n END AS f4,
                CASE WHEN len(tris) = 0 THEN 0.0e0 ELSE 1.0e0 - len(list_distinct(tris))::DOUBLE / len(tris) END AS f5,
                CASE WHEN length(text) = 0 THEN 0.0e0 ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) END AS f6
         FROM t)
       SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
              (n >= 20 AND f3 >= 1.5e-2 AND f5 <= 5.0e-1 AND f6 >= 6.0e-1) AS heur_good,
              ($score > 0.0e0) AS pred_good,
              round($score, 6) AS margin
       FROM f"""
  }

  /** Independent DuckDB re-derivation of the span scrub from the
    * window STRINGS — shared verbatim by q_span_dedup (inline) and
    * q_span_dedup_indexed (committed-index form): the two Spark plans
    * differ, the contracted output may not.
    */
  private val spanScrubSql: String =
    """WITH p AS (
         SELECT doc_id,
                text || CASE WHEN doc_id % 25 = 3
                  THEN ' this work is licensed under the creative commons attribution share alike license'
                  ELSE '' END AS t
         FROM documents),
       tk AS (
         SELECT doc_id,
                list_filter(regexp_split_to_array(lower(t), '[^a-z]+'), x -> x <> '') AS toks
         FROM p),
       w AS (
         SELECT doc_id, toks,
                CASE WHEN len(toks) >= 8
                     THEN list_transform(range(1, len(toks) - 6),
                            s -> {'start': s, 'ngram': array_to_string(list_slice(toks, s, s + 7), ' ')})
                     ELSE CAST([] AS STRUCT("start" BIGINT, ngram VARCHAR)[]) END AS wins
         FROM tk),
       e AS (SELECT doc_id, unnest(wins, recursive := true) FROM w),
       d AS (SELECT ngram FROM e GROUP BY ngram HAVING count(DISTINCT doc_id) >= 2),
       dw AS (SELECT e.doc_id, e."start" FROM e JOIN d USING (ngram)),
       dagg AS (SELECT doc_id, count(*) AS n_dup FROM dw GROUP BY doc_id),
       cov AS (SELECT DISTINCT doc_id, pos FROM (
                 SELECT doc_id, unnest(range("start", "start" + 8)) AS pos FROM dw)),
       cagg AS (SELECT doc_id, count(*) AS n_cov, list(pos) AS cov FROM cov GROUP BY doc_id)
       SELECT tk.doc_id,
              CAST(CASE WHEN len(toks) >= 8 THEN len(toks) - 7 ELSE 0 END AS INTEGER) AS n_windows,
              CAST(coalesce(dagg.n_dup, 0) AS INTEGER) AS n_dup_windows,
              CAST(coalesce(cagg.n_cov, 0) AS INTEGER) AS n_covered,
              md5(coalesce(array_to_string(
                list_transform(
                  list_filter(range(1, len(toks) + 1),
                    i -> NOT list_contains(coalesce(cov, CAST([] AS BIGINT[])), i)),
                  i -> toks[i]), ' '), '')) AS clean_md5
       FROM tk LEFT JOIN dagg USING (doc_id) LEFT JOIN cagg USING (doc_id)"""

  /** End-to-end independent DuckDB re-derivation of the ENTIRE
    * curation funnel — replant, language argmax, frozen quality score
    * (weights inlined %.17e, left-assoc — bit-identical doubles),
    * sequential PII redaction, span scrub within survivors, md5 exact
    * dedup, sharded greedy packing — from the raw documents table.
    * Every fragment mirrors the corresponding per-stage oracle.
    */
  /** Shared CTE prefix (replant → tokens → features → gates + PII
    * redaction) of the curation-family oracles: ends at `base`
    * carrying (doc_id, source, t, toks, n_raw, lang_ok, qual_ok, t_s).
    */
  private def curationBaseSql: String = {
    val w = graft.ml.QualityModel.default.map(v => f"$v%.17e")
    val score = s"${w(0)} + ${w(1)} * f1 + ${w(2)} * f2 + ${w(3)} * f3 + " +
      s"${w(4)} * f4 + ${w(5)} * f5 + ${w(6)} * f6"
    s"""WITH p AS (
         SELECT doc_id, source,
                text ||
                CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.org now' ELSE '' END ||
                CASE WHEN doc_id % 11 = 0 THEN ' call 555-0199' ELSE '' END ||
                CASE WHEN doc_id % 13 = 0 THEN ' or +44 207 946 0958' ELSE '' END ||
                CASE WHEN doc_id % 17 = 0 THEN ' ssn 429-58-1337' ELSE '' END ||
                CASE WHEN doc_id % 19 = 0 THEN ' iban DE44500105175407324931' ELSE '' END ||
                CASE WHEN doc_id % 23 = 0 THEN ' ships to 742 Oak Street' ELSE '' END ||
                CASE WHEN doc_id % 25 = 3 THEN ' this work is licensed under the creative commons attribution share alike license' ELSE '' END AS t
         FROM documents),
       tk AS (
         SELECT *, list_filter(regexp_split_to_array(lower(t), '[^a-z]+'), x -> x <> '') AS toks
         FROM p),
       ft AS (
         SELECT *, len(toks) AS n_raw,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                     ELSE []::VARCHAR[] END AS tris,
                len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','was','that','it','with'))) AS h_en,
                len(list_filter(toks, x -> x IN ('der','die','das','und','ist','von','mit','ein','nicht','auch'))) AS h_de,
                len(list_filter(toks, x -> x IN ('le','la','les','et','est','dans','pour','que','une','des'))) AS h_fr,
                len(list_filter(toks, x -> x IN ('el','los','las','es','en','por','que','una','con','para'))) AS h_es,
                len(list_filter(toks, x -> x IN ('il','gli','che','per','con','una','sono','della','questo','anche'))) AS h_it
         FROM tk),
       f AS (
         SELECT *,
                least(CAST(n_raw AS DOUBLE), 2.0e2) / 2.0e2 AS f1,
                CASE WHEN n_raw = 0 THEN 0.0e0 ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / n_raw / 1.0e1 END AS f2,
                CASE WHEN n_raw = 0 THEN 0.0e0 ELSE len(list_filter(toks, x -> x IN ('a','and','in','of','the')))::DOUBLE / n_raw END AS f3,
                CASE WHEN n_raw = 0 THEN 0.0e0 ELSE 1.0e0 - len(list_distinct(toks))::DOUBLE / n_raw END AS f4,
                CASE WHEN len(tris) = 0 THEN 0.0e0 ELSE 1.0e0 - len(list_distinct(tris))::DOUBLE / len(tris) END AS f5,
                CASE WHEN length(t) = 0 THEN 0.0e0 ELSE length(regexp_replace(t, '[^A-Za-z]', '', 'g'))::DOUBLE / length(t) END AS f6
         FROM ft),
       base AS (
         SELECT *,
                (h_en = greatest(h_en, h_de, h_fr, h_es, h_it) AND h_en > 0) AS lang_ok,
                ($score > 0.0e0) AS qual_ok,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                  '[a-z0-9._]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
                  '[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}', '<IBAN>', 'g'),
                  '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
                  '\\+[0-9]{1,3} [0-9]{3} [0-9]{3} [0-9]{2,4}', '<PHONE>', 'g'),
                  '555-[0-9]{4}', '<PHONE>', 'g'),
                  '[0-9]{1,4} (Main|Oak|Elm|Park|High) (Street|Avenue|Road|Lane)', '<ADDR>', 'g') AS t_s
         FROM f)"""
  }

  private def curationFunnelOracle: String =
    s"""$curationBaseSql,
       dt AS (SELECT doc_id, list_distinct(tris) AS dtris FROM ft),
       bench AS (SELECT DISTINCT unnest(dtris) AS tri FROM dt WHERE doc_id < 25),
       ex AS (SELECT doc_id, len(dtris) AS nt, unnest(dtris) AS tri FROM dt),
       hit AS (SELECT e.doc_id, count(b.tri) AS n_overlap, any_value(e.nt) AS nt
               FROM ex e LEFT JOIN bench b USING (tri) GROUP BY e.doc_id),
       decon AS (SELECT dt.doc_id,
                        (coalesce(hit.nt, 0) = 0 OR
                         2 * coalesce(hit.n_overlap, 0) < coalesce(hit.nt, 0)) AS decon_ok
                 FROM dt LEFT JOIN hit USING (doc_id)),
       bs AS (SELECT base.*, decon.decon_ok,
                     list_filter(regexp_split_to_array(lower(t_s), '[^a-z]+'), x -> x <> '') AS toks_s
              FROM base JOIN decon USING (doc_id)),
       surv AS (SELECT doc_id, source, toks_s, len(toks_s) AS n_s FROM bs
                WHERE lang_ok AND qual_ok AND decon_ok),
       w AS (
         SELECT doc_id,
                CASE WHEN len(toks_s) >= 8
                     THEN list_transform(range(1, len(toks_s) - 6),
                            s -> {'start': s, 'ngram': array_to_string(list_slice(toks_s, s, s + 7), ' ')})
                     ELSE CAST([] AS STRUCT("start" BIGINT, ngram VARCHAR)[]) END AS wins
         FROM surv),
       e AS (SELECT doc_id, unnest(wins, recursive := true) FROM w),
       d AS (SELECT ngram FROM e GROUP BY ngram HAVING count(DISTINCT doc_id) >= 2),
       dw AS (SELECT e.doc_id, e."start" FROM e JOIN d USING (ngram)),
       cv AS (SELECT DISTINCT doc_id, pos FROM (
                SELECT doc_id, unnest(range("start", "start" + 8)) AS pos FROM dw)),
       cagg AS (SELECT doc_id, count(*) AS n_cov, list(pos) AS cov FROM cv GROUP BY doc_id),
       clean AS (
         SELECT s.doc_id, s.source,
                CAST(s.n_s - coalesce(c.n_cov, 0) AS BIGINT) AS n_clean,
                md5(coalesce(array_to_string(
                  list_transform(
                    list_filter(range(1, s.n_s + 1),
                      i -> NOT list_contains(coalesce(c.cov, CAST([] AS BIGINT[])), i)),
                    i -> s.toks_s[i]), ' '), '')) AS cmd5
         FROM surv s LEFT JOIN cagg c USING (doc_id)),
       kept AS (SELECT cmd5, min(doc_id) AS doc_id, arg_min(source, doc_id) AS source,
                       min(n_clean) AS n_tokens
                FROM clean GROUP BY cmd5),
       sh AS (SELECT *, CAST(((CAST(doc_id AS BIGINT) * 2654435761) >> 16) % 8 AS BIGINT) AS shard FROM kept),
       cm AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sh),
       pk AS (SELECT source, shard, CAST(floor((cum - 1) / 512) AS BIGINT) AS pack_id,
                     CAST(sum(n_tokens) AS BIGINT) AS st
              FROM cm GROUP BY 1, 2, 3),
       head AS (
         SELECT count(*) AS d0, CAST(sum(n_raw) AS BIGINT) AS t0,
                CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                CAST(sum(CASE WHEN lang_ok THEN n_raw ELSE 0 END) AS BIGINT) AS t1,
                CAST(sum(CASE WHEN lang_ok AND qual_ok THEN 1 ELSE 0 END) AS BIGINT) AS d2,
                CAST(sum(CASE WHEN lang_ok AND qual_ok THEN n_raw ELSE 0 END) AS BIGINT) AS t2,
                CAST(sum(CASE WHEN lang_ok AND qual_ok AND decon_ok THEN 1 ELSE 0 END) AS BIGINT) AS d3,
                CAST(sum(CASE WHEN lang_ok AND qual_ok AND decon_ok THEN n_raw ELSE 0 END) AS BIGINT) AS t3,
                CAST(sum(CASE WHEN lang_ok AND qual_ok AND decon_ok THEN len(toks_s) ELSE 0 END) AS BIGINT) AS t4
         FROM bs)
       SELECT 0 AS ord, 'raw' AS stage, d0 AS n_docs, t0 AS n_tokens FROM head
       UNION ALL SELECT 1, 'lang_en', d1, t1 FROM head
       UNION ALL SELECT 2, 'quality', d2, t2 FROM head
       UNION ALL SELECT 3, 'decontaminated', d3, t3 FROM head
       UNION ALL SELECT 4, 'pii_scrubbed', d3, t4 FROM head
       UNION ALL SELECT 5, 'span_scrubbed', (SELECT count(*) FROM clean),
                 (SELECT CAST(coalesce(sum(n_clean), 0) AS BIGINT) FROM clean)
       UNION ALL SELECT 6, 'dedup', (SELECT count(*) FROM kept),
                 (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM kept)
       UNION ALL SELECT 7, 'packed', (SELECT count(*) FROM pk),
                 (SELECT CAST(coalesce(sum(st), 0) AS BIGINT) FROM pk)"""

  /** Independent re-derivation of the streamed curation ingest: the
    * increment (fresh docs + re-crawls) through the gates, the
    * standing-corpus fingerprint anti-join, and the md5 dedup — what
    * pipe_stream_curation's stateful stream must equal.
    */
  private def streamCurationOracle: String =
    s"""$curationBaseSql,
       corp AS (SELECT DISTINCT md5(t_s) AS m FROM base WHERE doc_id < 480),
       cand AS (SELECT doc_id, source, t_s FROM base
                WHERE (doc_id >= 480 OR (doc_id < 480 AND doc_id % 50 = 1))
                  AND lang_ok AND qual_ok),
       adm AS (SELECT md5(t_s) AS m, min(doc_id) AS doc_id,
                      arg_min(source, doc_id) AS source,
                      min(len(list_filter(regexp_split_to_array(lower(t_s), '[^a-z]+'), x -> x <> ''))) AS n_tokens
               FROM cand
               WHERE md5(t_s) NOT IN (SELECT m FROM corp)
               GROUP BY 1)
       SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              min(doc_id) AS min_doc, max(doc_id) AS max_doc
       FROM adm GROUP BY source"""

  private def staticOracleSql: Map[String, String] = Map(
    "q_quality_learned" -> qualityLearnedOracle,
    // INDEPENDENT re-derivation of the exact-Jaccard verify stage
    // (round-4 advisor: the dedup family leaned on VALUES dumps): ALL
    // pairs with exact trigram-shingle Jaccard ≥ 0.5 over the planted
    // corpus — DuckDB computes it from the shingle STRINGS with no
    // minhash anywhere, so this also proves the candidate stage
    // (est ≥ 0.25 + hot-bucket cap) misses nothing at this scale.
    // doc ids compare LEXICOGRAPHICALLY (the pair stages order string
    // ids), mirrored by the varchar casts.
    "q_jaccard_verify" ->
      """WITH base AS (
           SELECT CAST(CAST(doc_id AS BIGINT) AS VARCHAR) AS doc_id, text FROM documents
           UNION ALL
           SELECT CAST(CAST(doc_id + 1000000 AS BIGINT) AS VARCHAR),
                  regexp_replace(text, '^\S+\s*', '') FROM documents WHERE doc_id < 20),
         tk AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
           FROM base),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(toks) >= 3
                       THEN list_distinct(list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                       ELSE [coalesce(array_to_string(toks, ' '), '')] END AS shset
           FROM tk),
         sz AS (SELECT doc_id, len(shset) AS n FROM sh),
         e AS (SELECT doc_id, unnest(shset) AS s FROM sh),
         inter AS (
           SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
           FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT da AS doc_a, db AS doc_b,
                round(ni::DOUBLE / (sa.n + sb.n - ni), 6) AS jaccard
         FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
         WHERE ni::DOUBLE / (sa.n + sb.n - ni) >= 0.5""",
    "q_tf" ->
      """SELECT doc_id, tok, count(*) AS tf
         FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents)
         WHERE tok <> '' GROUP BY doc_id, tok""",
    "q_df_idf" ->
      """SELECT tok, count(DISTINCT doc_id) AS df,
                round(ln((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id)), 6) AS idf
         FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents)
         WHERE tok <> '' GROUP BY tok""",
    "q_tfidf_stats" ->
      """WITH terms AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents),
         t AS (SELECT doc_id, tok, count(*) AS tf FROM terms WHERE tok <> '' GROUP BY doc_id, tok),
         d AS (SELECT tok, ln((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id)) AS idf_raw
               FROM terms WHERE tok <> '' GROUP BY tok)
         SELECT t.tok, round(avg(t.tf * d.idf_raw), 6) AS avg_tfidf,
                round(coalesce(stddev_samp(t.tf * d.idf_raw), 0.0), 6) AS sd_tfidf
         FROM t JOIN d ON t.tok = d.tok GROUP BY t.tok""",
    "q_popularity" ->
      """SELECT tok, count(DISTINCT doc_id) AS df,
                round(count(DISTINCT doc_id)::DOUBLE / (SELECT count(*) FROM documents), 6) AS popularity
         FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents)
         WHERE tok <> '' GROUP BY tok""",
    "q_lu_rank" ->
      """WITH terms AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents),
         t AS (SELECT doc_id, tok, count(*) AS tf FROM terms WHERE tok <> '' GROUP BY doc_id, tok),
         n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         bytok AS (
           SELECT tok, avg(tf) * ln((SELECT n FROM n) / count(*)) AS a_raw, count(*) AS df
           FROM t GROUP BY tok),
         mm AS (SELECT min(a_raw) AS a_min, max(a_raw) AS a_max FROM bytok),
         scored AS (
           SELECT tok,
             CASE WHEN mm.a_max = mm.a_min THEN 0.0
                  ELSE (a_raw - mm.a_min) / (mm.a_max - mm.a_min) END AS a,
             df / (SELECT n FROM n) AS p
           FROM bytok CROSS JOIN mm)
         SELECT tok, round(CASE WHEN a + p = 0 THEN 0.0 ELSE 2.0 * a * p / (a + p) END, 6) + 0.0 AS score
         FROM scored ORDER BY score DESC, tok LIMIT 50""",
    "q_lu_distribution" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
                count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY ROLLUP(lang, source)""",
    "q_lu_cube" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
                count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY CUBE(lang, source)""",
    // NOTE: every integer sum is wrapped in an OUTER CAST(... AS BIGINT):
    // DuckDB sum(BIGINT) returns HUGEINT, which the driver's pandas path
    // coerces to float64 and the hash compare then diverges from Spark's
    // int64 despite equal values (round-1 VERDICT.md "What's wrong" #2).
    "q_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",
    "q_join_outer" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1),
              s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1)
         SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
                CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
                CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers
         FROM c FULL JOIN s ON c.nationkey = s.nationkey""",
    "q_semi_join" ->
      """SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
         GROUP BY s_nationkey""",
    "q_sessionize" ->
      """WITH e AS (
           SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM e),
         g AS (SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY user_id, sid)
         SELECT user_id, count(*) AS n_sessions,
                CAST(max(n_events) AS BIGINT) AS max_session_events,
                CAST(sum(n_events) AS BIGINT) AS n_events
         FROM g GROUP BY user_id""",
    "q_window_rank" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
           FROM events) WHERE rn = 1""",
    "q_window_frame" ->
      """SELECT user_id, event_id,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
         FROM events""",
    "q_topk_docs" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10",
    "q_union_events" ->
      """SELECT event_type, count(*) AS n FROM (
           SELECT * FROM events WHERE event_type = 'purchase'
           UNION ALL SELECT * FROM events WHERE event_type = 'signup')
         GROUP BY event_type""",
    "q_dedup_events" ->
      """SELECT event_type, count(*) AS n_users FROM (
           SELECT DISTINCT user_id, event_type FROM events)
         GROUP BY event_type""",
    "q_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
                count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1""",
    "q_setops_users" ->
      """(SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
          INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
         EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 199""",
    "q_token_count" ->
      """SELECT doc_id,
                CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS INTEGER) AS n_tokens,
                CAST(length(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_pieces
         FROM documents""",
    "q_pii_scrub" ->
      """WITH p AS (
           SELECT doc_id,
                  text ||
                  CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.org now' ELSE '' END ||
                  CASE WHEN doc_id % 11 = 0 THEN ' call 555-0199' ELSE '' END ||
                  CASE WHEN doc_id % 13 = 0 THEN ' or +44 207 946 0958' ELSE '' END ||
                  CASE WHEN doc_id % 17 = 0 THEN ' ssn 429-58-1337' ELSE '' END ||
                  CASE WHEN doc_id % 19 = 0 THEN ' iban DE44500105175407324931' ELSE '' END ||
                  CASE WHEN doc_id % 23 = 0 THEN ' ships to 742 Oak Street' ELSE '' END AS t0
           FROM documents),
         s1 AS (SELECT doc_id, t0,
                  regexp_replace(t0, '[a-z0-9._]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g') AS t1 FROM p),
         s2 AS (SELECT *, regexp_replace(t1, '[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}', '<IBAN>', 'g') AS t2 FROM s1),
         s3 AS (SELECT *, regexp_replace(t2, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t3 FROM s2),
         s4 AS (SELECT *, regexp_replace(t3, '\+[0-9]{1,3} [0-9]{3} [0-9]{3} [0-9]{2,4}', '<PHONE>', 'g') AS t4 FROM s3),
         s5 AS (SELECT *, regexp_replace(t4, '555-[0-9]{4}', '<PHONE>', 'g') AS t5 FROM s4),
         s6 AS (SELECT *, regexp_replace(t5, '[0-9]{1,4} (Main|Oak|Elm|Park|High) (Street|Avenue|Road|Lane)', '<ADDR>', 'g') AS t6 FROM s5)
         SELECT doc_id,
                CAST(len(regexp_extract_all(t0, '[a-z0-9._]+@[a-z0-9.]+[a-z]')) AS INTEGER) AS n_emails,
                CAST(len(regexp_extract_all(t1, '[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}')) AS INTEGER) AS n_iban,
                CAST(len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INTEGER) AS n_ssn,
                CAST(len(regexp_extract_all(t3, '\+[0-9]{1,3} [0-9]{3} [0-9]{3} [0-9]{2,4}')) AS INTEGER) AS n_intl_phones,
                CAST(len(regexp_extract_all(t4, '555-[0-9]{4}')) AS INTEGER) AS n_phones,
                CAST(len(regexp_extract_all(t5, '[0-9]{1,4} (Main|Oak|Elm|Park|High) (Street|Avenue|Road|Lane)')) AS INTEGER) AS n_addr,
                CAST(length(t6) AS INTEGER) AS scrubbed_len,
                md5(t6) AS scrubbed_md5
         FROM s6""",
    "q_contamination" ->
      """WITH q AS (
           SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS toks
           FROM documents),
         t AS (
           SELECT doc_id,
                  CASE WHEN len(toks) >= 3
                       THEN list_distinct(list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                       ELSE []::VARCHAR[] END AS tris
           FROM q),
         b AS (SELECT DISTINCT unnest(tris) AS tri FROM t WHERE doc_id < 25),
         e AS (SELECT doc_id, unnest(tris) AS tri FROM t),
         h AS (SELECT e.doc_id, count(*) AS n_hit FROM e JOIN b USING (tri) GROUP BY 1)
         SELECT t.doc_id, CAST(len(tris) AS INTEGER) AS n_trigrams,
                CAST(coalesce(n_hit, 0) AS INTEGER) AS n_overlap,
                round(CASE WHEN len(tris) = 0 THEN 0.0
                  ELSE coalesce(n_hit, 0)::DOUBLE / len(tris) END, 6) AS overlap_frac
         FROM t LEFT JOIN h ON t.doc_id = h.doc_id""",
    "q_pack_greedy" ->
      """WITH t AS (
           SELECT doc_id, source,
                  len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS n_tokens,
                  CAST(((CAST(doc_id AS BIGINT) * 2654435761) >> 16) % 8 AS BIGINT) AS shard
           FROM documents),
         c AS (
           SELECT doc_id, source, shard, n_tokens,
                  sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t)
         SELECT source, shard, CAST(floor((cum - 1) / 512) AS BIGINT) AS pack_id,
                count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM c GROUP BY 1, 2, 3""",
    "q_curation_funnel" -> curationFunnelOracle,
    // independent stopword-hit argmax re-derivation (graduated from a
    // VALUES dump): left-priority tie-break en,de,fr,es,it; zero hits
    // -> 'und' — exactly TextAnalysis.langId's fold
    "q_langid" ->
      """WITH tk AS (
           SELECT doc_id, lang AS lang_meta,
                  list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS toks
           FROM documents),
         h AS (
           SELECT doc_id, lang_meta,
                  len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','was','that','it','with'))) AS h_en,
                  len(list_filter(toks, x -> x IN ('der','die','das','und','ist','von','mit','ein','nicht','auch'))) AS h_de,
                  len(list_filter(toks, x -> x IN ('le','la','les','et','est','dans','pour','que','une','des'))) AS h_fr,
                  len(list_filter(toks, x -> x IN ('el','los','las','es','en','por','que','una','con','para'))) AS h_es,
                  len(list_filter(toks, x -> x IN ('il','gli','che','per','con','una','sono','della','questo','anche'))) AS h_it
           FROM tk)
         SELECT doc_id, lang_meta,
                CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_it) = 0 THEN 'und'
                     WHEN h_en = greatest(h_en, h_de, h_fr, h_es, h_it) THEN 'en'
                     WHEN h_de = greatest(h_en, h_de, h_fr, h_es, h_it) THEN 'de'
                     WHEN h_fr = greatest(h_en, h_de, h_fr, h_es, h_it) THEN 'fr'
                     WHEN h_es = greatest(h_en, h_de, h_fr, h_es, h_it) THEN 'es'
                     ELSE 'it' END AS lang_pred
         FROM h""",
    "q_span_dedup" -> spanScrubSql,
    // the committed-index form MUST be byte-equal to the inline scrub
    // — literally the same independent oracle derivation
    "q_span_dedup_indexed" -> spanScrubSql,
    "q_span_index" ->
      """WITH p AS (
           SELECT doc_id,
                  text || CASE WHEN doc_id % 25 = 3
                    THEN ' this work is licensed under the creative commons attribution share alike license'
                    ELSE '' END AS t
           FROM documents),
         tk AS (
           SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(t), '[^a-z]+'), x -> x <> '') AS toks
           FROM p),
         w AS (
           SELECT doc_id,
                  CASE WHEN len(toks) >= 8
                       THEN list_transform(range(1, len(toks) - 6),
                              s -> array_to_string(list_slice(toks, s, s + 7), ' '))
                       ELSE CAST([] AS VARCHAR[]) END AS wins
           FROM tk),
         e AS (SELECT doc_id, unnest(wins) AS ngram FROM w)
         SELECT count(*) AS n_windows, count(DISTINCT ngram) AS n_ngrams,
                count(DISTINCT doc_id) AS n_docs
         FROM e""",
    "q_span_probe" ->
      """WITH p AS (
           SELECT doc_id,
                  text || CASE WHEN doc_id % 25 = 3
                    THEN ' this work is licensed under the creative commons attribution share alike license'
                    ELSE '' END AS t
           FROM documents),
         tk AS (
           SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(t), '[^a-z]+'), x -> x <> '') AS toks
           FROM p),
         w AS (
           SELECT doc_id,
                  CASE WHEN len(toks) >= 8
                       THEN list_transform(range(1, len(toks) - 6),
                              s -> array_to_string(list_slice(toks, s, s + 7), ' '))
                       ELSE CAST([] AS VARCHAR[]) END AS wins
           FROM tk),
         e AS (SELECT doc_id, unnest(wins) AS ngram FROM w),
         old AS (SELECT DISTINCT ngram FROM e WHERE doc_id < 480),
         f AS (SELECT doc_id, ngram FROM e WHERE doc_id >= 480)
         SELECT f.doc_id, CAST(count(*) AS INTEGER) AS n_known_windows
         FROM f JOIN old USING (ngram) GROUP BY 1""",
    "q_span_pairs" ->
      """WITH p AS (
           SELECT doc_id,
                  text || CASE WHEN doc_id % 25 = 3
                    THEN ' this work is licensed under the creative commons attribution share alike license'
                    ELSE '' END AS t
           FROM documents),
         tk AS (
           SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(t), '[^a-z]+'), x -> x <> '') AS toks
           FROM p),
         w AS (
           SELECT doc_id,
                  CASE WHEN len(toks) >= 8
                       THEN list_transform(range(1, len(toks) - 6),
                              s -> array_to_string(list_slice(toks, s, s + 7), ' '))
                       ELSE CAST([] AS VARCHAR[]) END AS wins
           FROM tk),
         e AS (SELECT doc_id, unnest(wins) AS ngram FROM w),
         g AS (SELECT ngram FROM e GROUP BY ngram HAVING count(*) <= 64),
         ee AS (SELECT e.doc_id, e.ngram FROM e JOIN g USING (ngram))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS INTEGER) AS n_shared
         FROM ee a JOIN ee b ON a.ngram = b.ngram AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3""",
    "q_repetition" ->
      """WITH q AS (
           SELECT doc_id, text,
                  list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS toks
           FROM documents),
         t AS (
           SELECT doc_id, text, toks, len(toks) AS n,
                  CASE WHEN len(toks) >= 3
                       THEN list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       ELSE []::VARCHAR[] END AS tris
           FROM q)
         SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
                round(CASE WHEN n = 0 THEN 0.0
                  ELSE 1.0 - len(list_distinct(toks))::DOUBLE / n END, 6) AS dup_token_frac,
                round(CASE WHEN len(tris) = 0 THEN 0.0
                  ELSE 1.0 - len(list_distinct(tris))::DOUBLE / len(tris) END, 6) AS dup_trigram_frac,
                round(CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) END, 6) AS alpha_ratio
         FROM t""",
    "q_quality" ->
      """WITH q AS (SELECT doc_id, CAST(length(text) AS INTEGER) AS len_chars,
                list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS toks
         FROM documents)
         SELECT doc_id, len_chars, CAST(len(toks) AS INTEGER) AS n_tokens,
                round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END, 6) AS avg_tok_len,
                round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> x IN ('the','a','of','and','in')))::DOUBLE / len(toks) END, 6) AS stopword_ratio
         FROM q""",
    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
         FROM documents""",
    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
                min(doc_id) AS keep_doc, count(*) AS n_dups
         FROM documents GROUP BY 1""",
    "q_embed_dims" ->
      "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, label FROM embeddings",
    "q_clean_text" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace('  <b>' || text || '</b> 	 ', '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
         FROM documents""",
    "q_distinct_docs" ->
      """SELECT lang, count(DISTINCT doc_id) AS n_docs,
                count(DISTINCT source) AS n_sources
         FROM documents GROUP BY lang""",
    "q_filter_lang" ->
      """SELECT source, count(*) AS n_docs FROM documents
         WHERE lang = 'en' GROUP BY source""",
    // independent re-derivation of the streamed tumbling-window agg:
    // 6h windows aligned at the UTC epoch = floor(epoch/21600).
    // make_timestamp(microseconds) stays timezone-free end to end —
    // to_timestamp would render in DuckDB's session TimeZone, which the
    // driver does not pin (Spark's side IS pinned to UTC)
    "pipe_stream_window" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000),
                         '%Y-%m-%d %H:%M:%S') AS win_start,
                event_type, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY 1, 2""",
    // independent re-derivation of the streamed watermarked dedup: the
    // stream ingests every event twice; exact dedup must reduce it to
    // the raw table (event_id is unique), so the oracle is a plain
    // aggregate over the single-copy events
    "pipe_stream_dedup" ->
      """SELECT event_type, count(*) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY event_type""",
    "pipe_stream_curation" -> streamCurationOracle
  )
}
