package graft

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, L2Norm, TextFunctions}
import graft.operators.{EmbeddingStore, EventOps}

/** SQL surface for the library's scalar capabilities: the custom
  * Catalyst vector expressions (`cosine_sim`, `dot_product`,
  * `l2_norm`) AND the reference's per-message text transforms
  * (`clean_text`, `extract_text`, `is_file_name`,
  * `conversation_type`) become plain SQL functions, so
  * `spark.sql("SELECT cosine_sim(...), clean_text(...) ...")` works
  * the same as the DataFrame DSL (the reference exposes its search
  * through a query string API, server.py:60 — this is the equivalent
  * extension point). The text functions register the SAME Column
  * compositions the operators use (built-in codegen'd expressions,
  * no UDFs), so SQL and DSL can never drift apart.
  *
  * Two registration paths:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster
  *    deployment — applies to every session built with the conf)
  *  - dynamic: `GraftFunctions.register(spark)` on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach(ext.injectFunction)
    GraftTableFunctions.definitions.foreach(ext.injectTableFunction)
  }
}

object GraftFunctions {

  /** Adapt a Column-composition function into an expression builder:
    * wrap the call-site child expressions as Columns, apply the same
    * composition the DataFrame operators use, unwrap the result. */
  private def colFn(name: String, arity: Int)(
      f: Seq[Column] => Column): Seq[Expression] => Expression =
    es => {
      require(es.length == arity,
        s"$name expects $arity argument(s), got ${es.length}")
      GraftColumnBridge.expression(f(es.map(GraftColumnBridge.column)))
    }

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      es => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      es => DotProduct(es(0), es(1))),
    (FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      es => L2Norm(es.head)),
    (FunctionIdentifier("clean_text"),
      new ExpressionInfo(TextFunctions.getClass.getName, "clean_text"),
      colFn("clean_text", 1)(cs => TextFunctions.cleanText(cs.head))),
    (FunctionIdentifier("extract_text"),
      new ExpressionInfo(TextFunctions.getClass.getName, "extract_text"),
      colFn("extract_text", 2)(cs => TextFunctions.extractText(cs(0), cs(1)))),
    (FunctionIdentifier("is_file_name"),
      new ExpressionInfo(EventOps.getClass.getName, "is_file_name"),
      colFn("is_file_name", 1)(cs => EventOps.isFileName(cs.head))),
    (FunctionIdentifier("conversation_type"),
      new ExpressionInfo(EventOps.getClass.getName, "conversation_type"),
      colFn("conversation_type", 1)(cs => EventOps.conversationType(cs.head))))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, info, builder) =>
      GraftColumnBridge.registerFunction(spark, id, info, builder)
    }
}

/** Table-valued SQL surface for the library's PIPELINES: whole
  * operators become FROM-clause table functions —
  *
  * {{{
  *   SELECT * FROM graft_dedup_exact('/data/sf0.01')
  *   SELECT * FROM graft_dedup_minhash('/data/sf0.01') WHERE jaccard > 0.9
  *   SELECT * FROM graft_asof_join('/data/sf0.01')
  *   SELECT avg(quality) FROM graft_quality_score('/data/sf0.01')
  * }}}
  *
  * The builder evaluates the (foldable) data-dir argument at analysis
  * time and returns the operator's ANALYZED logical plan, so the
  * pipeline inlines into the calling query exactly like a view
  * expansion — Catalyst then optimizes THROUGH it (a `WHERE` above a
  * TVF pushes into the pipeline's scans; nothing is materialized at
  * the boundary). This is the engine-level integration surface the
  * reference exposes through its MCP tool layer (server.py:60):
  * a SQL user gets the dedup/join/scoring pipelines without touching
  * the Scala DSL. Same dual registration as the scalar functions:
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `GraftTableFunctions.register(spark)`.
  */
object GraftTableFunctions {

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import graft.operators.{Clusters, Dedup, EventOps, Multimodal, ProductQuantizer, TextAnalysis, VectorSearch}
  import graft.sources.Tables

  /** Evaluate a foldable string argument (the data dir) at analysis
    * time. Non-literal args are rejected — a TVF's input relation
    * must be known before planning. */
  private def litString(fn: String, e: Expression): String = {
    require(e.foldable, s"$fn expects a literal string argument")
    val v = e.eval()
    require(v != null, s"$fn: argument must not be null")
    v.toString
  }

  /** Most pipelines inline lazily; the iterative ones
    * (graft_dedup_clusters) run their convergence loop while the
    * calling query ANALYZES and inline the converged result — same
    * contract, earlier work. */
  private def tvf(name: String)(build: Tables => org.apache.spark.sql.DataFrame)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftTableFunctions.getClass.getName, name),
      es => {
        require(es.length == 1, s"$name expects 1 argument (data dir)")
        val dir = litString(name, es.head)
        // the session analyzing this query builds the pipeline
        val spark = SparkSession.active
        GraftColumnBridge.analyzedPlan(build(Tables(spark, dir)))
      })

  /** Memo for side-effecting TVF builds, weak-keyed on the session
    * (a stopped session's entries collect with it). ONE live entry
    * per (name, dir), stamped with the dir's content fingerprint:
    * the cached manifest serves only while the data is byte-stable,
    * and new/replaced files at the same path REPLACE the entry
    * instead of accumulating beside it — dropping the superseded
    * plan releases the only reference to its localCheckpointed
    * blocks, so the ContextCleaner can reclaim them (an append-only
    * fingerprint-keyed map would pin one manifest per refresh for
    * the session's lifetime). */
  private val sideEffectMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (String, LogicalPlan)]]()

  /** [[tvf]] for a build with real side effects (a corpus write):
    * at-most-once per (session, dir, CURRENT fingerprint) instead of
    * once-per-analysis. */
  private def memoTvf(name: String)(build: Tables => org.apache.spark.sql.DataFrame)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftTableFunctions.getClass.getName, name),
      es => {
        require(es.length == 1, s"$name expects 1 argument (data dir)")
        val dir = litString(name, es.head)
        val spark = SparkSession.active
        val perSession = sideEffectMemo.synchronized {
          sideEffectMemo.computeIfAbsent(spark,
            _ => new java.util.concurrent.ConcurrentHashMap[String,
              (String, LogicalPlan)]())
        }
        val fp = graft.sources.LayoutStore.fingerprint(dir)
        perSession.compute(s"$name|$dir", (_, cur) =>
          if (cur != null && cur._1 == fp) cur
          else (fp, GraftColumnBridge.analyzedPlan(build(Tables(spark, dir)))))
          ._2
      })

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    tvf("graft_dedup_exact")(Dedup.dedupExact),
    tvf("graft_dedup_minhash")(Dedup.dedupMinhash),
    tvf("graft_dedup_clusters")(Clusters.dedupClusters),
    // the composed shared-stage run (pairs + clusters + contamination
    // from ONE shingle+signature build) — the SQL form of the
    // session-level shared-stage contract
    tvf("graft_dedup_family")(Clusters.dedupFamily),
    // round-7 surfaces: exact 13-gram cross-corpus decontamination,
    // the persisted-index probe, and the partition-pruned
    // incremental scan
    tvf("graft_ngram_overlap")(Dedup.ngramOverlap),
    tvf("graft_search_ivf")(EmbeddingStore.searchIvfQuery),
    tvf("graft_incremental_pruned")(EventOps.incrementalPruned),
    tvf("graft_ngram_jaccard")(Dedup.ngramJaccard),
    tvf("graft_quality_score")(TextAnalysis.qualityScore),
    tvf("graft_tfidf")(TextAnalysis.tfidf),
    tvf("graft_pipeline")(TextAnalysis.pipelineE2e),
    tvf("graft_asof_join")(EventOps.asofJoin),
    tvf("graft_range_join")(EventOps.rangeJoin),
    tvf("graft_sessionize")(EventOps.sessionize),
    tvf("graft_resample")(EventOps.resample),
    // the multimodal preprocessor legs: feature-extract search and
    // the stride-subsample resize
    tvf("graft_media_embedding")(Multimodal.mediaEmbedding),
    tvf("graft_media_resize")(Multimodal.mediaResize),
    // the packing and mixture audits
    tvf("graft_pack_sequences")(TextAnalysis.packSequences),
    tvf("graft_mix_temperature")(TextAnalysis.mixTemperature),
    // round 11: span dedup, the two-stage rerank, the data card and
    // the Gopher gates — the full pipeline surface stays SQL-reachable
    tvf("graft_dedup_spans")(Dedup.dedupSpans),
    tvf("graft_dedup_spans_incremental")(Dedup.dedupSpansIncremental),
    tvf("graft_search_rerank")(VectorSearch.searchRerank),
    tvf("graft_source_profile")(TextAnalysis.sourceProfile),
    tvf("graft_gopher_rules")(TextAnalysis.gopherRules),
    // the hybrid retrieval stack and the selection/audit surfaces
    tvf("graft_search_bm25")(VectorSearch.searchBm25),
    // round 12: the batch-serving probe — N queries x the persisted
    // index in one pass
    tvf("graft_search_batch")(EmbeddingStore.searchBatchQuery),
    tvf("graft_search_text")(t => EmbeddingStore.searchText(t)),
    tvf("graft_pq_recall")(ProductQuantizer.pqRecallQuery),
    tvf("graft_search_hybrid")(VectorSearch.searchHybrid),
    tvf("graft_dsir_weights")(TextAnalysis.dsirWeights),
    tvf("graft_ngram_topk")(TextAnalysis.ngramTopk),
    tvf("graft_source_overlap")(Dedup.sourceOverlap),
    tvf("graft_bpe_pairs")(TextAnalysis.bpePairs),
    // iterative like graft_dedup_clusters: the closure converges at
    // analysis time and inlines the result
    tvf("graft_semantic_clusters")(VectorSearch.semanticClusters),
    tvf("graft_lang_confusion")(TextAnalysis.langConfusion),
    tvf("graft_gate_matrix")(TextAnalysis.gateMatrix),
    // side-effecting (the one TVF whose build performs a real corpus
    // write): memoized so the export runs AT MOST ONCE per (session,
    // data dir, data fingerprint) — an EXPLAIN followed by the real
    // run, or N references in one query, share a single export's
    // pinned manifest instead of re-exporting N times; replacing the
    // data at the same path changes the fingerprint and re-exports
    memoTvf("graft_export_manifest")(graft.sources.Export.exportManifest))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, info, builder) =>
      GraftColumnBridge.registerTableFunction(spark, id, info, builder)
    }
}
