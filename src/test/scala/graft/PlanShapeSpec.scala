package graft

/** Blanket scale-shape guarantees over EVERY query in the contract:
  * nothing plans a cartesian product, and nested-loop joins appear
  * only where a ≤5-row broadcast query-vector join is the intended
  * plan (vector search / scalar subquery). Executes each query at
  * sf0.001 so AQE finalizes real plans. */
class PlanShapeSpec extends SparkTestBase {

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * a small broadcast side with no equi-key — the query vector or a
    * scalar aggregate (1-5 rows), or q_dedup_embedding's IVF centroid
    * table (√n rows, MBs even at 1e9 vectors) whose broadcast scan IS
    * the cell-assignment step. */
  private val tinyBroadcastJoins = Set(
    "q_search_bruteforce", "q_search_filtered", "q_search_context",
    "q_knn_join",
    "q_ann_ivf", "q_scalar_subquery", "q_dedup_embedding",
    // the recall evaluator broadcasts the same tiny sides as
    // q_ann_ivf (√n centroid table, the sampled query vectors) plus a
    // 3-row probes axis exploded from a 1-row range
    "q_ivf_recall",
    // D31: D7's sampled-query broadcast plus a 4-row widths axis and
    // the 1-row denominator
    "q_truncate_recall",
    // D34: D7's broadcasts plus the 3-row selectivity axis and the
    // 3-row probes axis
    "q_filtered_recall",
    // D32: the k-row centroid table cross-broadcast into the corpus
    // scoring pass, once per Lloyd step
    "q_kmeans",
    // the persisted-index probe broadcasts the 1-row query vector
    // into the pruned cell scan
    "q_search_ivf",
    // H7 ends in D8's probe over the maintained index — the same
    // 1-row query-vector broadcast (+ the ≤10-row constant attach)
    "q_index_maintain",
    // D8's broadcast shape with a θ filter instead of top-k
    "q_search_radius",
    // D28: D8's 1-row query-vector broadcast into the pruned scan
    // (the label side joins keyed on doc_id)
    "q_search_ivf_filtered",
    // three 1-row broadcasts (id midpoint, side totals, TVD sum)
    // into the ≤k-row cell table; the assignment itself reuses
    // q_dedup_embedding's centroid broadcast
    "q_corpus_drift",
    // the text-query row broadcasts the 1-row embedded query string
    // into the corpus scoring pass (the dim384 shape)
    "q_search_text",
    // the int8 row broadcasts the 1-row (query floats + micro-units)
    // pair into the compressed corpus scan
    "q_search_sq8",
    // the rerank stage cross-broadcasts the 1-row query word set
    // into the ≤50 candidate texts
    "q_search_rerank",
    // the media search broadcasts the 1-row query media vector
    "q_media_embedding",
    // the 1-row corpus-size aggregate cross-broadcasts into the
    // tf⋈df rows, same shape as q_scalar_subquery
    "q_tfidf",
    // the two 1-row normalization totals cross-broadcast into the
    // per-source rows
    "q_mix_temperature",
    // F31 shares F13's two 1-row total cross-broadcasts
    "q_epoch_plan",
    // the index-health row assembles two 1-row aggregates (per-vector
    // and per-cell) with a 1×1 cross-broadcast
    "q_ivf_stats",
    // per-layout 1-row stats (candidate count, hits, truth total)
    // cross-broadcast into one row per layout — three 1×1 joins
    "q_lsh_recall",
    // the refresh episode's final search broadcasts the 1-row query
    // vector into the store scan, like q_search_bruteforce
    "q_search_refresh",
    // the 1-row vocabulary-size aggregate cross-broadcasts into the
    // scored bigram rows, same shape as q_tfidf's corpus-size attach
    "q_lm_score",
    // the 384-dim search broadcasts the 1-row raw query vector
    "q_search_dim384",
    // D7's evaluator shape at 384 dims — same tiny broadcast sides
    "q_ivf_recall_dim384",
    // the 1-row feature-total aggregate cross-broadcasts into the
    // ≤256-row bucket model, same shape as q_tfidf's size attach
    "q_dsir_weights",
    // the 1-row corpus-size aggregate cross-broadcasts into the
    // per-ngram doc-frequency rows
    "q_ngram_topk",
    // the 1-row token-total aggregate cross-broadcasts into the
    // floored pair rows, same shape as q_tfidf's size attach
    "q_collocations",
    // the 1-row (docs, tokens) totals cross-broadcast into the
    // <=64-row bucket table
    "q_token_histogram",
    // the 1-row (N, total-tokens) corpus stats cross-broadcast into
    // the per-(doc, term) scoring rows, same shape as q_tfidf
    "q_search_bm25",
    // both legs' tiny sides: the 1-row query vector and the BM25
    // corpus stats
    "q_search_hybrid",
    // embeds F18's 1-row feature-total broadcast plus its own 1-row
    // grand-total share attach
    "q_gate_matrix",
    // the 1-row corpus-size aggregate cross-broadcasts into the
    // ranked rows for the keep cut, same shape as q_ngram_topk
    "q_prototypes",
    // embeds E16's 1-row corpus-size cross-broadcast
    "q_prune_compose")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian product, joins keyed or tiny-broadcast") {
      val df = fn(spark, sfDir)
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!tinyBroadcastJoins(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unkeyed nested-loop join")
      }
    }
  }
}
