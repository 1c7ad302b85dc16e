package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions.words
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** D-family: vector similarity search — the reference's core purpose
  * (reference: src/core/embeddings/processor.py:436
  * `search_similar_messages`: brute-force cosine over the whole store,
  * similarity threshold at :440-ish, metadata filters at :476, top-k;
  * orchestrated by src/core/search/engine.py:105).
  *
  * Spark-first shape: the corpus streams through a codegen'd
  * `CosineSimilarity` expression (no shuffle to score), the query
  * vector(s) are a broadcast 1-to-5-row dimension, and top-k is
  * TakeOrderedAndProject (per-partition heads + driver merge — no
  * global sort). At 100 TB the only data movement is the broadcast of
  * the queries; scoring is embarrassingly parallel over the corpus
  * partitions.
  *
  * Parity (SURVEY.md §4): scores round to 6 dp BEFORE threshold /
  * ordering on both engines; every top-k has the total order
  * (score desc, id asc).
  */
object VectorSearch {

  /** D7's query-sample bound: the recall evaluator scores the K
    * LOWEST ids matching the sample rule, never a fraction of the
    * corpus — K is what keeps the query broadcast O(K·dim) and the
    * exact ground-truth side O(K·n) at any corpus size. 100 is
    * deliberately small enough that the 8×/16× corpus replications
    * in SCALING.md §5 exercise the cap (160 and 320 matching ids);
    * a production evaluator would raise it (the shape is unchanged —
    * cost is linear in K). */
  val recallQueryCount: Int = 100

  /** Deterministic "query embedding": the stored vector with vec_id=0
    * (the reference embeds the query text at search time,
    * processor.py:467 — no model in this sandbox, so the query is a
    * corpus vector, which the reference's own tests also do). */
  private def queryVec(t: Tables): DataFrame =
    t.embeddings.filter(col("vec_id") === 0).select(col("embedding").as("qv"))

  private def score(e: Column, q: Column): Column = round(cosineSim(e, q), 6)

  /** D1 — brute-force cosine top-k with similarity threshold
    * (reference processor.py:436; threshold default 0.3 scaled to this
    * synthetic corpus' score range). */
  def searchBruteforce(t: Tables): DataFrame =
    t.embeddings
      .filter(col("vec_id") =!= 0)
      .join(broadcast(queryVec(t)))
      .select(col("vec_id"), col("label"),
        score(col("embedding"), col("qv")).as("score"))
      .filter(col("score") >= 0.1)
      .orderBy(col("score").desc, col("vec_id"))
      .limit(30)

  /** D2 — metadata-filtered search (reference processor.py:476 filters
    * by conversation_type/session_id before scoring; here the `label`
    * column plays that role). The filter lands in the parquet scan, so
    * the pruned partitions are never read, let alone scored. */
  def searchFiltered(t: Tables): DataFrame =
    t.embeddings
      .filter(col("label").isin(1, 2, 3) && col("vec_id") =!= 0)
      .join(broadcast(queryVec(t)))
      .select(col("vec_id"), col("label"),
        score(col("embedding"), col("qv")).as("score"))
      .filter(col("score") >= 0.05)
      .orderBy(col("score").desc, col("vec_id"))
      .limit(20)

  /** D6 — `q_search_context`: search with ATTACHED conversation
    * context — the reference's `include_context=True` path
    * (engine.py:105 calls get_message_context per hit,
    * processor.py:266, two point lookups each). Set-oriented, the
    * scalable shape inverts that: the top-k hits are tiny, so they
    * broadcast; only the HIT USERS' event streams are windowed for
    * prev/next (cost proportional to the hit users' traffic, never
    * the corpus); each hit then joins its own context row. Hit ids
    * map to event ids — the "message with an embedding" reading the
    * D-family uses throughout. */
  def searchContext(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // eager checkpoint: hits feeds two independent consumers (the
    // hit-user filter and the final join) — unmaterialized, each
    // would re-run the corpus-wide scoring scan (the multi-consumer
    // recompute the dedup pipelines checkpoint against); the
    // materialized set is ≤ 30 rows
    val hits = searchBruteforce(t).select(col("vec_id"), col("score"))
      .localCheckpoint()
    val hitUsers = t.events
      .join(broadcast(hits.select(col("vec_id"))),
        col("event_id") === col("vec_id"))
      .select(col("user_id")).distinct()
    val ctx = t.events
      .join(broadcast(hitUsers), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(lag(col("props"), 1).over(w), lit("")).as("prev_msg"),
        coalesce(lead(col("props"), 1).over(w), lit("")).as("next_msg"))
    hits.join(ctx, col("vec_id") === col("event_id"))
      .select(col("vec_id"), col("score"), col("user_id"), col("ts"),
        col("prev_msg"), col("next_msg"))
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** D14 — `q_search_rerank`: the TWO-STAGE retrieval stack — ANN
    * candidate generation through the persisted IVF index (D8's
    * probe, widened to k₁ = 50), then a rerank of only those
    * candidates against the query's TEXT (the reference serves
    * embedding hits whose text the client reads, engine.py:105; a
    * production stack reranks that text before returning — the
    * cross-encoder slot). The reranker here is deterministic lexical
    * Jaccard over distinct word sets (a real model is a sandboxless
    * stub, like `embed`), and the combined score adds cosine and
    * lexical in INTEGER MICRO-UNITS so the blend is engine-exact.
    *
    * Scale shape: stage 1 reads probes/k of the index (partition
    * pruning); stage 2 joins the ≤ k₁ BROADCAST candidates into the
    * documents scan — per-query rerank cost is k₁ texts, never a
    * corpus pass, exactly why two-stage retrieval exists. */
  def searchRerank(t: Tables): DataFrame = {
    val k1 = 50
    val cand = EmbeddingStore
      .searchIvf(t.spark, EmbeddingStore.ensureIndex(t),
        queryDocId = 0L, k = k1, probes = 2)
      .select(col("doc_id"), col("score"))
    val qw = t.documents.filter(col("doc_id") === 0)
      .select(array_distinct(words(col("text"))).as("wq"))
    val wd = array_distinct(words(col("text")))
    val common = size(array_intersect(wd, col("wq")))
    val lex = common.cast("double") /
      (size(wd) + size(col("wq")) - common).cast("double")
    t.documents.join(broadcast(cand), "doc_id")
      .crossJoin(broadcast(qw))
      .select(col("doc_id"), col("score"),
        round(lex, 6).as("lex_score"),
        (round(col("score") * 1e6, 0).cast(LongType) +
          round(lex * 1e6, 0).cast(LongType)).as("rerank_mu"))
      .orderBy(col("rerank_mu").desc, col("doc_id"))
      .limit(10)
  }

  /** D27's shape: k final picks from an N-candidate pool at
    * λ = [[mmrLambdaNum]]/10. `private[graft]` so the oracle replays
    * the same constants. */
  private[graft] val mmrK = 5
  private[graft] val mmrCandidates = 20
  private[graft] val mmrLambdaNum = 7L

  /** D27 — `q_search_mmr`: Maximal Marginal Relevance diversified
    * top-k (Carbonell & Goldstein 1998) — the standard re-rank that
    * keeps a result page from being five paraphrases of the same
    * hit: greedily pick argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
    * over the candidate pool. The D-family's missing semantic — D1
    * ranks by pure relevance, D14 re-scores lexically, E15 prunes
    * duplicates corpus-wide; this diversifies ONE result set at
    * query time (retrieval-augmented pipelines run exactly this
    * between the ANN probe and the context window).
    *
    * Scale/exactness shape: stage 1 is D1's TakeOrdered top-N
    * (N = [[mmrCandidates]] — the only corpus-sized pass); the pool
    * checkpoints once and EVERYTHING greedy happens on ≤ N rows —
    * the N² pairwise cosines are a broadcast self-join of 20 rows,
    * and each of the k−1 selection steps is a keyed anti/semi join +
    * one TakeOrdered(1) over ≤ N rows, all inside ONE declarative
    * plan (no driver loop, no per-step action). All MMR arithmetic
    * runs in INTEGER MICRO-UNITS off the 6dp scores
    * (mmr_u = 7·rel_u − 3·max_sim_u — exact on both engines, the
    * F13/F15 quantization technique), so selection order is
    * bit-for-bit replayable; the oracle chains the same k greedy
    * steps as CTEs. Ties break to the lowest vec_id everywhere. */
  def searchMmr(t: Tables): DataFrame = {
    val (cand, pairs) = mmrPool(t)
    val base = cand.select(col("vec_id"), col("rel"), col("rel_u"))
    var sel = base
      .orderBy(col("rel_u").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), col("rel"), lit(1).as("rank"),
        (col("rel_u") * mmrLambdaNum).as("mmr_u"))
      // each step's frame is EAGERLY checkpointed: step i consumes
      // sel three ways (anti-join, penalty keys, the union), and an
      // unmaterialized union would re-embed every prior limit(1)
      // subplan — plan size grows ~3^k instead of k tiny frames
      .localCheckpoint()
    (2 to mmrK).foreach { i =>
      val selIds = sel.select(col("vec_id"))
      val pen = pairs
        .join(selIds.withColumnRenamed("vec_id", "b"), "b")
        .groupBy(col("a")).agg(max(col("sim_u")).as("pen_u"))
        .withColumnRenamed("a", "vec_id")
      val next = base
        .join(selIds, Seq("vec_id"), "left_anti")
        .join(pen, Seq("vec_id"))
        .withColumn("mmr_u",
          col("rel_u") * mmrLambdaNum - col("pen_u") * (10L - mmrLambdaNum))
        .orderBy(col("mmr_u").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("rel"), lit(i).as("rank"), col("mmr_u"))
      sel = sel.unionByName(next).localCheckpoint()
    }
    sel.select(col("rank"), col("vec_id"), col("rel"),
      round(col("mmr_u").cast("double") / 1e7, 6).as("mmr_score"))
      .orderBy(col("rank"))
  }

  /** D27's bounded candidate stage, separated so the spec can assert
    * the contract the blanket PlanShapeSpec cannot see (both frames
    * materialize inside localCheckpoint, so their joins never appear
    * in the returned plan): the pool is TakeOrdered-bounded at
    * [[mmrCandidates]] BEFORE anything pairwise, and the pairwise
    * frame is exactly the pool² minus the diagonal. */
  private[graft] def mmrPool(t: Tables): (DataFrame, DataFrame) = {
    val cand = t.embeddings
      .filter(col("vec_id") =!= 0)
      .join(broadcast(queryVec(t)))
      .select(col("vec_id"), col("embedding"),
        score(col("embedding"), col("qv")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(mmrCandidates)
      .withColumn("rel_u", round(col("rel") * 1e6, 0).cast(LongType))
      .localCheckpoint()
    val pairs = cand.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .join(broadcast(cand.select(col("vec_id").as("b"), col("embedding").as("eb"))),
        col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(score(col("ea"), col("eb")) * 1e6, 0).cast(LongType).as("sim_u"))
      .localCheckpoint()
    (cand, pairs)
  }

  /** D15 — `q_knn_graph`: the corpus-wide approximate k-NN GRAPH —
    * every vector's top-3 same-cell neighbors, the building block
    * for graph-based near-dup clustering, diversity sampling and
    * corpus maps (D3 answers "neighbors of these 5 queries"; this
    * materializes the whole directed neighbor relation). Blocking =
    * the SHARED seeded IVF assignment (E5's rule, oracle-replayed),
    * so candidate pairs form only within cells: per-vector candidate
    * count is bounded by the cell size, which the corpus-scaled
    * `numCellsFor` n/τ rule keeps near τ — total join output is
    * Σ cell², i.e. ≈ n·τ rows at ANY corpus size, never n². The
    * per-vector top-3 is one row_number window over those bounded
    * candidates. Directed on purpose (both orientations emitted —
    * k-NN graphs are asymmetric); a vector alone in its cell has no
    * neighbors and is absent. */
  def knnGraph(t: Tables): DataFrame = {
    val k = 3
    val emb = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val cent = EmbeddingStore.seedCentroids(emb)
    // eager checkpoint: the self-join reads the assignment twice;
    // the per-row norm rides it so every in-cell pair below pays one
    // dot, not the fused 3-multiply-add cosine (normScore's
    // bit-parity argument — 6dp scores identical)
    val assigned = EmbeddingStore.assignCells(emb, cent)
      .select(col("doc_id").as("vec_id"), col("embedding"), col("cell"))
      .withColumn("__n", l2Norm(col("embedding")))
      .localCheckpoint()
    // shuffle_hash for the E5 reason: both sides read the
    // checkpointed assignment (no ordering to exploit) and rows
    // carry the dense vectors — an SMJ would sort the fattest rows
    // twice
    val scored = assigned.as("a").hint("shuffle_hash")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("neighbor_id"),
        EmbeddingStore.normScore(col("a.embedding"), col("b.embedding"),
          col("a.__n"), col("b.__n")).as("score"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("score"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** D18's edge threshold: a k-NN edge joins two vectors into one
    * semantic cluster only at cosine ≥ this. Set against the sf
    * corpora's D15 score distribution so clusters are real
    * neighborhoods, not the whole cell (at sf0.01: 99 of 500
    * vectors form 43 components, mean size 2.3, max 6 — the top ~5%
    * of k-NN edges). `private[graft]` so the oracle derives from the
    * same constant. */
  private[graft] val semanticClusterThreshold = 0.35

  /** D18 — `q_semantic_clusters`: SEMANTIC clustering of the whole
    * corpus — connected components over the thresholded approximate
    * k-NN graph (D15's edges at cosine ≥ τ), the standard corpus-map
    * / diversity-sampling structure (SemDeDup-style pipelines
    * cluster embeddings exactly to act per-cluster; E5/E6 answer
    * "which docs are DUPLICATES", this answers "which docs are ABOUT
    * the same thing"). Output mirrors E6: one row per clustered
    * vector with its component's min-id label; vectors with no
    * qualifying edge stay unclustered (absent), like E6's
    * non-duplicates.
    *
    * Scale shape: D15's cell-blocked candidate bound (~n·τ_cell
    * rows) feeds the E6 pointer-jumping closure (O(log n) rounds,
    * each an equi-join + map-side min) — both documented scale
    * paths; nothing new shuffles. */
  def semanticClusters(t: Tables): DataFrame =
    Clusters.connectedComponents(
      knnGraph(t)
        .filter(col("score") >= semanticClusterThreshold)
        .select(col("vec_id").as("doc_a"), col("neighbor_id").as("doc_b")),
      "doc_a", "doc_b")
      .select(col("node").cast(LongType).as("vec_id"),
        col("label").cast(LongType).as("cluster_id"))
      .orderBy(col("vec_id"))

  /** D3 — batch k-NN join: N query vectors × corpus, top-3 neighbors
    * per query. Queries broadcast, so the corpus never shuffles to
    * score. Per-query top-k runs in two stages so parallelism is
    * N×16, not N: stage 1 keeps top-3 within (query, salt) — which
    * provably contains the per-query global top-3 — so the final
    * N-partition window ranks ≤ N×16×3 rows instead of N×corpus. */
  def knnJoin(t: Tables): DataFrame = {
    val e = t.embeddings
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        l2Norm(col("embedding")).as("__qn"))
    val scored = e.filter(col("vec_id") >= 5)
      .withColumn("__n", l2Norm(col("embedding")))
      .join(broadcast(q))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        EmbeddingStore.normScore(col("embedding"), col("qv"),
          col("__n"), col("__qn")).as("score"))
    val salts = 16
    val w1 = Window
      .partitionBy(col("query_id"), pmod(col("neighbor_id"), lit(salts)))
      .orderBy(col("score").desc, col("neighbor_id"))
    val candidates = scored
      .withColumn("srnk", row_number().over(w1))
      .filter(col("srnk") <= 3)
      .drop("srnk")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    candidates
      .select(col("query_id"), col("neighbor_id"), col("score"),
        row_number().over(w).cast(LongType).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** D5 — vector algebra: per-vector dimension, L2 norm, max |x|.
    * Pure per-row codegen'd expressions; no shuffle at any scale. */
  def vectorNorms(t: Tables): DataFrame =
    t.embeddings
      .select(
        col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        round(l2Norm(col("embedding")), 6).as("norm"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double")))), 6).as("max_abs"))

  /** D7 — `q_ivf_recall`: recall@k of the IVF probe path against
    * exact brute-force top-k, the measurement the reference tunes its
    * `similarity_threshold`/`limit` knobs by hand against
    * (engine.py:105) and the empirical basis for choosing `probes`.
    * One row per probe count: (probes, k, recall), recall = |ANN top-k
    * ∩ exact top-k| / |exact top-k| averaged over a deterministic
    * query sample: the [[recallQueryCount]] LOWEST ids matching
    * vec_id % 100 == 0, via TakeOrdered — a bounded COUNT, not a
    * fraction of the corpus.
    *
    * Scale shape: this is an OFFLINE index diagnostic — ground truth
    * is by definition a brute-force scan, so the sampled queries
    * broadcast and the corpus is scanned ONCE for the exact ranking
    * and once (cell-pruned) for the ANN side; per-query work never
    * shuffles the corpus. The sample bound is what keeps that honest
    * at 100 TB: a fixed-FRACTION sample (the round-7 shape) makes the
    * query broadcast grow linearly with the corpus (~2.6 GB at 1e9
    * vectors) and the exact ground-truth side sample×corpus — i.e.
    * QUADRATIC in n; with the fixed COUNT the broadcast is O(K·dim)
    * forever (K=100 ⇒ ~51 KB at dim 64) and ground truth is O(K·n) —
    * one more linear scan, measured flat in SCALING.md §5 once the
    * cap binds (8× and 16× corpus). Assignment is the exact seeded
    * two-level quantizer E5 and the persisted index share, so the
    * measured recall is the recall of the REAL assignment, and the
    * whole evaluation is deterministic (6dp-rounded scores, id
    * tie-breaks, id-ordered sample) — which is what lets DuckDB
    * replay it as an oracle. */
  def ivfRecall(t: Tables): DataFrame =
    ivfRecallOver(t.spark,
      t.embeddings.select(col("vec_id").as("doc_id"), col("embedding")))

  /** D7's evaluation at the REFERENCE's 384-dim width (the width
    * canary for the recall/probes trade, like D11 is for search
    * cost): same evaluator, vectors = the raw-vote hash embedding of
    * the documents corpus at dim 384 ([[EmbeddingStore.embedRaw]],
    * D11's exactness technique). No oracleSql ON PURPOSE — the
    * evaluator's cross-engine exactness is already pinned by D7's
    * full replay at 64 dims, and this row exists to measure the
    * width's effect on the recall curve, not to re-prove the
    * machinery; VectorSearchSpec bounds its values instead (driver
    * records the rows-only check, like A7b/B9b). */
  def ivfRecallDim384(t: Tables): DataFrame =
    // the synthesized 384-dim frame is EAGERLY pinned: unlike D7's
    // parquet-backed embeddings (re-scan ≈ free), every re-scan here
    // re-runs the corpus tokenize→vote embed pipeline, and the
    // evaluator's seed/count/assign stages would re-run it 4× —
    // measured ~3× the query's own CPU before this checkpoint
    ivfRecallOver(t.spark,
      EmbeddingStore.embedRaw(t.documents, 384)
        .select(col("doc_id"), col("raw").cast("array<float>").as("embedding"))
        .localCheckpoint())

  // private[graft]: EncoderSpec re-runs the evaluator over an
  // alternate-encoder corpus to prove it encoder-agnostic
  private[graft] def ivfRecallOver(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame): DataFrame =
    // the D34 surface with ONE all-inclusive selectivity level (every
    // vector labeled 0 < 1, a constant projection — no label join)
    // IS the unfiltered evaluator — one skeleton, two rows, no drift
    // possible between them
    recallSurface(spark, emb, Seq(1), _.withColumn("label", lit(0)))
      .select(col("probes"), col("k"), col("recall"))
      .orderBy(col("probes"))

  /** D34's selectivity axis: `label < maxl` for maxl ∈ {1, 5, 10} —
    * ~10% / ~50% / 100% of the uniform 10-label corpus (the 100%
    * level anchors the curve to D7's unfiltered numbers — a built-in
    * evaluator sanity check, like D31's full-width row). */
  private[graft] val filteredRecallLabels = Seq(1, 5, 10)

  /** D34 — `q_filtered_recall`: the FILTERED-ANN recall surface —
    * recall@k vs (filter selectivity × probes), the published trade
    * D28 prices by assertion (post-filter semantics: under a
    * selective filter the k-th match sits deeper in each probed cell
    * AND qualifying vectors hide in unprobed cells, so fixed probes
    * lose recall as the filter narrows; D28 widens probes 2→4 and
    * this row MEASURES what that buys at each selectivity). D7's
    * evaluator with a selectivity axis: ground truth = exact top-k
    * over the FILTERED corpus, ANN = top-k over filtered vectors in
    * the top-`probes` cells, per (selectivity, probes) cell of the
    * surface. No oracleSql ON PURPOSE — the machinery's cross-engine
    * exactness is pinned by D7's full replay, and the 100% column
    * must equal D7's curve (VectorSearchSpec asserts exactly that,
    * plus bounds and probe-monotonicity); rows-only driver check,
    * curve recorded per round in BENCH_BASELINE.md like D7b.
    *
    * Scale shape: D7's verbatim — one assignment pass, the bounded
    * lowest-id query sample broadcast so the corpus never shuffles,
    * ONE scored corpus×queries pass feeding all three selectivity
    * legs via a 3-row broadcast axis (the filter prunes the fan-out
    * to ~1.6× total), per-(query, sel, probes) top-k windows over
    * query-bounded candidates. The label attach is one doc-keyed
    * equi-join on the assignment. */
  def filteredRecall(t: Tables): DataFrame =
    filteredRecallOver(t.spark, t.embeddings
      .select(col("vec_id").as("doc_id"), col("embedding"), col("label")))

  private[graft] def filteredRecallOver(
      spark: org.apache.spark.sql.SparkSession, embL: DataFrame): DataFrame =
    recallSurface(spark, embL.select(col("doc_id"), col("embedding")),
      filteredRecallLabels,
      _.join(embL.select(col("doc_id"), col("label")), "doc_id"))

  /** THE recall-evaluator skeleton — D7's unfiltered curve and D34's
    * filtered surface are the same machinery, so they ARE the same
    * function (ivfRecallOver delegates with one all-inclusive
    * selectivity level): one place for the sample rule, the probe
    * ranking and the window shapes to evolve. `attachLabel` supplies
    * the selectivity column on the assignment — D34's doc-keyed
    * equi-join, D7's constant `lit(0)` — so the unfiltered evaluator
    * never pays a corpus self-join for a label its all-inclusive
    * level ignores. A selectivity leg with an EMPTY ground truth (no
    * candidate matches its filter) emits its surface rows with
    * recall NULL — undefined, never a silent row drop and never a
    * misleading 0. */
  private def recallSurface(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, selLevels: Seq[Int],
      attachLabel: DataFrame => DataFrame): DataFrame = {
    val k = 10
    val cent = EmbeddingStore.seedCentroids(emb)
    // per-row norms ride the pinned assignment so the corpus×queries
    // scoring passes below pay one dot per pair, not the fused
    // 3-multiply-add cosine (EmbeddingStore.normScore's bit-parity
    // argument — the 6dp-rounded scores are IEEE-identical)
    val assigned = attachLabel(EmbeddingStore.assignCells(emb, cent))
      .withColumn("__vn", l2Norm(col("embedding")))
      .localCheckpoint()
    val queries = assigned.filter(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("doc_id").as("qid"), col("embedding").as("qv"),
        col("__vn").as("__qn"))
      .orderBy(col("qid")).limit(recallQueryCount)
      .localCheckpoint()
    val probeRank = queries.join(broadcast(cent))
      .select(col("qid"), col("cell"),
        score(col("centroid"), col("qv")).as("cs"))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("cell"))))
      .select(col("qid"), col("cell"), col("prank"))
    val probeLevels = spark.range(1)
      .select(explode(array(lit(1), lit(2), lit(4))).as("probes"))
    val sels = spark.range(1).select(explode(typedLit(
      selLevels)).as("max_label"))
    // ground truth per selectivity: the ONE scored corpus×queries
    // pass fans out over the 3-row axis, filtered before the window
    val exact = assigned.join(broadcast(queries))
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(sels), col("label") < col("max_label"))
      .select(col("qid"), col("max_label"), col("doc_id"),
        EmbeddingStore.normScore(col("embedding"), col("qv"),
          col("__vn"), col("__qn")).as("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"), col("max_label"))
          .orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("max_label"), col("doc_id"))
      .localCheckpoint() // consumed by every probe level + denominators
    val ann = probeRank.join(broadcast(probeLevels),
        col("prank") <= col("probes"))
      .select(col("qid"), col("probes"), col("cell"))
      .join(assigned, "cell")
      .join(queries.withColumnRenamed("qid", "qid2"),
        col("qid") === col("qid2") && col("doc_id") =!= col("qid2"))
      .join(broadcast(sels), col("label") < col("max_label"))
      .select(col("qid"), col("probes"), col("max_label"), col("doc_id"),
        EmbeddingStore.normScore(col("embedding"), col("qv"),
          col("__vn"), col("__qn")).as("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"), col("probes"), col("max_label"))
          .orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("probes"), col("max_label"), col("doc_id"))
    val hits = ann.join(exact, Seq("qid", "max_label", "doc_id"))
      .groupBy(col("probes"), col("max_label")).agg(count(lit(1)).as("hits"))
    val denom = exact.groupBy(col("max_label"))
      .agg(count(lit(1)).as("total"))
    probeLevels.crossJoin(broadcast(sels))
      .join(hits, Seq("probes", "max_label"), "left")
      .join(broadcast(denom), Seq("max_label"), "left")
      .select(col("max_label"),
        round(col("max_label").cast("double") / 10.0, 1).as("selectivity"),
        col("probes"), lit(k).as("k"),
        when(coalesce(col("total"), lit(0L)) === 0L,
          lit(null).cast("double"))
          .otherwise(round(coalesce(col("hits"), lit(0L)).cast("double") /
            col("total").cast("double"), 6)).as("recall"))
      .orderBy(col("max_label"), col("probes"))
  }

  /** D31's truncation widths (the 64-dim anchor makes recall = 1 by
    * construction — a built-in evaluator sanity check). */
  private[graft] val truncateDims = Seq(8, 16, 32, 64)

  /** D31 — `q_truncate_recall`: the DIMENSION-truncation recall curve
    * — top-k recall of cosine over only the first d components vs the
    * full-width exact top-k, for d ∈ [[truncateDims]]. This is the
    * measurement behind Matryoshka-style retrieval (Kusupati et al.
    * 2022: rank on a prefix of the embedding, refine on the full
    * width) and the scan-bytes lever it prices is the cheapest one an
    * index owns — a d-prefix scan reads d/64ths of the vector bytes
    * with ZERO auxiliary structure (no codebooks like D12's PQ, no
    * scales like D23's SQ8), so this curve vs D22/D23's fidelity
    * tables is exactly the compression-choice table a deployment
    * reads (prefix truncation only ranks well when the embedder was
    * trained for it — which is what the measured curve tells you).
    *
    * Same evaluation contract as D7: the bounded [[recallQueryCount]]
    * lowest-id query sample (O(K) rows at any corpus size), queries
    * broadcast so the corpus never shuffles, ground truth = one
    * full-width brute-force pass, one truncated pass per width (the
    * widths ride a 4-row broadcast), per-(query, width) top-k via
    * one window over query-bounded candidates, 6dp scores with id
    * tie-breaks — deterministic end to end, so DuckDB replays it
    * exactly. */
  def truncateRecall(t: Tables): DataFrame = {
    val k = 10
    val emb = t.embeddings
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val queries = emb.filter(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("doc_id").as("qid"), col("embedding").as("qv"))
      .orderBy(col("qid")).limit(recallQueryCount)
      .localCheckpoint()
    val exact = emb.join(broadcast(queries))
      .filter(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        score(col("embedding"), col("qv")).as("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("doc_id"))
      .localCheckpoint() // consumed per width + as the denominator
    val dims = t.spark.range(1)
      .select(explode(typedLit(truncateDims)).as("dim"))
    val trunc = emb.join(broadcast(queries))
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(dims))
      .select(col("qid"), col("dim"), col("doc_id"),
        score(slice(col("embedding"), lit(1), col("dim")),
          slice(col("qv"), lit(1), col("dim"))).as("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"), col("dim"))
          .orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("dim"), col("doc_id"))
    val hits = trunc.join(exact, Seq("qid", "doc_id"))
      .groupBy(col("dim")).agg(count(lit(1)).as("hits"))
    val denom = exact.agg(count(lit(1)).as("total"))
    dims.join(hits, Seq("dim"), "left")
      .crossJoin(broadcast(denom))
      .select(col("dim"), lit(k).as("k"),
        round(coalesce(col("hits"), lit(0L)).cast("double") /
          col("total").cast("double"), 6).as("recall"))
      .orderBy(col("dim"))
  }

  /** D4 — IVF ANN over the REAL index cells (SURVEY.md §5): the
    * corpus is quantized by the exact seeded two-level rule the
    * persisted index, E5's dedup blocking and D7's recall evaluator
    * share (`EmbeddingStore.seedCentroids` + `assignCells`, cell
    * count = `numCellsFor(n)` so expected cell size is
    * corpus-independent); the query scores the broadcast centroid
    * table, prunes to the 2 nearest cells, and exact cosine runs only
    * inside those cells. The round-2 per-LABEL variant this replaces
    * had a cell count fixed at the label cardinality — in-cell scan
    * cost grew linearly with the corpus. At 100 TB the cells are the
    * persisted index's partition layout (`searchIvf` probes them via
    * PartitionFilters); here the probe is a broadcast semi-join on
    * the cell id over the checkpointed assignment.
    *
    * Parity: centroid scores round to 6 dp, probe order (score desc,
    * cell asc), final order (score desc, vec_id asc) — the oracle
    * replays the shared assignment scaffold plus this probe. */
  def annIvf(t: Tables): DataFrame = {
    val emb = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val cent = EmbeddingStore.seedCentroids(emb)
    // eager checkpoint: the query-vector lookup and the candidate
    // scan are two independent consumers of the assignment (lazy
    // would re-run the two-level quantization per consumer)
    val assigned = EmbeddingStore.assignCells(emb, cent).localCheckpoint()
    val qv = assigned.filter(col("doc_id") === 0)
      .select(col("embedding").as("qv"))
    val probed = cent.join(broadcast(qv))
      .select(col("cell"), score(col("centroid"), col("qv")).as("cs"))
      .orderBy(col("cs").desc, col("cell")).limit(2)
      .select(col("cell"))
    assigned.join(broadcast(probed), "cell")
      .filter(col("doc_id") =!= 0)
      .join(broadcast(qv))
      .select(col("doc_id").as("vec_id"), col("cell"),
        score(col("embedding"), col("qv")).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
  }

  /** Okapi BM25 parameters (Robertson & Walker's classic values;
    * idf is the Lucene `ln(1 + (N-df+0.5)/(df+0.5))` variant, which
    * keeps every term contribution positive). */
  private val bm25K1 = 1.2
  /** k1 + 1 as a LITERAL, not `bm25K1 + 1`: the oracle SQL and the
    * independent spec model both write 2.2, and a computed 1.2 + 1.0
    * is not guaranteed bit-identical to the decimal literal's
    * nearest double. Change k1 ⇒ update this, the oracle literals
    * and the spec model together. */
  private val bm25K1p1 = 2.2
  private val bm25B = 0.75

  /** Shared BM25 scorer: every non-query doc's Okapi BM25 score
    * against the query doc's distinct terms, as integer micro-units
    * (one row per scored doc, only docs matching ≥1 term).
    *
    * Per (doc, term): contrib = idf(term) · tf·(k1+1) / (tf +
    * k1·(1−b+b·dl/avgdl)), quantized to micro BEFORE the per-doc sum
    * (the F15 technique — the sum is exact integer math in any
    * order, so DuckDB replays the score bit-for-bit; the doubles
    * feeding the round are division/multiplication chains in ONE
    * fixed association on both engines, ln-ulp drift absorbed by the
    * micro round).
    *
    * Scale shape: ONE tokenize pass (checkpointed) feeds the
    * doc-length agg and the query-term tf; the corpus-sized token
    * stream is cut down FIRST by a broadcast join on the ≤|q|-term
    * query list (never a vocabulary-wide df shuffle — df computes on
    * the surviving query-term rows only, exactly). dl is the one
    * unavoidable corpus agg (map-side combining by doc_id). At
    * 100 TB a serving deployment would persist tf/df as an inverted
    * index; this is the batch-analytics expression of the same
    * plan. */
  private def bm25Scored(t: Tables): DataFrame = {
    val qTerms = t.documents.filter(col("doc_id") === 0)
      .select(explode(array_distinct(words(col("text")))).as("w"))
    val tok = t.documents.filter(col("doc_id") =!= 0)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .localCheckpoint() // feeds the dl agg AND the query-term tf
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .localCheckpoint() // feeds the corpus stats AND the scoring join
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("toks"))
    val tfq = tok.join(broadcast(qTerms), Seq("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = (col("tf") * lit(bm25K1p1)) /
      (col("tf") + lit(bm25K1) *
        (lit(1.0) - lit(bm25B) +
          lit(bm25B) * col("dl") * col("n") / col("toks")))
    tfq.join(broadcast(dfq), Seq("w"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(stats))
      .select(col("doc_id"),
        round(idf * norm * 1e6).cast(LongType).as("c_mu"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c_mu")).as("mu"))
  }

  /** D16 — `q_search_bm25`: Okapi BM25 full-text retrieval — the
    * LEXICAL leg of a production search stack (the reference serves
    * pure embedding search, engine.py:105; every deployed system
    * pairs it with a term index for exact-word queries, which
    * embeddings are notoriously weak at). Query = doc 0's distinct
    * terms (the D14 convention), top-10 by score with id
    * tie-breaks. */
  def searchBm25(t: Tables): DataFrame =
    bm25Scored(t)
      .select(col("doc_id"), col("n_terms"),
        round(col("mu").cast("double") / lit(1e6), 6).as("score"))
      .orderBy(col("mu").desc, col("doc_id"))
      .limit(10)

  /** D17 — `q_search_hybrid`: reciprocal-rank-fusion hybrid
    * retrieval (Cormack et al. 2009's RRF — the standard
    * score-free way to merge a semantic and a lexical ranking,
    * used by every hybrid search engine): fuse the cosine top-50
    * (D1's scoring) with the BM25 top-50 (D16's scoring) by
    * rrf = Σ 1/(60 + rank), rank ∈ each list the doc appears in.
    *
    * Determinism: both legs rank by the family's total order
    * (score/mu desc, id asc); 1/(60+rank) is an exact IEEE division
    * both engines reproduce bit-for-bit, and the two-term sum adds
    * in one fixed order (semantic + lexical) before the 6dp display
    * round.
    *
    * Scale shape: each leg is its own documented scale path ending
    * in a 50-row TakeOrdered; ranking windows run over those 50-row
    * frames (driver-sized, not corpus-sized), and the fusion is a
    * 50×50 full outer join. The expensive part IS the legs; fusion
    * is free. */
  def searchHybrid(t: Tables): DataFrame = {
    val sem = t.embeddings
      .filter(col("vec_id") =!= 0)
      .join(broadcast(queryVec(t)))
      .select(col("vec_id").as("doc_id"),
        score(col("embedding"), col("qv")).as("s"))
      .orderBy(col("s").desc, col("doc_id"))
      .limit(50)
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col("s").desc, col("doc_id"))))
      .select(col("doc_id"), col("sem_rank"))
    val lex = bm25Scored(t)
      .orderBy(col("mu").desc, col("doc_id"))
      .limit(50)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("mu").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    sem.join(lex, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("sem_rank"), col("lex_rank"),
        (coalesce(lit(1.0) / (col("sem_rank") + 60), lit(0.0)) +
          coalesce(lit(1.0) / (col("lex_rank") + 60), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
      // absent-from-a-list ranks surface as 0, not NULL — "not in
      // that top-50" is a value, and the null-free columns compare
      // exactly across engines
      .select(col("doc_id"),
        coalesce(col("sem_rank"), lit(0)).cast(LongType).as("sem_rank"),
        coalesce(col("lex_rank"), lit(0)).cast(LongType).as("lex_rank"),
        round(col("rrf"), 6).as("rrf"))
  }

  /** D30 — `q_knn_classify`: k-NN LABEL PROPAGATION over the corpus
    * graph (Cover & Hart 1968's rule run corpus-wide) — predict
    * every vector's label by majority vote of its D15 neighbors and
    * score the prediction against the stored label, per class. This
    * is the weak-supervision audit a pipeline runs before trusting
    * embedding-space label transfer (propagating scarce
    * quality/domain labels to unlabeled data): per-class accuracy
    * says WHERE the embedding neighborhood respects the labeling and
    * where propagation would pollute.
    *
    * Vote rule, fully deterministic: neighbors = D15's k=3 edges;
    * predicted = the neighbor label with the highest count, ties to
    * the LOWEST label (the house max-struct argmax — a map-side-
    * combining aggregate, never a window over the vote rows).
    *
    * Scale shape: one keyed edges⋈labels join (neighbor side), one
    * (vec_id, label) map-side count, the argmax aggregate, one
    * doc-keyed true-label join, and a ≤|labels|-row final agg; all
    * counts exact longs, accuracy one 6dp division. */
  def knnClassify(t: Tables): DataFrame = {
    val labels = t.embeddings.select(col("vec_id"), col("label"))
    val votes = knnGraph(t)
      .select(col("vec_id"), col("neighbor_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), "neighbor_id")
      .groupBy(col("vec_id"), col("nl"))
      .agg(count(lit(1)).as("c"))
    val pred = votes
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c"), (-col("nl")).as("m"))).as("b"))
      .select(col("vec_id"), (-col("b.m")).cast("int").as("pred"))
    pred.join(labels, "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_voted"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n_voted"), col("n_correct"),
        round(col("n_correct").cast("double")
          / col("n_voted").cast("double"), 6).as("accuracy"))
      .orderBy(col("label"))
  }

  /** D29 `q_graph_pagerank`: power-iteration count. Three steps is
    * the demonstration depth — the per-iteration plan is identical
    * at any count, and data-curation centrality runs O(10). */
  private[graft] val pagerankIters = 3

  /** D29 — `q_graph_pagerank`: CENTRALITY over the corpus k-NN graph
    * — PageRank (Page et al. 1999) on D15's edges, the standard
    * "which documents are most representative / most referenced by
    * their neighborhoods" signal a curation pipeline uses to pick
    * exemplars (the graph-centrality counterpart of E16's
    * prototypicality: E16 scores against a cluster centroid, this
    * scores by recursive neighborhood mass on the same similarity
    * structure). Pruned-dangling variant: a vector with no
    * qualifying out-edges leaks its mass (documented; the k-NN
    * graph's dangling set is the no-neighbor fringe).
    *
    * EXACT-INTEGER power iteration — the whole computation is longs:
    * ranks start at 1e6 micro-units, each edge transfers
    * (r·85) div (100·outdeg), each node restarts at 150000 (the 0.85
    * damping in micro-units); floor division replays identically in
    * DuckDB (`//`), so after [[pagerankIters]] iterations the ranks
    * compare bit-for-bit with no float-parity contract needed at
    * all — the first fully-integer iterative operator in the
    * registry.
    *
    * Scale shape: per iteration, one keyed edges⋈ranks join (src)
    * and one map-side-combining sum (dst) — the canonical
    * distributed PageRank step; at 100 TB both shuffles key on
    * vector ids, and the degree-annotated edge list materializes
    * ONCE before the loop (loop-invariant — pre-partitioning it by
    * src makes every iteration's join co-located). Rank frames use
    * cache substitution (persist + eager count + a WORKING
    * unpersist of the superseded frame — see [[pagerankOn]]) so the
    * executed plan stays one step deep and live storage stays at
    * two rank frames at any iteration depth. */
  def graphPagerank(t: Tables): DataFrame = {
    val nodes = t.embeddings.select(col("vec_id"))
    val edges = knnGraph(t)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .persist()
    edges.count()
    val top = pagerankOn(nodes, edges,
      _.orderBy(col("rank_u").desc, col("vec_id")).limit(20))
    edges.unpersist()
    top
  }

  /** Pin an iteration frame BOTH ways at once: the logical plan
    * truncates to an RDD leaf (per-iteration Catalyst/codegen work
    * stays O(1) instead of re-optimizing a tree that regrows the
    * whole upstream DAG every step — plain persists measured ~2×
    * process CPU on q_graph_pagerank, because cache substitution
    * truncates only the EXECUTED plan, never the tree the optimizer
    * walks) and the storage stays RELEASABLE (plain persist +
    * working unpersist — unlike localCheckpoint, whose blocks no
    * unpersist can free). The RDD keeps its lineage for fault
    * recovery; only the SQL tree is cut. */
  private def pinLeaf(df: DataFrame): DataFrame = {
    val leaf = df.sparkSession.createDataFrame(df.rdd, df.schema)
    leaf.persist()
    leaf.count()
    leaf
  }

  /** The integer PageRank core (testable on hand-built graphs):
    * returns `finish(...)` applied to the (vec_id, rank_u, in_deg)
    * frame for every node, materialized so NOTHING internal stays
    * live after the call returns.
    *
    * Iteration storage contract: every internal frame — the
    * loop-invariant degree-annotated edge list and node set, and the
    * per-iteration rank frame — pins via [[pinLeaf]] (O(1)-sized
    * per-iteration plans AND working unpersist) and is released once
    * superseded or once the final output is pinned. Live storage is
    * 2 rank frames + the 2 invariants during the loop and ZERO
    * internal frames after return: the final ranks frame is consumed
    * into an eager localCheckpoint of `finish`'s (caller-bounded —
    * graphPagerank passes top-20) output, then every persist is
    * released. Two accepted costs of that final eager pin: the
    * returned frame's retention is permanent for the session
    * (unpersist is a no-op on localCheckpointed frames — so pass a
    * BOUNDED finish; the identity default pins n rows and is for
    * small test graphs only), and plan-audit artifacts see
    * `Scan ExistingRDD` rather than the iteration internals (the
    * driver-loop operators' shared trade — q_kmeans/q_bpe_train
    * likewise; the per-step plan shape is documented above
    * instead). */
  private[graft] def pagerankOn(nodes: DataFrame, edges: DataFrame,
      finish: DataFrame => DataFrame = identity): DataFrame = {
    val out = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ew = pinLeaf(edges.join(out, "src"))
    val ns = pinLeaf(nodes)
    var ranks = pinLeaf(ns.withColumn("r", lit(1000000L)))
    (1 to pagerankIters).foreach { _ =>
      val contrib = ew
        .join(ranks.select(col("vec_id").as("src"), col("r")), "src")
        .select(col("dst").as("vec_id"),
          expr("(r * 85) div (100 * outdeg)").as("c"))
        .groupBy(col("vec_id")).agg(sum(col("c")).as("in_mass"))
      val prev = ranks
      ranks = pinLeaf(ns.join(contrib, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(150000L) + coalesce(col("in_mass"), lit(0L))).as("r")))
      prev.unpersist()
    }
    val inDeg = ew.groupBy(col("dst").as("vec_id"))
      .agg(count(lit(1)).as("in_deg"))
    val result = finish(ranks.join(inDeg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("r").as("rank_u"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg")))
      .localCheckpoint(true)
    ranks.unpersist()
    ew.unpersist()
    ns.unpersist()
    result
  }
}
