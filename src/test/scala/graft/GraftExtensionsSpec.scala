package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.sources.Tables

class GraftExtensionsSpec extends SparkTestBase {

  test("registered SQL functions evaluate: self-cosine is 1, norms positive") {
    GraftFunctions.register(spark)
    Tables(spark, sfDir).embeddings.createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT vec_id,
        |  ROUND(cosine_sim(embedding, embedding), 6) AS self_cos,
        |  l2_norm(embedding) AS nrm,
        |  ROUND(dot_product(embedding, embedding) - l2_norm(embedding) * l2_norm(embedding), 6) AS diff
        |FROM emb LIMIT 100""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) === 1.0)
      assert(r.getDouble(2) > 0.0)
      assert(math.abs(r.getDouble(3)) < 1e-6)
    }
  }

  test("extensions class injects the same definitions without error") {
    // config path: spark.sql.extensions=graft.GraftExtensions at session
    // build; here we only exercise the injection wiring
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("vector functions accept array<double> embeddings with correct math") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 2.0D, 2.0D), array(2.0D, 4.0D, 4.0D)) AS c,
        |       l2_norm(array(3.0D, 4.0D)) AS n,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 11.0)
  }

  test("vector functions reject non-array inputs at analysis time") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(1, 2)").collect()
    }
    assert(e.getMessage.contains("array<float> or array<double>"))
  }

  test("table functions run whole pipelines from SQL and match the DSL") {
    GraftTableFunctions.register(spark)
    val t = Tables(spark, sfDir)
    val exactSql = spark.sql(
      s"SELECT count(*) AS n FROM graft_dedup_exact('$sfDir')").first().getLong(0)
    assert(exactSql === graft.operators.Dedup.dedupExact(t).count())
    val asofSql = spark.sql(
      s"SELECT count(*) AS n FROM graft_asof_join('$sfDir')").first().getLong(0)
    assert(asofSql === graft.operators.EventOps.asofJoin(t).count())
    // a predicate above the TVF composes (the plan inlines like a view)
    val filtered = spark.sql(
      s"""SELECT user_id, count(*) AS n
         |FROM graft_sessionize('$sfDir')
         |WHERE n_events > 1 GROUP BY user_id""".stripMargin)
    assert(filtered.count() > 0)
    // an iterative pipeline TVF (converges during analysis, inlines
    // the result) and the composed pipeline audit
    val clusters = spark.sql(
      s"SELECT count(*) AS n FROM graft_dedup_clusters('$sfDir')").first().getLong(0)
    assert(clusters === graft.operators.Clusters.dedupClusters(t).count())
    assert(spark.sql(
      s"SELECT sum(n_docs) AS n FROM graft_pipeline('$sfDir')").first().getLong(0) > 0)
    // the composed shared-stage family from SQL: per-kind counts
    // match the standalone DSL queries
    val famCounts = spark.sql(
      s"""SELECT kind, count(*) AS n FROM graft_dedup_family('$sfDir')
         |GROUP BY kind""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(famCounts.getOrElse("pair", 0L) ===
      graft.operators.Dedup.dedupMinhash(t).count())
    assert(famCounts.getOrElse("cluster", 0L) ===
      graft.operators.Clusters.dedupClusters(t).count())
    assert(famCounts.getOrElse("contam", 0L) ===
      graft.operators.Dedup.decontaminate(t).count())
    // round-7 surfaces: 13-gram decontamination, the persisted-index
    // probe (builds into tmp on first call, reuses after), and the
    // partition-pruned incremental scan
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_ngram_overlap('$sfDir')")
      .first().getLong(0) ===
      graft.operators.Dedup.ngramOverlap(t).count())
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_search_ivf('$sfDir')")
      .first().getLong(0) ===
      graft.operators.EmbeddingStore.searchIvfQuery(t).count())
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_incremental_pruned('$sfDir')")
      .first().getLong(0) ===
      graft.operators.EventOps.incremental(t).count())
    // the multimodal preprocessor legs
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_media_embedding('$sfDir')")
      .first().getLong(0) ===
      graft.operators.Multimodal.mediaEmbedding(t).count())
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_media_resize('$sfDir')")
      .first().getLong(0) ===
      graft.operators.Multimodal.mediaResize(t).count())
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_pack_sequences('$sfDir')")
      .first().getLong(0) ===
      graft.operators.TextAnalysis.packSequences(t).count())
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_mix_temperature('$sfDir')")
      .first().getLong(0) ===
      graft.operators.TextAnalysis.mixTemperature(t).count())
  }

  test("table functions reject non-literal arguments at analysis time") {
    GraftTableFunctions.register(spark)
    Tables(spark, sfDir).documents.createOrReplaceTempView("docs_tvf")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM docs_tvf d, LATERAL graft_dedup_exact(d.source)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("resolve"))
  }

  test("filter above a TVF pushes into the pipeline's parquet scan") {
    GraftTableFunctions.register(spark)
    val df = spark.sql(
      s"SELECT doc_id, quality FROM graft_quality_score('$sfDir') WHERE doc_id = 7")
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    // the doc_id predicate must reach the documents scan as a pushed filter
    assert(scans.exists(s => s.contains("PushedFilters") && s.contains("doc_id")
      && (s.contains("EqualTo") || s.contains("IsNotNull"))))
  }

  test("text pipeline functions are SQL-callable and match the DSL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  clean_text('  hi   there https://x.io/a ✨!  ') AS cleaned,
        |  extract_text('{"text": "inner"}', 1) AS ext1,
        |  extract_text('{"text": "raw"}', 2) AS ext2,
        |  is_file_name('report.pdf attached') AS f1,
        |  is_file_name('Alice Smith') AS f2,
        |  conversation_type('group-7') AS ct1,
        |  conversation_type('room-7') AS ct2""".stripMargin).first()
    // whitespace collapses BEFORE the URL strips (the reference's
    // order, processor.py:167-170) — hence the double space
    assert(r.getString(0) === "hi there  !")
    assert(r.getString(1) === "inner")
    assert(r.getString(2) === """{"text": "raw"}""")
    assert(r.getBoolean(3) === true)
    assert(r.getBoolean(4) === false)
    assert(r.getString(5) === "group")
    assert(r.getString(6) === "private")
  }

  test("round-11 table functions match the DSL") {
    GraftTableFunctions.register(spark)
    val t = Tables(spark, sfDir)
    assert(spark.sql(s"SELECT count(*) FROM graft_dedup_spans('$sfDir')")
      .first().getLong(0) === graft.operators.Dedup.dedupSpans(t).count())
    assert(spark.sql(s"SELECT count(*) FROM graft_source_profile('$sfDir')")
      .first().getLong(0) === graft.operators.TextAnalysis.sourceProfile(t).count())
    assert(spark.sql(
      s"SELECT count(*) FROM graft_gopher_rules('$sfDir') WHERE kept")
      .first().getLong(0) ===
      graft.operators.TextAnalysis.gopherRules(t)
        .filter(org.apache.spark.sql.functions.col("kept")).count())
    assert(spark.sql(s"SELECT count(*) FROM graft_search_rerank('$sfDir')")
      .first().getLong(0) ===
      graft.operators.VectorSearch.searchRerank(t).count())
    // hybrid stack + selection/audit surfaces (late round 11): a
    // value-level probe each, not just counts
    assert(spark.sql(
      s"SELECT max(score) FROM graft_search_bm25('$sfDir')")
      .first().getDouble(0) ===
      graft.operators.VectorSearch.searchBm25(t)
        .agg(org.apache.spark.sql.functions.max("score")).first().getDouble(0))
    assert(spark.sql(
      s"SELECT round(sum(rrf), 6) FROM graft_search_hybrid('$sfDir')")
      .first().getDouble(0) ===
      graft.operators.VectorSearch.searchHybrid(t)
        .agg(org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("rrf"), 6))
        .first().getDouble(0))
    assert(spark.sql(s"SELECT count(*) FROM graft_bpe_pairs('$sfDir')")
      .first().getLong(0) ===
      graft.operators.TextAnalysis.bpePairs(t).count())
    assert(spark.sql(
      s"SELECT min(cluster_id) FROM graft_semantic_clusters('$sfDir')")
      .first().getLong(0) ===
      graft.operators.VectorSearch.semanticClusters(t)
        .agg(org.apache.spark.sql.functions.min("cluster_id"))
        .first().getLong(0))
    assert(spark.sql(
      s"SELECT sum(n) FROM graft_lang_confusion('$sfDir')")
      .first().getLong(0) === t.documents.count())
    assert(spark.sql(
      s"SELECT sum(n) FROM graft_gate_matrix('$sfDir')")
      .first().getLong(0) === t.documents.count())
    assert(spark.sql(
      s"SELECT sum(n_docs) FROM graft_export_manifest('$sfDir')")
      .first().getLong(0) ===
      graft.operators.TextAnalysis.pipelineKeptDocs(t).count())
    assert(spark.sql(
      s"SELECT count(*) FROM graft_dsir_weights('$sfDir') WHERE kept")
      .first().getLong(0) ===
      graft.operators.TextAnalysis.dsirWeights(t)
        .filter(org.apache.spark.sql.functions.col("kept")).count())
    assert(spark.sql(
      s"SELECT count(*) FROM graft_ngram_topk('$sfDir') WHERE df >= 2")
      .first().getLong(0) ===
      graft.operators.TextAnalysis.ngramTopk(t)
        .filter(org.apache.spark.sql.functions.col("df") >= 2).count())
    assert(spark.sql(s"SELECT count(*) FROM graft_source_overlap('$sfDir')")
      .first().getLong(0) === graft.operators.Dedup.sourceOverlap(t).count())
  }

  test("the side-effecting export TVF runs its export at most once per session/dir") {
    val before = graft.sources.Export.runs.get()
    // an EXPLAIN, a real run, and a query referencing the TVF twice:
    // five analyses of the TVF, at most ONE actual corpus export
    // (the first may hit the memo from an earlier test in this JVM)
    spark.sql(s"EXPLAIN SELECT * FROM graft_export_manifest('$sfDir')").collect()
    spark.sql(s"SELECT count(*) FROM graft_export_manifest('$sfDir')").collect()
    spark.sql(
      s"""SELECT a.split FROM graft_export_manifest('$sfDir') a
         |JOIN graft_export_manifest('$sfDir') b
         |  ON a.split = b.split AND a.source = b.source""".stripMargin).collect()
    assert(graft.sources.Export.runs.get() - before <= 1,
      "referencing the export TVF must not re-run the export")
  }
}
