package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.VectorSearch
import graft.sources.Tables

class VectorSearchSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  test("ivfRecall: one row per probe level, recall in [0,1] and monotone in probes") {
    val r = VectorSearch.ivfRecall(t).collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(1, 2, 4))
    assert(r.forall(_.getInt(1) === 10))
    val recalls = r.map(_.getDouble(2))
    assert(recalls.forall(x => x >= 0.0 && x <= 1.0))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"probing more cells can only add candidates: ${recalls.mkString(",")}")
    assert(recalls.last > 0.0, "probing 4 cells must recover some exact neighbors")
  }

  test("filteredRecall: a full 3x3 surface, bounded, probe-monotone per " +
    "selectivity, with the 100% column anchored to D7's unfiltered curve") {
    val rows = VectorSearch.filteredRecall(t).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))
    // full surface: every (selectivity, probes) cell present, k = 10
    assert(rows.map(r => (r._1, r._3)).toSeq ===
      (for (s <- VectorSearch.filteredRecallLabels; p <- Seq(1, 2, 4))
        yield (s, p)))
    assert(rows.forall(_._4 === 10))
    assert(rows.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    // per selectivity: probing more cells can only add candidates
    rows.groupBy(_._1).foreach { case (s, g) =>
      val rc = g.sortBy(_._3).map(_._5)
      assert(rc.sliding(2).forall(p => p(0) <= p(1)),
        s"sel $s not probe-monotone: ${rc.mkString(",")}")
    }
    // the 100%-selectivity column IS D7's curve (same machinery, the
    // label < 10 filter keeps everything) — the evaluator's anchor
    val full = rows.filter(_._1 == 10).sortBy(_._3).map(r => (r._3, r._5))
    val d7 = VectorSearch.ivfRecall(t).collect()
      .map(r => (r.getInt(0), r.getDouble(2))).sortBy(_._1)
    assert(full.toSeq === d7.toSeq)
  }

  test("filteredRecall: an empty ground-truth leg emits its surface " +
    "rows with recall NULL, never a silent drop") {
    import spark.implicits._
    // every label >= 1, so the max_label=1 leg has NO qualifying docs
    val embL = t.embeddings
      .select(col("vec_id").as("doc_id"), col("embedding"),
        (col("label") % 9 + 1).as("label"))
    val rows = VectorSearch.filteredRecallOver(spark, embL).collect()
    assert(rows.length === VectorSearch.filteredRecallLabels.length * 3,
      "the full surface must be emitted even with an empty leg")
    val emptyLeg = rows.filter(_.getInt(0) === 1)
    assert(emptyLeg.length === 3 && emptyLeg.forall(_.isNullAt(4)),
      "the empty leg's recall must be NULL (undefined), not 0 or missing")
    assert(rows.filter(_.getInt(0) === 10).forall(!_.isNullAt(4)))
  }

  test("ivfRecallDim384: the width canary keeps the D7 contract at 384 dims") {
    val r = VectorSearch.ivfRecallDim384(t).collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(1, 2, 4))
    assert(r.forall(_.getInt(1) === 10))
    val recalls = r.map(_.getDouble(2))
    assert(recalls.forall(x => x >= 0.0 && x <= 1.0))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"probing more cells can only add candidates: ${recalls.mkString(",")}")
    assert(recalls.last > 0.0,
      "probing 4 cells must recover some exact neighbors at 384 dims")
  }
  import spark.implicits._

  test("cosineSim: parallel vectors 1, orthogonal 0, zero-norm guard 0") {
    val df = Seq(
      (Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
    val r = df.select(cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(r(0) - 1.0) < 1e-12)
    assert(r(1) === 0.0)
    assert(r(2) === 0.0)
  }

  test("l2Norm^2 equals dotProduct with self") {
    val rows = t.embeddings.limit(50)
      .select(l2Norm(col("embedding")).as("n"),
        dotProduct(col("embedding"), col("embedding")).as("d"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) * r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("searchBruteforce: sorted desc, thresholded, bounded, no self-match") {
    val rows = VectorSearch.searchBruteforce(t).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ >= 0.1))
    assert(rows.forall(_.getLong(0) != 0L))
  }

  test("searchFiltered only scores the filtered labels") {
    val rows = VectorSearch.searchFiltered(t).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(1, 2, 3).contains(r.getInt(1))))
  }

  test("knnJoin: at most 3 ranked neighbors per query, corpus-side only") {
    val rows = VectorSearch.knnJoin(t).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { g =>
      assert(g.length <= 3)
      assert(g.map(_.getLong(3)).sorted.toSeq === (1L to g.length))
    }
    assert(rows.forall(_.getLong(1) >= 5L))
  }

  test("annIvf probes at most 2 cells and its hits appear in brute force order") {
    val rows = VectorSearch.annIvf(t).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getInt(1)).distinct.length <= 2)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("vectorNorms: one row per vector, positive norms") {
    val df = VectorSearch.vectorNorms(t)
    assert(df.count() === t.embeddings.count())
    assert(df.filter(col("norm") <= 0).count() === 0)
  }

  test("searchRerank: candidates come from the IVF probe, blend is exact micro-units") {
    val rows = VectorSearch.searchRerank(t).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length === ids.length && !ids.contains(0L))
    // stage-1 containment: every reranked hit is an IVF candidate
    val cand = graft.operators.EmbeddingStore
      .searchIvf(spark, graft.operators.EmbeddingStore.ensureIndex(t), 0L, 50, 2)
      .collect().map(_.getLong(0)).toSet
    assert(ids.forall(cand))
    // ordered by the blended micro-unit score, which is at least the
    // cosine part (lexical >= 0) and exactly score_mu + lex_mu
    val mus = rows.map(_.getLong(3))
    assert(mus.zip(mus.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (score, lex, mu) = (r.getDouble(1), r.getDouble(2), r.getLong(3))
      assert(mu >= math.round(score * 1e6))
      assert(lex >= 0.0 && lex <= 1.0)
      assert(math.abs(mu - (math.round(score * 1e6) + math.round(lex * 1e6))) <= 1)
    }
    // pin the lexical rule itself: recompute the top hit's Jaccard
    // from the raw texts with an independent tokenization
    def wordsOf(id: Long): Set[String] = t.documents
      .filter(col("doc_id") === id).select("text").first().getString(0)
      .toLowerCase.replaceAll("^ +| +$", "").split("\\s+", -1).toSet
    val wq = wordsOf(0L)
    val w1 = wordsOf(rows.head.getLong(0))
    val expected = (w1 & wq).size.toDouble / (w1 | wq).size.toDouble
    assert(math.abs(rows.head.getDouble(2) - expected) < 1e-6)
  }

  test("knnGraph: ranked same-cell neighbors, brute-force agreement per cell") {
    val rows = VectorSearch.knnGraph(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // per-vector: ranks contiguous from 1, scores non-increasing
    rows.groupBy(_._1).foreach { case (v, ns) =>
      val sorted = ns.sortBy(_._3)
      assert(sorted.map(_._3) === (1L to sorted.length).toSeq, s"ranks of $v")
      assert(sorted.length <= 3)
      val scores = sorted.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"scores of $v")
      assert(!ns.exists(_._2 == v), s"$v is its own neighbor")
    }
    // brute-force agreement: recompute the full graph from the same
    // assignment with independent JVM math
    val emb = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val assigned = graft.operators.EmbeddingStore
      .assignCells(emb, graft.operators.EmbeddingStore.seedCentroids(emb))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = assigned.toSeq.groupBy(_._3).values.toSeq.flatMap { cell =>
      cell.flatMap { case (v, va, _) =>
        cell.filter(_._1 != v)
          .map { case (n, nb, _) => (v, n, cos(va, nb)) }
          .sortBy(x => (-x._3, x._2)).take(3).zipWithIndex
          .map { case ((_, n, s), i) => (v, n, (i + 1).toLong, s) }
      }
    }.toSet
    assert(rows.toSet === expected)
  }

  test("plan: brute-force scoring stays in whole-stage codegen, queries broadcast") {
    val df = VectorSearch.searchBruteforce(t)
    df.collect() // materialize so AQE finalizes the plan (codegen spans visible)
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark whole-stage-codegen spans in the plan string;
    // the scoring Project/Join must carry one.
    assert(plan.contains("*(2) Project") || plan.contains("WholeStageCodegen"))
    assert(plan.contains("cosine_sim"))
    assert(plan.contains("Broadcast"))
    // corpus scan must push the vec_id filter down
    assert(plan.contains("PushedFilters"))
    // top-k must be TakeOrderedAndProject, not a global Sort+Exchange
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("searchBm25: reconciles against an independent plain-Scala Okapi " +
    "model on a synthetic corpus") {
    import spark.implicits._
    val qterms = Seq("apple", "banana", "cherry", "date")
    // 15 corpus docs with varying term overlap and lengths (so idf,
    // tf saturation and length normalization all vary), deterministic
    val docs = (0L, "s", qterms.mkString(" ")) +: (1L to 15L).map { id =>
      val hits = qterms.take((id % 5).toInt) ++
        Seq.fill((id % 3).toInt)("apple")
      val filler = (1L to (id % 7) + 2).map(j => s"filler${id}_$j")
      (id, "s", (hits ++ filler).mkString(" "))
    }
    // independent model, same definitions in plain Scala
    val toks = docs.tail.map { case (id, _, tx) =>
      id -> tx.toLowerCase.trim.split("\\s+").toSeq
    }
    val n = toks.size.toDouble
    val allToks = toks.map(_._2.size.toLong).sum.toDouble
    val dl = toks.map { case (id, ws) => id -> ws.size.toLong }.toMap
    val tf = toks.flatMap { case (id, ws) =>
      ws.filter(qterms.contains).groupBy(identity)
        .map { case (w, g) => (id, w, g.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val perDoc = tf.groupBy(_._1).map { case (id, rows) =>
      val mus = rows.map { case (_, w, f) =>
        val idf = math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0)
        val norm = (f * 2.2) /
          (f + 1.2 * (1.0 - 0.75 + 0.75 * dl(id) * n / allToks))
        BigDecimal(idf * norm * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      id -> ((rows.size.toLong, mus.sum))
    }
    val expected = perDoc.toSeq
      .sortBy { case (id, (_, mu)) => (-mu, id) }.take(10)
      .map { case (id, (nt, mu)) =>
        id -> ((nt, BigDecimal(mu.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toFile
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = VectorSearch.searchBm25(Tables(spark, dir.getAbsolutePath))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expected)
  }

  test("semanticClusters: equals an independent union-find over the " +
    "thresholded knn-graph edges, labels are component minima") {
    val edges = VectorSearch.knnGraph(t).collect()
      .filter(_.getDouble(3) >= graft.operators.VectorSearch.semanticClusterThreshold)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "corpus produced no qualifying edges — lower tau")
    // independent union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    val got = VectorSearch.semanticClusters(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // path-compressed roots ARE the component minima by construction
    // of the union rule above; double-check one invariant directly
    got.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"label $cid is not the min member")
    }
  }

  test("searchMmr: equals an independent plain-Scala greedy MMR " +
    "(6dp micro-unit scores, lowest-id ties) and actually diversifies") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    val vecs = t.embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qv = vecs(0L)
    val relU = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> math.round(r6(cos(v, qv)) * 1e6) }
    val pool = relU.sortBy { case (id, ru) => (-ru, id) }
      .take(VectorSearch.mmrCandidates)
    val poolIds = pool.map(_._1)
    val simU = (for {
      a <- poolIds; b <- poolIds if a != b
    } yield (a, b) -> math.round(r6(cos(vecs(a), vecs(b))) * 1e6)).toMap
    val lam = VectorSearch.mmrLambdaNum
    var sel = Vector(pool.head._1 -> lam * pool.head._2)
    while (sel.size < VectorSearch.mmrK) {
      val chosen = sel.map(_._1).toSet
      val next = pool.filterNot(p => chosen(p._1))
        .map { case (id, ru) =>
          val pen = sel.map(s => simU((id, s._1))).max
          id -> (lam * ru - (10L - lam) * pen)
        }
        .minBy { case (id, mu) => (-mu, id) }
      sel = sel :+ next
    }
    val expected = sel.zipWithIndex.map { case ((id, mu), i) =>
      (i + 1) -> ((id, r6(mu.toDouble / 1e7)))
    }.toMap
    val got = VectorSearch.searchMmr(t).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got === expected)
    // diversification bites: the MMR picks are NOT just the top-k by
    // pure relevance on this corpus
    val topK = pool.take(VectorSearch.mmrK).map(_._1).toSet
    assert(got.values.map(_._1).toSet !== topK,
      "MMR degenerated to the pure-relevance top-k — nothing was penalized")
  }

  test("searchMmr pool contract: the pool is bounded at mmrCandidates " +
    "BEFORE anything pairwise (the stage PlanShapeSpec cannot see — " +
    "it materializes inside localCheckpoint)") {
    val (cand, pairs) = VectorSearch.mmrPool(t)
    val n = cand.count()
    assert(n === VectorSearch.mmrCandidates.toLong,
      s"pool is $n rows — the TakeOrdered bound was dropped")
    assert(pairs.count() === n * (n - 1),
      "pairwise stage is not exactly pool-squared-minus-diagonal")
  }

  test("searchHybrid: rrf is the exact two-term formula of the emitted " +
    "ranks, every hit comes from a leg, output sorted by fused score") {
    val rows = VectorSearch.searchHybrid(t).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (sr, lr, rrf) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(sr > 0 || lr > 0, "a fused hit must appear in >=1 leg")
      assert(sr >= 0 && sr <= 50 && lr >= 0 && lr <= 50)
      val exp = (if (sr > 0) 1.0 / (sr + 60) else 0.0) +
        (if (lr > 0) 1.0 / (lr + 60) else 0.0)
      assert(math.abs(rrf - BigDecimal(exp)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    val fused = rows.map(_.getDouble(3))
    assert(fused.sameElements(fused.sortBy(-_)), "sorted by rrf desc")
    // a doc leading BOTH legs must lead the fusion
    val both = rows.filter(r => r.getLong(1) === 1L && r.getLong(2) === 1L)
    if (both.nonEmpty) assert(both.head.getLong(0) === rows.head.getLong(0))
  }

  test("knnClassify: equals an independent majority vote over the engine's " +
    "edges, and a label-separable corpus propagates at accuracy 1.0") {
    import spark.implicits._
    def replicate(edges: Seq[(Long, Long)], labels: Map[Long, Int])
        : Map[Int, (Long, Long, Double)] = {
      val pred = edges.groupBy(_._1).map { case (v, es) =>
        val votes = es.map(e => labels(e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      pred.toSeq.groupBy(p => labels(p._1)).map { case (l, ps) =>
        val correct = ps.count { case (v, pr) => pr == labels(v) }.toLong
        l -> ((ps.size.toLong, correct, r6(correct.toDouble / ps.size)))
      }
    }
    val labels = t.embeddings.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = VectorSearch.knnGraph(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = VectorSearch.knnClassify(t).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === replicate(edges, labels))
    // separable planted corpus: 3 clusters, one axis each — every
    // neighbor shares the label, so propagation is perfect
    val dim = 8
    val planted = (0 until 30).map { i =>
      val l = i % 3
      val v = Array.fill(dim)(0.01f * (i % 7))
      v(l) = 10f
      (i.toLong, v.toSeq, l)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-knncls").toFile
    planted.toDF("vec_id", "embedding", "label").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    val p = VectorSearch.knnClassify(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(p.keySet === Set(0, 1, 2))
    assert(p.values.forall(_ === 1.0), s"separable corpus not perfect: $p")
  }

  test("pagerankOn: hand-computed star graph ranks exactly, and the corpus " +
    "row equals an independent plain-Scala power iteration") {
    import spark.implicits._
    // star: 1,2,3 -> 0 and 0 -> 1; three iterations by hand
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("vec_id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val star = VectorSearch.pagerankOn(nodes, edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(star === Map(
      0L -> ((2483250L, 3L)), 1L -> ((1216750L, 1L)),
      2L -> ((150000L, 0L)), 3L -> ((150000L, 0L))))
    // independent integer power iteration over the engine's own edges
    def replicate(ns: Seq[Long], es: Seq[(Long, Long)], iters: Int)
        : Map[Long, (Long, Long)] = {
      val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = ns.map(_ -> 1000000L).toMap
      (1 to iters).foreach { _ =>
        val in = es.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
          r(s) * 85 / (100 * outdeg(s)) }.sum).toMap
        r = ns.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
      }
      val inDeg = es.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      ns.map(n => n -> ((r(n), inDeg.getOrElse(n, 0L)))).toMap
    }
    val corpusEdges = VectorSearch.knnGraph(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val corpusNodes = t.embeddings.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSeq
    val expected = replicate(corpusNodes, corpusEdges, 3).toSeq
      .sortBy(p => (-p._2._1, p._1)).take(20)
      .map { case (v, (ru, d)) => (v, ru, d) }
    val got = VectorSearch.graphPagerank(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("truncateRecall: one row per width, recall in [0,1], and the " +
    "full-width anchor is exactly 1 (the evaluator's self-check)") {
    val rows = VectorSearch.truncateRecall(t).collect()
    assert(rows.map(_.getInt(0)).toSeq === VectorSearch.truncateDims)
    rows.foreach { r =>
      assert(r.getInt(1) === 10)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // truncating to the full width is the identity ranking — recall
    // below 1 here means the evaluator itself is broken, not the
    // embedding
    assert(rows.last.getDouble(2) === 1.0)
    // the narrowest prefix must lose SOMETHING on a non-Matryoshka
    // hash embedding, or the curve measures nothing
    assert(rows.head.getDouble(2) < 1.0)
  }
}
