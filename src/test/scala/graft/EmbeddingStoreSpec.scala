package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, EmbeddingStore}
import graft.sources.Tables

class EmbeddingStoreSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)
  import spark.implicits._

  test("extractText matches the reference's content handling") {
    val cases: Seq[(String, Integer)] = Seq(
      ("""{"text": "hello there"}""", Integer.valueOf(1)),
      ("""[{"text": "a"}, {"k": 1}, {"text": "b"}]""", Integer.valueOf(1)),
      ("plain not-json content", Integer.valueOf(1)),
      ("""[{"k": 1}]""", Integer.valueOf(1)),
      ("""{"gn": "group name"}""", Integer.valueOf(1)),
      ("\n\t [{\"text\": \"ws\"}]", Integer.valueOf(1)), // JSON ws before the list
      ("""{"text": "kept raw"}""", Integer.valueOf(2)), // non-type-1: no extraction
      ("""{"text": "null type"}""", null)) // null type = not a text message
    val out = cases.toDF("content", "mt")
      .select(TextFunctions.extractText(col("content"), col("mt")))
      .as[String].collect()
    assert(out(0) === "hello there")
    assert(out(1) === "a b")
    assert(out(2) === "plain not-json content")
    assert(out(3) === "")
    assert(out(4) === """{"gn": "group name"}""")
    assert(out(5) === "ws")
    assert(out(6) === """{"text": "kept raw"}""")
    assert(out(7) === """{"text": "null type"}""")
  }

  test("embed: unit-norm vectors of the right shape, deterministic") {
    val v = EmbeddingStore.embed(t.documents)
    assert(v.count() === t.documents.count())
    val r = v.select(col("doc_id"), size(col("embedding")).as("d"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("n")).collect()
    r.foreach { row =>
      assert(row.getInt(1) === EmbeddingStore.dim)
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-5)
    }
    // deterministic: re-embedding yields identical vectors
    val twice = EmbeddingStore.embed(t.documents)
    assert(v.except(twice).count() === 0)
  }

  test("reference dimensionality: 384-dim embed/store/search matches brute force") {
    // the reference embeds at 384 dims (all-MiniLM-L6-v2,
    // processor.py:174); everything downstream of embed is
    // width-agnostic, so the SAME pipeline must hold at 384 as at the
    // synthetic corpora's 64
    val d = 384
    val v = EmbeddingStore.embed(t.documents, d)
    val r = v.select(col("doc_id"), size(col("embedding")).as("d"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("n")).collect()
    assert(r.length === t.documents.count())
    r.foreach { row =>
      assert(row.getInt(1) === d)
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-5)
    }
    // the hashing actually uses the extra width: a dim-invariant bug
    // (e.g. a hardcoded % 64) would never populate a bucket past 63
    val usedBuckets = v
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .filter(col("x") =!= 0.0f)
      .agg(max(col("i"))).first().getInt(0)
    assert(usedBuckets >= 64, s"highest populated bucket $usedBuckets — width unused")

    val dir = Files.createTempDirectory("graft-store-384").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    EmbeddingStore.store(v, path)

    // near-dup pair still embeds near-parallel at 384
    val pair = Dedup.dedupMinhash(t).first()
    val (a, b) = (pair.getLong(0), pair.getLong(1))
    val hits = EmbeddingStore.search(spark, path, a, 3).collect()
    assert(hits.map(_.getLong(0)).contains(b),
      s"doc $b should be a top-3 neighbor of its near-dup $a at 384 dims")

    // independent ground truth: plain-Scala cosine over the collected
    // store, same 6dp HALF_UP rounding and (score desc, id asc) order
    val all = spark.read.parquet(path).select("doc_id", "embedding")
      .collect().map(row => row.getLong(0) -> row.getSeq[Float](1).toArray)
    val qv = all.toMap.apply(a)
    def cos6(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i); i += 1
      }
      val c = if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = all.filter(_._1 != a)
      .map { case (id, vec) => (id, cos6(vec, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(3).toSeq
    assert(hits.map(h => (h.getLong(0), h.getDouble(1))).toSeq === expected)
  }

  test("store + incremental update + search: near-dup docs are nearest neighbors") {
    val dir = Files.createTempDirectory("graft-store").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val maxId = t.documents.agg(max("doc_id")).first().getLong(0)
    val watermark = maxId / 2
    // initial build: first half; incremental append: the rest
    EmbeddingStore.store(
      EmbeddingStore.embed(t.documents.filter(col("doc_id") <= watermark)), path)
    val stats = EmbeddingStore.updateSince(t, path, watermark)
    // the update reports the reference's result contract: processed
    // count, advanced watermark, wall time
    assert(stats.processed ===
      t.documents.filter(col("doc_id") > watermark).count())
    assert(stats.newWatermark === maxId)
    assert(stats.durationSec > 0.0)
    val stored = spark.read.parquet(path)
    assert(stored.count() === t.documents.count())
    assert(stored.select("doc_id").distinct().count() === t.documents.count())
    // zero-delta update: nothing processed, watermark holds, no append
    val noop = EmbeddingStore.updateSince(t, path, stats.newWatermark)
    assert(noop.processed === 0L && noop.newWatermark === maxId)
    assert(spark.read.parquet(path).count() === t.documents.count())

    // ground truth from the dedup family: a verified near-dup pair must
    // embed to near-parallel vectors and find each other
    val pair = Dedup.dedupMinhash(t).first()
    val (a, b) = (pair.getLong(0), pair.getLong(1))
    val hits = EmbeddingStore.search(spark, path, a, 3).collect()
    assert(hits.map(_.getLong(0)).contains(b),
      s"doc $b should be a top-3 neighbor of its near-dup $a")
    assert(hits.head.getDouble(1) > 0.9)
  }

  test("updateSince(maxDocs): bounded batches walk the backlog in order") {
    val dir = Files.createTempDirectory("graft-bounded").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val n = t.documents.count()
    val batch = (n / 3).toInt + 1
    // three bounded calls drain the whole corpus from watermark -1
    var wm = -1L
    var totalProcessed = 0L
    var lastWm = -1L
    for (_ <- 0 until 3) {
      val s = EmbeddingStore.updateSince(t, path, wm, Some(batch))
      assert(s.processed <= batch, "a bounded call must never exceed maxDocs")
      assert(s.newWatermark > lastWm || s.processed == 0)
      totalProcessed += s.processed
      lastWm = s.newWatermark
      wm = s.newWatermark
    }
    assert(totalProcessed === n, "three batches of ceil(n/3) must drain the corpus")
    assert(spark.read.parquet(path).select("doc_id").distinct().count() === n,
      "in-order bounded batches append each doc exactly once")
    // a fourth call finds nothing
    assert(EmbeddingStore.updateSince(t, path, wm, Some(batch)).processed === 0L)
  }

  test("coverage: counts the store against the corpus, 0 for a missing store") {
    val dir = Files.createTempDirectory("graft-cov").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/store"
    val n = t.documents.count()
    val empty = EmbeddingStore.coverage(t, path)
    assert(empty === graft.operators.CoverageStats(n, 0L, 0.0))
    val half = t.documents.agg(max("doc_id")).first().getLong(0) / 2
    EmbeddingStore.store(
      EmbeddingStore.embed(t.documents.filter(col("doc_id") <= half)), path)
    val cov = EmbeddingStore.coverage(t, path)
    assert(cov.total === n)
    assert(cov.embedded === t.documents.filter(col("doc_id") <= half).count())
    assert(cov.coveragePct === math.round(cov.embedded * 1000.0 / n) / 10.0)
  }

  test("searchWithRefresh: cooldown skips, threshold gates, results stable on unchanged corpus") {
    import graft.operators.{RefreshPolicy, SearchState}
    val dir = Files.createTempDirectory("graft-swr").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/store"
    val policy = RefreshPolicy(cooldownSec = 60, longCooldownSec = 300,
      startupWindowSec = 600, updateThreshold = 10, maxDocsPerUpdate = 100000)
    val t0 = 1000000L // fake epoch clock — the policy is a pure function of it
    val s0 = SearchState(watermark = -1L, serverStartEpochSec = t0)
    val queryId = t.documents.agg(min("doc_id")).first().getLong(0)

    // first search: never updated, store lags the whole corpus past the
    // (tripled) threshold -> refresh runs, bounded, watermark advances
    val (r1, s1, u1) = EmbeddingStore.searchWithRefresh(
      t, path, queryId, 5, s0, policy, nowEpochSec = t0)
    assert(u1.isDefined, "cold store must trigger the refresh")
    assert(s1.watermark === t.documents.agg(max("doc_id")).first().getLong(0))
    assert(s1.lastUpdateEpochSec === t0 && s1.searchCount === 1)
    val hits1 = r1.collect()

    // second search 30s later: inside the 60s startup cooldown -> no
    // update attempt even though the clock moved
    val (r2, s2, u2) = EmbeddingStore.searchWithRefresh(
      t, path, queryId, 5, s1, policy, nowEpochSec = t0 + 30)
    assert(u2.isEmpty, "cooldown must skip the refresh")
    assert(s2.lastUpdateEpochSec === t0, "skip leaves the update clock alone")

    // third search past the cooldown: store is CURRENT (lag 0 <= threshold)
    // -> checked but not refreshed; results identical to the first search
    val (r3, s3, u3) = EmbeddingStore.searchWithRefresh(
      t, path, queryId, 5, s2, policy, nowEpochSec = t0 + 120)
    assert(u3.isEmpty, "an up-to-date store must not re-embed")
    assert(s3.watermark === s1.watermark)
    assert(r3.collect() === hits1,
      "search results must be identical before/after a no-op refresh cycle")
    assert(r2.collect() === hits1)

    // past the startup window the LONG cooldown applies: 200s after the
    // last update would have passed the short cooldown but not the long
    val lateState = s3.copy(lastUpdateEpochSec = t0 + 10000)
    val (_, _, u4) = EmbeddingStore.searchWithRefresh(
      t, path, queryId, 5, lateState, policy, nowEpochSec = t0 + 10200)
    assert(u4.isEmpty, "long cooldown applies outside the startup window")

    // force bypasses every check, like the reference's force_update
    val (_, s5, u5) = EmbeddingStore.searchWithRefresh(
      t, path, queryId, 5, s3, policy, nowEpochSec = t0 + 121, force = true)
    assert(u5.isDefined && u5.get.processed === 0L,
      "forced refresh runs but an unchanged corpus yields a zero delta")
    assert(s5.watermark === s3.watermark)
    // the reference's update_embeddings early-returns on a zero delta
    // WITHOUT touching last_embedding_update_time (engine.py:78) — a
    // no-op refresh must not start a cooldown that delays a real one
    assert(s5.lastUpdateEpochSec === s3.lastUpdateEpochSec,
      "a zero-doc update must not advance the update clock")
  }

  test("searchText: a query equal to a stored doc's text ranks that doc first at ~1") {
    val t = graft.sources.Tables(spark, sfDir)
    val docText = t.documents.filter(org.apache.spark.sql.functions.col("doc_id") === 7L)
      .select("text").first().getString(0)
    val top = EmbeddingStore.searchText(t, docText, k = 3).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) === 7L,
      s"the identical-text doc must rank first, got ${top.head}")
    assert(top.head.getDouble(1) === 1.0,
      "identical text embeds to the identical vector (cosine 1 at 6dp)")
    // and the default fixed query returns a full top-10 with scores
    // in range, deterministically ordered
    val d = EmbeddingStore.searchText(t).collect()
    assert(d.length === 10)
    assert(d.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
    assert(d.map(_.getDouble(1)).toSeq === d.map(_.getDouble(1)).sortBy(-_).toSeq)
  }

  test("searchDim384: raw-vote cosine equals normalized-store cosine at the model width") {
    val out = EmbeddingStore.searchDim384(t).collect()
    assert(out.length === 10)
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
    // cosine is scale-invariant: the raw-vote scores must match a
    // search over the NORMALIZED 384-dim store vectors (float
    // rounding slack: the store path casts normalized doubles to
    // float32, the raw path keeps exact integers)
    val dir = java.nio.file.Files.createTempDirectory("graft-384cmp")
    EmbeddingStore.store(EmbeddingStore.embed(t.documents, 384), s"$dir/store")
    val viaStore = EmbeddingStore.search(spark, s"$dir/store", 0L, 10).collect()
    assert(viaStore.map(_.getLong(0)).toSeq === out.map(_.getLong(0)).toSeq)
    viaStore.zip(out).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-5) }
  }

  test("searchRefreshQuery: the fixed episode builds the lowest-450 store and reports it") {
    val out = EmbeddingStore.searchRefreshQuery(t).collect()
    val n = t.embeddings.count()
    val expectStored = math.min(n, 450L)
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getLong(2) === 4L, "four searches ran")
      assert(r.getLong(3) === math.ceil(expectStored / 150.0).toLong)
      assert(r.getLong(4) === expectStored)
    }
    // every hit comes from the slice the bounded updates appended
    val wm = out.head.getLong(5)
    assert(out.forall(_.getLong(0) <= wm))
    // scores strictly ranked, query doc excluded
    assert(out.forall(_.getLong(0) != 0L))
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("searchWithRefresh on a cold store below the threshold returns empty results") {
    import graft.operators.{RefreshPolicy, SearchState}
    val dir = Files.createTempDirectory("graft-cold").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/never-created"
    // threshold above the corpus size: lag never justifies an update,
    // so the store path is never written — the reference would set up
    // an empty vector DB and return no hits, not throw
    val policy = RefreshPolicy(updateThreshold = 1000000L)
    val t0 = 1000000L
    val (r, s, u) = EmbeddingStore.searchWithRefresh(
      t, path, 0L, 5, SearchState(-1L, t0), policy, nowEpochSec = t0 + 3600)
    assert(u.isEmpty, "lag below threshold must not trigger an update")
    assert(r.count() === 0, "a cold store yields empty results, not an error")
    assert(s.searchCount === 1)
  }

  test("corpusDrift: identical halves read zero everywhere") {
    // delta = an exact vector-copy of base under shifted ids: every
    // vector assigns by embedding alone, so occupancy shares match
    // cell-for-cell and the monitor must read NO drift
    val dir = Files.createTempDirectory("graft-drift0").toFile
    val base = (0 until 40).map(i =>
      (i.toLong, Array((1 + i % 9).toFloat, (i % 5).toFloat, (i % 3).toFloat, 0f), 0))
    val delta = base.map { case (id, v, l) => (id + 40L, v, l) }
    (base ++ delta).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    val got = EmbeddingStore.corpusDrift(Tables(spark, dir.getAbsolutePath))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"cell ${r.getInt(0)} occupancy diverged on identical halves")
      assert(r.getLong(5) === 0L && r.getDouble(6) === 0.0)
    }
  }

  test("corpusDrift: an orthogonal delta trips the monitor, and the " +
    "TVD arithmetic reconciles against a plain-Scala recompute") {
    // base vectors live in the first three axes; the delta is a
    // single direction orthogonal to every base vector, so the whole
    // delta collapses into one cell the base barely uses
    val dir = Files.createTempDirectory("graft-drift1").toFile
    val base = (0 until 40).map(i =>
      (i.toLong, Array((1 + i % 9).toFloat, (i % 5).toFloat, (i % 3).toFloat, 0f), 0))
    val delta = (0 until 40).map(i =>
      ((i + 40).toLong, Array(0f, 0f, 0f, 1f), 0))
    (base ++ delta).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    val got = EmbeddingStore.corpusDrift(Tables(spark, dir.getAbsolutePath))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))

    // conservation: every vector lands exactly once on each side
    assert(got.map(_._2).sum === 40L && got.map(_._3).sum === 40L)
    // the delta concentrates: ONE cell holds all 40 delta vectors
    assert(got.count(_._3 == 40L) === 1 && got.count(_._3 > 0L) === 1)

    // independent recompute of shares / shift / TVD from the counts
    val tb = got.map(_._2).sum.toDouble
    val td = got.map(_._3).sum.toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expMu = got.map { case (_, nb, nd, _, _, _, _) =>
      BigDecimal(math.abs(nb / tb - nd / td) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expTvd = r6(expMu.sum.toDouble / 2000000.0)
    got.zip(expMu).foreach { case ((cell, nb, nd, sb, sd, mu, tvd), em) =>
      assert(sb === r6(nb / tb) && sd === r6(nd / td), s"cell $cell shares")
      assert(mu === em, s"cell $cell shift_mu")
      assert(tvd === expTvd, s"cell $cell tvd")
    }
    // the planted shift is large: most base mass is NOT in the
    // delta's cell, so TVD must clear 0.5
    assert(expTvd > 0.5, s"planted drift read only $expTvd")
    // ordering contract: (shift_mu DESC, cell)
    val key = got.map(g => (-g._6, g._1)).toSeq
    assert(key === key.sorted)
  }
}
