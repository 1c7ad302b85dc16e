package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  test("multimodalMeta conserves docs and byte bounds are consistent") {
    val rows = Multimodal.multimodalMeta(t).collect()
    assert(rows.map(_.getLong(1)).sum === t.documents.count())
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5)) // min <= max
      assert(r.getLong(2) >= r.getLong(5)) // total >= max
      assert(r.getLong(3) >= 1L)
    }
  }

  test("stubDecode is deterministic and bounded like a real decoder") {
    val (w, h) = Multimodal.stubDecode(lit(1000L))
    val r = t.documents.limit(1).select(w.as("w"), h.as("h")).first()
    assert(r.getLong(0) === 1000L % 640 && r.getLong(1) === (1000L * 7) % 480)
  }

  test("binary payload round-trips: md5 of binary equals md5 of source text") {
    val n = t.documents
      .select(md5(col("text").cast("binary")).as("a"), md5(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n === 0)
  }

  test("mediaChunks: chunk bytes reassemble every payload exactly") {
    val perDoc = Multimodal.mediaChunks(t)
      .groupBy("doc_id")
      .agg(sum("chunk_bytes").as("total"), count(lit(1)).as("nc"),
        max("chunk_bytes").as("mx"))
      .join(t.documents.select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("nb")), "doc_id")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getLong(1) === r.getLong(4), "chunk bytes must sum to payload bytes")
      assert(r.getLong(2) === (r.getLong(4) + 63) / 64, "chunk count = ceil(nb/64)")
      assert(r.getLong(3) <= 64)
    }
  }

  test("frameSample: every 4th frame sampled, counts consistent") {
    val rows = Multimodal.frameSample(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, ns) = (r.getLong(1), r.getLong(2))
      assert(ns === (nf + 3) / 4, s"sampled ${ns} of ${nf} frames")
      assert(r.getString(3).matches("[0-9a-f]{32}"))
    }
  }

  test("mediaEmbedding: ranked cosine scores, query excluded, identical payloads score 1") {
    val rows = Multimodal.mediaEmbedding(t).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(!rows.exists(_.getLong(0) === 0L), "query doc must not rank itself")
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s >= -1.0000001 && s <= 1.0000001))
    // a doc whose payload equals the query's must score exactly 1
    // (same chunks → same votes → parallel vectors); find one if the
    // corpus has an exact duplicate of doc 0
    val q = t.documents.filter(col("doc_id") === 0)
      .select(col("text")).first().getString(0)
    val dup = t.documents
      .filter(col("doc_id") =!= 0 && col("text") === q)
      .select(col("doc_id")).collect().map(_.getLong(0))
    dup.foreach { d =>
      assert(rows.exists(r => r.getLong(0) === d && r.getDouble(1) === 1.0),
        s"exact duplicate $d of the query payload must score 1.0")
    }
  }

  /** Byte-exact mirror of the engine's resize rule. */
  private def bruteResize(text: String): (Long, Long, Long, Long, Long, Long, String) = {
    val bytes = text.getBytes("UTF-8")
    val nb = bytes.length.toLong
    val (w, h) = (nb % 640, (nb * 7) % 480)
    val stride = math.max(1L, math.ceil(math.max(w, h) / 224.0).toLong)
    val nBlocks = math.ceil(nb / 16.0).toLong
    val kept = (nBlocks - 1) / stride + 1 // test payloads are far below the Int cap
    val rp = (0L until kept).toArray.flatMap { i =>
      val off = (i * stride * 16).toInt
      bytes.slice(off, math.min(off + 16, bytes.length))
    }
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(rp).map("%02x".format(_)).mkString
    (w, h, stride, math.ceil(w.toDouble / stride).toLong,
      math.ceil(h.toDouble / stride).toLong, rp.length.toLong, md)
  }

  private def assertResizeParity(out: Map[Long, org.apache.spark.sql.Row],
      docs: Seq[(Long, String)]): Unit =
    docs.foreach { case (id, text) =>
      val (w, h, stride, nw, nh, rb, md) = bruteResize(text)
      val r = out(id)
      assert(r.getLong(1) === w && r.getLong(2) === h)
      assert(r.getLong(3) === stride)
      assert(r.getLong(4) === nw && r.getLong(5) === nh)
      assert(r.getLong(6) === rb, s"resized_bytes mismatch for doc $id")
      assert(r.getString(7) === md, s"resized_md5 mismatch for doc $id")
    }

  test("mediaResize: brute-force stride subsample parity on a sample") {
    val byId = Multimodal.mediaResize(t).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = t.documents.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).limit(50).collect()
      .map(d => (d.getLong(0), d.getString(1))).toSeq
    assert(docs.nonEmpty)
    assertResizeParity(byId, docs)
    // every non-empty doc appears exactly once, and a stride-1 doc is
    // a byte-identical pass-through
    assert(byId.size === t.documents.filter(length(col("text")) > 0).count())
    byId.values.find(_.getLong(3) === 1L).foreach { r =>
      val orig = t.documents.filter(col("doc_id") === r.getLong(0))
        .select(col("text")).first().getString(0)
      assert(r.getLong(6) === orig.getBytes("UTF-8").length.toLong)
    }
  }

  test("mediaResize: byte-exact on adversarial non-ASCII payloads") {
    // multi-byte UTF-8 makes byte length diverge from char length —
    // the property the byte-consistent refactor must hold: every
    // offset, length and hash is BYTE arithmetic on the payload
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      "a", "\u00e9", "\u2728", "\u4e2d", " ", "\n", "\u00df", "\ud83c\udfa5"))
      .map(_.mkString)
    val texts = org.scalacheck.Gen.listOfN(150, gen).sample.get
      .filter(_.nonEmpty).distinct
    val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_resize_").toString
    docs.toDF("doc_id", "text")
      .withColumn("source", lit("synthetic"))
      .withColumn("lang", lit("xx")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byId = Multimodal.mediaResize(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId.size === docs.size)
    assertResizeParity(byId, docs)
  }
}
