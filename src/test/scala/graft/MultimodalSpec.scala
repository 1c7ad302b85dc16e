package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  /** Non-ASCII corpus for the byte-semantics parity tests: multi-byte
    * UTF-8 (2-, 3- and 4-byte sequences) positioned to STRADDLE the
    * 64-byte chunk and 16-byte frame boundaries, so a char-indexed
    * slicer would produce different chunks than the byte-indexed
    * contract. (The shipped driver corpora are ASCII — these paths
    * were byte-correct by construction but never PROVEN past ASCII;
    * ground truth below is computed independently over
    * `getBytes(UTF_8)` + MessageDigest, no Spark involved.) */
  private lazy val unicodeDocs: Seq[(Long, String)] = Seq(
    0L -> "query doc héllo 群聊 🎉 with ünïcode content",
    1L -> "plain ascii text only",
    2L -> ("a" * 63 + "é" + "b" * 40), // 2-byte char split at byte 63/64
    3L -> ("x" * 62 + "群聊" + "y" * 70), // 3-byte chars at the boundary
    4L -> ("z" * 61 + "🎉🎊" + "w" * 80), // 4-byte chars (surrogate pairs in UTF-16)
    5L -> "héllo ☕ wörld — 群聊 🎉 café naïve",
    6L -> ("群" * 100), // 300 bytes of pure 3-byte chars, several chunks
    7L -> ("mixed 🎉" + "é" * 50 + " tail " + "☕" * 30),
    8L -> "é") // single 2-byte char: payload shorter than one frame

  private lazy val unicodeTable: Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nonascii")
    import spark.implicits._
    unicodeDocs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("xx").as("lang"),
        lit("src_1").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir.toString)
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")
  private def slice(b: Array[Byte], off: Long, len: Int): Array[Byte] =
    b.slice(off.toInt, math.min(off.toInt + len, b.length))

  test("non-ASCII: mediaChunks slices BYTES, straddled chars split mid-sequence") {
    val got = Multimodal.mediaChunks(unicodeTable).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    val want = unicodeDocs.flatMap { case (id, text) =>
      val b = utf8(text)
      (0 until math.ceil(b.length / 64.0).toInt).map { i =>
        (id, i.toLong) ->
          (math.min(64L, b.length - i * 64L), md5hex(slice(b, i * 64L, 64)))
      }
    }.toMap
    assert(got === want)
    // the boundary really split a multi-byte char: doc 2's first chunk
    // ends in é's LEAD byte (0xc3), so its md5 differs from the md5 of
    // any char-aligned 63- or 64-char prefix — byte semantics, proven
    val char63 = md5hex(utf8(("a" * 63)))
    val char64 = md5hex(utf8(("a" * 63 + "é")))
    assert(got((2L, 0L))._2 !== char63)
    assert(got((2L, 0L))._2 !== char64)
  }

  test("non-ASCII: frameSample byte frames match independent ground truth") {
    val got = Multimodal.frameSample(unicodeTable).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val want = unicodeDocs.flatMap { case (id, text) =>
      val b = utf8(text)
      val nFrames = b.length / 16
      if (b.length < 16) None
      else {
        val sampled = (0 until nFrames by 4)
          .map(fi => md5hex(slice(b, fi * 16L, 16)))
        Some(id -> (nFrames.toLong, sampled.length.toLong, sampled.min))
      }
    }.toMap
    assert(got === want)
  }

  test("non-ASCII: mediaResize stride fold over bytes matches ground truth") {
    val got = Multimodal.mediaResize(unicodeTable).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6), r.getString(7)))
      .toMap
    val want = unicodeDocs.map { case (id, text) =>
      val b = utf8(text)
      val nb = b.length.toLong
      val (w, h) = (nb % 640, (nb * 7) % 480)
      val stride = math.max(1L, math.ceil(math.max(w, h) / 224.0).toLong)
      val nblocks = math.ceil(nb / 16.0).toLong
      val kept = math.min((nblocks - 1) / stride + 1, 134217725L / stride + 1)
      val rp = (0L until kept).toArray
        .flatMap(i => slice(b, i * stride * 16, 16))
      id -> (w, h, stride, rp.length.toLong, md5hex(rp))
    }.toMap
    assert(got === want)
  }

  test("non-ASCII: textChunks slices CODE POINTS (vs byte slicing above)") {
    val got = graft.operators.TextAnalysis.textChunks(unicodeTable).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    val want = unicodeDocs.flatMap { case (id, text) =>
      val n = text.codePointCount(0, text.length)
      val lastStart = (math.ceil(n / 192.0).toLong - 1) * 192
      (0L to lastStart by 192L).map { start =>
        val a = text.offsetByCodePoints(0, start.toInt)
        val b = text.offsetByCodePoints(0, math.min(start + 256, n).toInt)
        (id, start) -> (text.substring(a, b), math.min(256L, n - start))
      }
    }.toMap
    assert(got === want)
  }

  test("non-ASCII: mediaEmbedding vote pipeline tracks the byte chunks") {
    val got = Multimodal.mediaEmbedding(unicodeTable).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // independent replay: byte chunks → md5 hex → positional 2-hex
    // bucket % 32, 3rd-hex sign votes → cosine vs doc 0's votes,
    // HALF_UP 6dp, (score desc, id) top-10 excluding the query doc
    def votes(text: String): Map[Int, Double] = {
      val b = utf8(text)
      (0 until math.ceil(b.length / 64.0).toInt)
        .map(i => md5hex(slice(b, i * 64L, 64)))
        .groupBy(h => Integer.parseInt(h.substring(0, 2), 16) % 32)
        .map { case (bk, hs) =>
          bk -> hs.map(h => if (h(2) <= '7') 1.0 else -1.0).sum }
        .filter(_._2 != 0.0) // cancelled buckets drop out of the agg? no —
      // Spark keeps zero-sum buckets as rows; they contribute 0 to dot
      // and norm alike, so keeping or dropping them is score-identical
    }
    val q = votes(unicodeDocs.head._2)
    val qn = math.sqrt(q.values.map(v => v * v).sum)
    val want = unicodeDocs.tail.map { case (id, text) =>
      val v = votes(text)
      val dot = v.map { case (b, x) => x * q.getOrElse(b, 0.0) }.sum
      val nrm = math.sqrt(v.values.map(x => x * x).sum)
      val s = if (nrm * qn == 0) 0.0 else dot / (nrm * qn)
      (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got === want)
  }

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

  /** Plain-Scala aHash replication: 64 strided code-point samples,
    * integer cross-multiply mean bits (bit 63 wraps like the
    * engine's Long weights). */
  private def aHash(text: String): Long = {
    val nS = 64
    val n = text.length.toLong
    val v = (0 until nS).map(b => text.charAt((n * b / nS).toInt).toLong)
    val tot = v.sum
    (0 until nS).map(b => if (v(b) * nS > tot) 1L << b else 0L).sum
  }

  test("mediaPhash: fingerprint and band-audit match an independent " +
    "plain-Scala replication on the sf corpus") {
    val docs = t.documents.select(col("doc_id"), col("text")).collect()
      .flatMap(r => Option(r.getString(1)).map(r.getLong(0) -> _))
      .filter(_._2.length >= 64)
    val fp = docs.map { case (id, tx) => id -> aHash(tx) }.toMap
    // band candidates: any shared 16-bit band (bucket occupancy far
    // under the cap at this size)
    def bandsOf(f: Long): Seq[Long] =
      (0 until 4).map(b => (b.toLong << 32) | ((f >>> (16 * b)) & 0xffffL))
    val byBand = fp.toSeq.flatMap { case (id, f) => bandsOf(f).map(_ -> id) }
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val candPairs = byBand.flatMap(ids =>
      for { i <- ids.indices; j <- (i + 1) until ids.length }
        yield (ids(i), ids(j))).toSet
    val expected = fp.map { case (id, f) =>
      val mates = candPairs.collect {
        case (a, b) if a == id => b
        case (a, b) if b == id => a
      }
      val nd = mates.count(m =>
        java.lang.Long.bitCount(f ^ fp(m)) <= 3).toLong
      id -> ((f, mates.size.toLong, nd))
    }
    val got = Multimodal.mediaPhash(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    assert(got.nonEmpty && got.values.exists(_._2 > 0),
      "no band candidates anywhere — the audit is vacuous")
  }

  test("mediaPhash: a planted near-identical payload pairs at Hamming <= 3, " +
    "a heavy edit stays a band candidate but never a dupe") {
    import spark.implicits._
    // n = 256 ⇒ sample b reads position 4b, so the 64 sample values
    // are controlled directly; background bytes are never sampled.
    // The mean test only sees the samples: 'z' (122) vs 'a' (97)
    // around mean 109.5 keeps every bit far from the boundary.
    val n = 256
    def payloadOf(high: Int => Boolean): String =
      (0 until n).map(i =>
        if (i % 4 == 0 && high(i / 4)) 'z' else 'a').mkString
    val base = payloadOf(b => b % 2 == 0)          // bits: evens set
    val near = payloadOf(b => b % 2 == 0 && b != 0) // exactly bit 0 flips
    // invert samples 16..55: 40 bits flip (bands 1-3 all dirty),
    // band 0 (bits 0-15) intact — a candidate that fails the verify
    val heavy = payloadOf(b =>
      if (b >= 16 && b < 56) b % 2 != 0 else b % 2 == 0)
    val docs = Seq((0L, base), (1L, near), (2L, heavy)).toDF("doc_id", "text")
    val got = Multimodal.mediaPhashDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val h01 = java.lang.Long.bitCount(got(0L)._1 ^ got(1L)._1)
    val h02 = java.lang.Long.bitCount(got(0L)._1 ^ got(2L)._1)
    assert(h01 === 1, s"planted near-dup drifted to hamming $h01")
    assert(h02 === 40, s"planted heavy edit drifted to hamming $h02")
    // base sees both mates; only the near one verifies as a dupe
    assert(got(0L) === ((got(0L)._1, 2L, 1L)))
    assert(got(1L)._2 === 1L && got(1L)._3 === 1L)
    assert(got(2L)._2 === 1L && got(2L)._3 === 0L)
  }

  test("frameDedup: a planted still scene collapses under keep-first, " +
    "Hamming-3 frames count as dups, Hamming-4 and distinct frames stay " +
    "unique") {
    import spark.implicits._
    // place 16-char frames at the sampled byte offsets (t * 64); fill
    // the gaps with a position-varying pattern so only the planted
    // frames can match
    def mk(frames: Seq[String], len: Int): String = {
      val a = Array.tabulate(len)(p => ('a' + (p * 7 % 26)).toChar)
      frames.zipWithIndex.foreach { case (f, t) =>
        f.zipWithIndex.foreach { case (c, k) => a(t * 64 + k) = c }
      }
      new String(a)
    }
    val f0 = "ABCDEFGHIJKLMNOP"
    val ham3 = "XYZDEFGHIJKLMNOP"  // 3 chars off f0
    val ham4 = "XYZWEFGHIJKLMNOP"  // 4 chars off f0 (3 off ham3)
    val other = "0123456789abcdef"
    val docs = Seq(
      // 5 identical sampled frames -> C(5,2) dup pairs, 1 unique
      (0L, mk(Seq.fill(5)(f0), 272)),
      // f0 then a Hamming-3 mate -> 1 dup pair, 1 unique
      (1L, mk(Seq(f0, ham3), 80)),
      // f0 then a Hamming-4 frame -> no dup, 2 unique
      (2L, mk(Seq(f0, ham4), 80)),
      // two unrelated frames -> no dup, 2 unique
      (3L, mk(Seq(f0, other), 80))
    ).toDF("doc_id", "text")
    val got = Multimodal.frameDedupDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) === ((5L, 10L, 1L)))
    assert(got(1L) === ((2L, 1L, 1L)))
    assert(got(2L) === ((2L, 0L, 2L)))
    assert(got(3L) === ((2L, 0L, 2L)))
  }
}
