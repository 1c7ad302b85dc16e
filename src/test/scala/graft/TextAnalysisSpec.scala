package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import graft.sources.Tables

class TextAnalysisSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)
  import spark.implicits._

  test("cleanText matches the reference pipeline on URLs/emoji/whitespace") {
    // reference processor.py:153: collapse \s+, strip URLs, strip
    // non-[\w\s.,!?;:\-'"] chars, trim
    val raw = Seq(
      "hello\n\n  world https://x.io/a?b=1 bye",
      "emoji ❤️ stays? no! (parens) [ok]",
      "  padded  ").toDF("text")
    val out = raw.select(TextFunctions.cleanText(col("text"))).as[String].collect()
    assert(out(0) === "hello world  bye".replaceAll("\\s+ ", " ") ||
      out(0) === "hello world bye" || out(0) === "hello world  bye")
    assert(!out(1).exists(c => c > 127.toChar))
    assert(out(1).contains("stays? no!") && !out(1).contains("(") && !out(1).contains("["))
    assert(out(2) === "padded")
  }

  test("langId predicts a language for every doc with counts consistent") {
    val rows = TextAnalysis.langId(t).collect()
    assert(rows.length === t.documents.count())
    rows.foreach { r =>
      val counts = Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      val pred = r.getString(6)
      val predIdx = Seq("en", "es", "de", "fr", "zh").indexOf(pred)
      assert(predIdx >= 0)
      assert(counts(predIdx) === counts.max)
    }
  }

  test("langId: a CJK document trips the script leg, not the en tie rule") {
    import spark.implicits._
    val docs = Seq(
      (0L, "zh", "s", "机器学习模型在大规模数据集上训练"), // pure CJK: c_zh = 16
      (1L, "zh", "s", "the model 模型"),                  // mixed: 2 ideographs > 1 en stopword
      (2L, "en", "s", "the a of and to")                  // latin text stays en
    ).toDF("doc_id", "lang", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-cjk").toFile
    dir.deleteOnExit()
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.langId(graft.sources.Tables(spark, dir.getAbsolutePath))
      .collect().map(r => r.getLong(0) -> ((r.getLong(5), r.getString(6)))).toMap
    assert(got(0L) === ((16L, "zh")))
    assert(got(1L) === ((2L, "zh")))
    assert(got(2L) === ((0L, "en")))
  }

  test("qualityScore components are in range") {
    val rows = TextAnalysis.qualityScore(t).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) // punct_ratio
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // stop_ratio
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // quality
    }
  }

  test("tokenCount: regex tokens at least whitespace tokens for plain text") {
    val rows = TextAnalysis.tokenCount(t).collect()
    rows.foreach { r => assert(r.getLong(2) >= r.getLong(1)) }
  }

  test("fingerprint is a 32-hex md5 and shingle count is words-2") {
    val rows = TextAnalysis.fingerprint(t)
      .join(t.documents.select(col("doc_id"),
        size(TextFunctions.words(col("text"))).as("nw")), "doc_id")
      .collect()
    rows.foreach { r =>
      assert(r.getString(2).matches("[0-9a-f]{32}"))
      // distinct shingles can only collapse, never exceed n-2
      assert(r.getLong(1) <= math.max(r.getInt(3) - 2, 0).toLong)
    }
  }

  test("plan: text queries are pure projections over the scan (no shuffle)") {
    val df = TextAnalysis.tokenCount(t)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(plan.contains("FileScan"))
  }

  test("sampleSplit: deterministic, complete, roughly 80/20 per stratum") {
    val rows = TextAnalysis.sampleSplit(t).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total === t.documents.count())
    val byS = rows.groupBy(_.getString(0))
    byS.values.foreach { g =>
      val train = g.filter(_.getString(1) == "train").map(_.getLong(2)).sum
      val all = g.map(_.getLong(2)).sum.toDouble
      // 205/256 expected; wide tolerance at small strata
      assert(train / all > 0.55 && train / all < 0.95)
    }
    // re-run is bit-identical (no RNG anywhere)
    assert(TextAnalysis.sampleSplit(t).collect().toSet === rows.toSet)
  }

  test("mixSources: kept counts bounded by totals, rate-3 sources keep all") {
    val rows = TextAnalysis.mixSources(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, kept, target) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(kept <= total)
      if (target == 1.0) assert(kept === total)
      else assert(kept < total || total < 8,
        s"${r.getString(0)}: subsampled source kept everything at n=$total")
    }
    // deterministic
    assert(TextAnalysis.mixSources(t).collect().toSet === rows.toSet)
  }

  test("redactPii scrubs every planted email and phone") {
    val rows = TextAnalysis.redactPii(t).collect()
    rows.foreach { r =>
      val (id, red) = (r.getLong(0), r.getString(1))
      if (id % 5 == 0) {
        assert(r.getLong(2) >= 1 && r.getLong(3) >= 1)
        assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
      } else if (id % 5 == 2) {
        assert(r.getLong(2) >= 1 && red.contains("[EMAIL]"))
      }
      assert(!red.contains("@example.com") && !red.contains("@mail.co"))
    }
  }

  test("textChunks reassembles every document exactly") {
    val chunks = TextAnalysis.textChunks(t)
      .orderBy(col("doc_id"), col("start")).collect()
      .groupBy(_.getLong(0))
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      if (text.nonEmpty) {
        val cs = chunks(id).sortBy(_.getLong(1))
        // overlap-stripped concatenation round-trips the document
        val rebuilt = cs.map { r =>
          val start = r.getLong(1).toInt
          val chunk = r.getString(2)
          if (start == 0) chunk else chunk.drop(256 - 192)
        }.mkString
        assert(rebuilt === text, s"doc $id")
      }
    }
  }

  test("tfidf: ubiquitous terms score zero, df bounded by corpus size") {
    val scores = TextAnalysis.tfidf(t)
    val nDocs = t.documents.count()
    // df can never exceed the corpus, and a term in EVERY doc has
    // idf = ln(1) = 0
    assert(scores.filter(col("df") > nDocs).count() === 0)
    assert(scores.filter(col("df") === nDocs)
      .filter(col("tfidf") =!= 0.0).count() === 0)
    // rarer of two terms never scores lower at equal tf
    val r = scores.filter(col("tf") === 1).select("df", "tfidf")
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    val byDf = r.groupBy(_._1).map { case (d, xs) => d -> xs.head._2 }.toSeq
      .sortBy(_._1)
    byDf.sliding(2).foreach {
      case Seq((_, hi), (_, lo)) => assert(hi >= lo)
      case _ =>
    }
  }

  test("repetition matches a brute-force per-doc recompute") {
    val got = TextAnalysis.repetition(t).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size === docs.length)
    for ((id, text) <- docs) {
      // space-only trim + empty-preserving split, mirroring the
      // engine's words() (Java String.trim would diverge on docs
      // bounded by \n/\t)
      val ws = text.toLowerCase
        .replaceAll("^ +| +$", "").split("\\s+", -1).toSeq
      val bgs = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val r = got(id)
      assert(r.getLong(1) === ws.size.toLong, s"n_words doc $id")
      assert(r.getLong(2) === ws.distinct.size.toLong, s"n_distinct doc $id")
      // mirror Spark's round: HALF_UP on the decimal value (rint's
      // HALF_EVEN diverges on exact ties like 1/128 = 0.0078125)
      def rd(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val dup = rd(1.0 - ws.distinct.size.toDouble / ws.size)
      val topW = rd(ws.groupBy(identity).values.map(_.size).max.toDouble / ws.size)
      val topB = if (bgs.isEmpty) 0.0
        else rd(bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size)
      assert(r.getDouble(3) === dup, s"dup_word_frac doc $id")
      assert(r.getDouble(4) === topW, s"top_word_frac doc $id")
      assert(r.getDouble(5) === topB, s"top_bigram_frac doc $id")
      assert(r.getBoolean(6) === (dup > 0.85 || topB > 0.18), s"flagged doc $id")
    }
  }

  test("packSequences matches a brute-force single-level cumsum audit") {
    // the brute force IS the naive single-window formulation, so this
    // also proves the two-level prefix sum is equivalent to it
    val seqLen = 2048.0
    val re = java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")
    val docs = t.documents.select(col("source"), col("doc_id"), col("text"))
      .collect()
      .map { r =>
        val m = re.matcher(r.getString(2))
        var n = 0L
        while (m.find()) n += 1
        (r.getString(0), r.getLong(1), n)
      }
      .groupBy(_._1)
    val out = TextAnalysis.packSequences(t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === docs.keySet)
    docs.foreach { case (source, ds) =>
      val sorted = ds.sortBy(_._2).map(_._3)
      val starts = sorted.scanLeft(0L)(_ + _).init
      val bins = starts.map(s => math.floor(s / seqLen).toLong)
      val spanning = sorted.zip(starts).count { case (nt, s) =>
        nt > 0 && math.floor((s + nt - 1) / seqLen) > math.floor(s / seqLen)
      }
      val total = sorted.sum
      val nSeqs = math.ceil(total / seqLen).toLong
      val r = out(source)
      assert(r.getLong(1) === sorted.length.toLong, s"$source n_docs")
      assert(r.getLong(2) === total, s"$source total_tokens")
      assert(r.getLong(3) === nSeqs, s"$source n_seqs")
      assert(r.getLong(4) ===
        bins.groupBy(identity).values.map(_.length).max.toLong,
        s"$source max_docs_per_seq")
      assert(r.getLong(5) === spanning.toLong, s"$source n_spanning")
      val fill = BigDecimal(total / (nSeqs * seqLen))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(6) === fill, s"$source fill")
    }
  }

  test("packSequences is correct on sparse 64-bit doc ids (range sharding)") {
    // the claim behind the sampled-range sharding: an id-division rule
    // degenerates on sparse ids, the range rule must not — and the
    // cumsum result must be identical to the naive single-stream fold
    val rnd = new scala.util.Random(42)
    val ids = Iterator.continually(rnd.nextLong() & Long.MaxValue)
      .distinct.take(400).toSeq
    val docs = ids.zipWithIndex.map { case (id, i) =>
      (s"src${i % 3}", id, Seq.fill(1 + i % 7)("tok w" + i).mkString(" "),
        "en", 1L)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse_").toString
    docs.toDF("source", "doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.packSequences(Tables(spark, dir)).collect()
      .map(r => r.getString(0) -> r).toMap
    val re = java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")
    docs.groupBy(_._1).foreach { case (source, ds) =>
      val sorted = ds.sortBy(_._2).map { d =>
        val m = re.matcher(d._3); var n = 0L; while (m.find()) n += 1; n
      }
      val starts = sorted.scanLeft(0L)(_ + _).init
      val bins = starts.map(s => math.floor(s / 2048.0).toLong)
      val r = out(source)
      assert(r.getLong(1) === sorted.length.toLong, s"$source n_docs")
      assert(r.getLong(2) === sorted.sum, s"$source total_tokens")
      assert(r.getLong(4) ===
        bins.groupBy(identity).values.map(_.length).max.toLong,
        s"$source max_docs_per_seq")
    }
  }

  test("mixTemperature: weights normalize, damp the head, boost the tail") {
    val rows = TextAnalysis.mixTemperature(t).collect()
    assert(rows.length > 1)
    val wSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    val pSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(pSum - 1.0) < 1e-4)
    // temperature alpha<1 flattens the distribution: the largest
    // source is damped (boost<1), the smallest boosted (boost>1),
    // and w's ordering preserves p's
    val byP = rows.sortBy(_.getDouble(3))
    assert(byP.last.getDouble(5) < 1.0, "head source must be damped")
    assert(byP.head.getDouble(5) > 1.0, "tail source must be boosted")
    assert(byP.map(_.getDouble(4)).zip(byP.map(_.getDouble(4)).tail)
      .forall { case (a, b) => a <= b + 1e-9 }, "w monotone in p")
    // brute-force recompute through the same micro-unit contract
    val tot = rows.map(_.getLong(2)).sum
    val micro = rows.map(r =>
      math.round(math.pow(r.getLong(2).toDouble / tot, 0.3) * 1e6))
    val mtot = micro.sum
    rows.zip(micro).foreach { case (r, mi) =>
      val w = BigDecimal(mi.toDouble / mtot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) === w, s"w_temp ${r.getString(0)}")
    }
  }

  test("selectBudget: distributed prefix sum equals the naive global selection rule") {
    val got = TextAnalysis.selectBudget(t).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (id, _, _, cum) => (cum, id) }.toSeq
    // naive rule from the engine's own F2/F3 outputs: global sort by
    // (quality desc, doc_id), running sum, keep while within budget
    val quality = TextAnalysis.qualityScore(t).select("doc_id", "quality")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val nts = TextAnalysis.tokenCount(t).select("doc_id", "re_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val expected = quality.toSeq
      .collect { case (id, Some(q)) => (id, q) }
      .sortBy { case (id, q) => (-q, id) }
      .flatMap { case (id, q) =>
        cum += nts(id)
        if (cum <= TextAnalysis.selectBudgetTokens) Some((id, q, nts(id), cum))
        else None
      }
      .sortBy { case (id, _, _, c) => (c, id) }
    assert(expected.nonEmpty && expected.size < quality.size,
      "budget must select a strict, non-empty subset at this SF")
    assert(got === expected)
    // budget respected; maximal: the next-best excluded doc would
    // overflow it
    assert(got.map(_._3).sum <= TextAnalysis.selectBudgetTokens)
    assert(cum > TextAnalysis.selectBudgetTokens,
      "corpus must exceed the budget for the cutoff to bind")
  }

  test("lmScore: smoothed bigram log-probs bounded, flag tracks the threshold") {
    val rows = TextAnalysis.lmScore(t).collect()
    // one row per doc with >= 2 tokens; every corpus doc qualifies here
    assert(rows.length === t.documents.count())
    // P(w2|w1) = (c2+1)/(c1+V) lies in (0, 1): every mean log-prob is
    // strictly negative, and bounded below by ln(1/(maxC1 + V))
    val tok = t.documents.select(
      org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.words(col("text"))).as("w"))
    val v = tok.distinct().count()
    val maxC1 = tok.groupBy("w").count().agg(max("count")).first().getLong(0)
    val floor = math.log(1.0 / (maxC1 + v))
    rows.foreach { r =>
      val mean = r.getDouble(2)
      assert(mean < 0.0 && mean >= floor - 1e-6, s"score out of bounds: $mean")
      assert(r.getBoolean(3) === (mean >= TextAnalysis.lmScoreThreshold))
      assert(r.getLong(1) > 0)
    }
    // the threshold separates a real tail on this corpus: some kept,
    // some dropped
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
    // repeated boilerplate scores HIGH likelihood (this filter is
    // complementary to F11's repetition gate, which catches it): a
    // doc made of the corpus' most common bigram must beat the median
    val med = rows.map(_.getDouble(2)).sorted.apply(rows.length / 2)
    assert(rows.map(_.getDouble(2)).max > med)
  }

  test("sourceProfile: dup rate counts corpus-wide hash groups, language majority holds") {
    import spark.implicits._
    val en = "the cat sat of the mat and went to town a lot"
    val es = "el gato y la casa de madrid en verano"
    val docs = Seq(
      (0L, "alpha", en),                   // dup of doc 3 (cross-source)
      (1L, "alpha", s"$en extra words"),
      (2L, "alpha", es),                   // minority language in alpha
      (3L, "beta", en),                    // dup of doc 0
      (4L, "beta", es),
      (5L, "beta", es.toUpperCase)         // dup of doc 4 (E1 normalizes case)
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.sourceProfile(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("alpha", "beta"))
    val (a, b) = (got("alpha"), got("beta"))
    assert(a.getLong(1) === 3L && b.getLong(1) === 3L)            // n_docs
    // dup groups are CORPUS-wide: group {0,3} spans alpha/beta, and
    // group {2,4,5} (the es text, once per source plus beta's
    // case-variant — E1 normalizes case) spans both too, so alpha
    // counts docs 0 and 2, beta counts 3, 4 and 5
    assert(a.getLong(5) === 2L, "alpha dup_docs")
    assert(b.getLong(5) === 3L, "beta dup_docs")
    // language mix: alpha = 2 en + 1 es, beta = 1 en + 2 es
    assert(a.getLong(7) === 2L && a.getString(8) === "en")
    assert(b.getLong(7) === 2L && b.getString(8) === "es")
    // mean tokens is the exact ratio
    assert(a.getDouble(3) === math.rint((12L + 14L + 9L) * 1e6 / 3.0) / 1e6)
  }

  test("gopherRules: each gate trips on its own pathology, clean prose passes") {
    import spark.implicits._
    val prose = ("the quick brown fox jumps over a lazy dog and runs to " * 5).trim
    val docs = Seq(
      (0L, "s", prose),                                    // clean: kept
      (1L, "s", "the a of and to"),                        // too short
      (2L, "s", prose + " " + "#" * 60),                   // symbol flood
      (3L, "s", (1 to 12).map(i => s"- the bullet item of and $i row here").mkString("\n")), // all-bullet lines
      (4L, "s", (1 to 12).map(i => s"the line of and $i trails off...").mkString("\n")),     // all-ellipsis lines
      (5L, "s", prose + " " + (1 to 30).map(_.toString * 2).mkString(" ")), // digit-only words
      (6L, "s", ("zzz " * 60).trim)                        // no stopwords
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-gopher").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.gopherRules(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getBoolean(8), "clean prose must pass")
    assert(!got(1L).getBoolean(8), "word-count floor")
    assert(!got(2L).getBoolean(8) && got(2L).getDouble(3) > 0.1, "symbol ratio")
    assert(!got(3L).getBoolean(8) && got(3L).getDouble(4) >= 0.9, "bullet lines")
    assert(!got(4L).getBoolean(8) && got(4L).getDouble(5) >= 0.3, "ellipsis lines")
    assert(!got(5L).getBoolean(8) && got(5L).getDouble(6) < 0.8, "alpha-word floor")
    assert(!got(6L).getBoolean(8) && got(6L).getLong(7) < 2L, "stopword floor")
    // mean word length of the clean doc is the exact char/word ratio
    val words0 = prose.split(" ")
    val exp = words0.map(_.length).sum.toDouble / words0.length
    assert(math.abs(got(0L).getDouble(2) - exp) < 1e-6)
  }

  test("dsirWeights: reconciles against an independent plain-Scala model " +
    "on a random corpus; target-vocab docs score above off-target docs") {
    import spark.implicits._
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // two overlapping vocabularies: target docs draw mostly from A,
    // raw-only docs mostly from B (deterministic LCG, no RNG state)
    val vocabA = (1 to 30).map(i => s"alpha$i")
    val vocabB = (1 to 30).map(i => s"beta$i")
    var seed = 12345L
    def nxt(m: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % m).toInt + m) % m }
    val docs = (0L until 40L).map { id =>
      val en = id % 2 == 0
      val main = if (en) vocabA else vocabB
      val other = if (en) vocabB else vocabA
      val ws = (1 to 25).map(_ => if (nxt(10) < 8) main(nxt(30)) else other(nxt(30)))
      (id, if (en) "en" else "de", "s", ws.mkString(" "))
    }
    // independent model: same definitions, plain collections
    val feats = docs.map { case (id, lang, _, text) =>
      val ws = text.toLowerCase.trim.split("\\s+").toSeq
      val fs = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      (id, lang == "en", fs.map(f => md5Of("dsir:" + f).substring(0, 2)))
    }
    val ct = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cr = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    feats.foreach { case (_, it, bs) =>
      bs.foreach { b => if (it) ct(b) += 1; cr(b) += 1 }
    }
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    val lam = cr.keys.map(b => b -> math.round(
      (math.log((ct(b) + 1).toDouble / (nt + 256).toDouble) -
        math.log((cr(b) + 1).toDouble / (nr + 256).toDouble)) * 1e6)).toMap
    val expected = feats.map { case (id, _, bs) =>
      val ms = bs.map(lam).sum
      val w = BigDecimal(ms.toDouble / bs.length.toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((bs.length.toLong, w, w >= 0.0))
    }.toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toFile
    docs.toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.dsirWeights(Tables(spark, dir.getAbsolutePath))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got === expected)
    // the model separates the slices: mean target weight > mean raw-only
    val (tw, rw) = got.partition(_._1 % 2 == 0)
    val mt = tw.values.map(_._2).sum / tw.size
    val mr = rw.values.map(_._2).sum / rw.size
    assert(mt > 0.0 && mr < 0.0, s"no separation: target mean $mt, raw-only mean $mr")
  }

  test("ngramTopk: doc frequency counts each doc once, tiebreak is (df desc, ngram asc)") {
    import spark.implicits._
    val boiler = "all rights reserved"
    val docs = Seq(
      (0L, "s", s"$boiler $boiler unique zero text"), // repeated shingle counts ONCE
      (1L, "s", s"$boiler other words here"),
      (2L, "s", s"$boiler and more body"),
      (3L, "s", "zz yy xx ww"),
      (4L, "s", "aa bb cc dd")
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ngramtopk").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.ngramTopk(Tables(spark, dir.getAbsolutePath)).collect()
    assert(got.head.getString(0) === boiler && got.head.getLong(1) === 3L)
    assert(math.abs(got.head.getDouble(2) - 0.6) < 1e-9)
    // total order: df descending, ngram ascending within equal df
    val rows = got.map(r => (r.getLong(1), r.getString(0)))
    assert(rows.sameElements(rows.sortBy { case (df, ng) => (-df, ng) }))
    // every df-1 shingle from the short docs is present (corpus has < 50 shingles)
    assert(got.length === rows.toSet.size && got.forall(_.getLong(1) >= 1L))
  }

  test("langConfusion: exact matrix on a labeled corpus, CJK text lands on " +
    "the zh script leg, rates sum to 1 per true language") {
    import spark.implicits._
    val docs = Seq(
      (0L, "en", "s", "the a of and to"),       // clean en
      (1L, "en", "s", "el la de y en words"),   // mislabeled-ish: es profile wins
      (2L, "es", "s", "el la de y en"),         // clean es
      (3L, "zh", "s", "汉字 文本 没有 停用词"),     // ideographs -> the zh script leg
      (4L, "de", "s", "der die und das mit")    // clean de
    ).toDF("doc_id", "lang", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-langconf").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.langConfusion(Tables(spark, dir.getAbsolutePath))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      ("en", "en") -> ((1L, 0.5)), ("en", "es") -> ((1L, 0.5)),
      ("es", "es") -> ((1L, 1.0)),
      ("zh", "zh") -> ((1L, 1.0)),
      ("de", "de") -> ((1L, 1.0))))
  }

  test("gateMatrix: joint distribution equals the composed per-doc gates, " +
    "shares sum to 1") {
    val t = Tables(spark, sfDir)
    val g = TextAnalysis.gopherRules(t).collect()
      .map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    val rep = TextAnalysis.repetition(t).collect()
      .map(r => r.getLong(0) -> !r.getBoolean(6)).toMap
    val d = TextAnalysis.dsirWeights(t).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val expected = g.keys.toSeq
      .map(id => (g(id), rep(id), d(id)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = TextAnalysis.gateMatrix(t).collect()
    val got = rows
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) -> r.getLong(3))
      .toMap
    assert(got === expected)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }

  test("bpePairs: vocabulary-weighted pair counts, in-word repeats count " +
    "per occurrence, single-char words drop, tiebreak is pair asc") {
    import spark.implicits._
    // freq: aaa=3, bb=2, cc=1, x=1 (filtered), aab=1, ab=1
    val docs = Seq(
      (0L, "s", "aaa bb"), (1L, "s", "aaa cc bb"),
      (2L, "s", "x aaa"), (3L, "s", "aab ab")
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.bpePairs(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "aaa" yields "aa" TWICE per occurrence (3 occurrences) + "aab"
    // once; "ab"/"bb" tie on total=2 and order lexicographically
    assert(got.toSeq === Seq(
      ("aa", 2L, 7L), ("ab", 2L, 2L), ("bb", 1L, 2L), ("cc", 1L, 1L)))
  }

  test("epochPlan: reconciles against a plain-Scala replication, the cap " +
    "binds on a boosted tiny source, and weights match mixTemperature") {
    import spark.implicits._
    def replicate(perSource: Map[String, Long])
        : Map[String, (Long, Double, Long, Long, Double, Long)] = {
      val tot = perSource.values.sum
      val micro = perSource.view.mapValues(u =>
        math.round(math.pow(u.toDouble / tot, 0.3) * 1e6)).toMap
      val mtot = micro.values.sum
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      perSource.map { case (s, u) =>
        val target = (BigInt(2L * tot) * micro(s) / mtot).toLong
        val alloc = math.min(target, 4L * u)
        s -> ((u, r6(micro(s).toDouble / mtot), target, alloc,
          r6(alloc.toDouble / u), target - alloc))
      }
    }
    def tokCount(tx: String): Long =
      "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r.findAllIn(tx).length.toLong
    val sf = t.documents.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).map(tokCount).getOrElse(0L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = TextAnalysis.epochPlan(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(got === replicate(sf))
    // w_temp agrees with F13's published weight for every source
    val w13 = TextAnalysis.mixTemperature(t).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got.view.mapValues(_._2).toMap === w13)
    // planted skew: the temperature boost pushes the tiny source's
    // target far past 4 epochs -> cap binds, deficit surfaces
    val docs = (0 until 100).map(i => (i.toLong, "big", ("w " * 50).trim)) :+
      (100L, "tiny", ("w " * 10).trim)
    val dir = java.nio.file.Files.createTempDirectory("graft-epoch").toFile
    docs.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val p = TextAnalysis.epochPlan(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    val (u, target, alloc, epochs, deficit) = p("tiny")
    assert(u === 10L)
    assert(target > 4L * u)
    assert(alloc === 4L * u)
    assert(epochs === 4.0)
    assert(deficit === target - 40L)
    assert(p("big")._5 === 0L)
  }

  test("sampleStratified: two-level top-k equals a plain-Scala flat rank, " +
    "and a source smaller than k is taken whole") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def flat(docs: Seq[(Long, String)], k: Int): Seq[(String, Int, Long)] =
      docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        ds.map(d => (md5hex(s"eval:${d._1}"), d._1))
          .sorted.take(k).zipWithIndex
          .map { case ((_, id), i) => (src, i + 1, id) }
      }.sortBy(r => (r._1, r._2))
    val sf = t.documents.select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = TextAnalysis.sampleStratified(t).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === flat(sf, 20))
    assert(got.groupBy(_._1).values.forall(_.map(_._2) == (1 to 20)))
    // a 3-doc source comes back whole, ranked 1..3
    val tiny = Seq((0L, "small"), (1L, "small"), (2L, "small")) ++
      (10L to 60L).map(i => (i, "big"))
    val dir = java.nio.file.Files.createTempDirectory("graft-strat").toFile
    tiny.map { case (id, s) => (id, s, s"doc $id text") }
      .toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val p = TextAnalysis.sampleStratified(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(p.count(_._1 == "small") === 3)
    assert(p.count(_._1 == "big") === 20)
    assert(p === flat(tiny, 20))
  }

  test("bpeTrain: reconciles against an independent plain-Scala trainer on " +
    "the sf corpus, and planted runs/ties/multi-char merges behave") {
    import spark.implicits._
    // independent replication: imperative while-loop LTR merge (a
    // different formulation than the engine's fold / oracle's reduce)
    def ltrMerge(seg: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < seg.length) {
        if (i + 1 < seg.length && seg(i) == a && seg(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += seg(i); i += 1 }
      }
      out.toVector
    }
    def train(wf: Map[String, Long], steps: Int): Seq[(Int, String, String, Long, Long)] = {
      var vocab: Map[Vector[String], Long] =
        wf.map { case (w, c) => w.toVector.map(_.toString) -> c }
      (1 to steps).flatMap { k =>
        val pc = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        for ((seg, c) <- vocab; i <- 0 until seg.length - 1)
          pc((seg(i), seg(i + 1))) += c
        if (pc.isEmpty) None
        else {
          val ((a, b), total) =
            pc.toSeq.minBy { case ((x, y), n) => (-n, s"$x $y") }
          vocab = vocab.map { case (seg, c) => ltrMerge(seg, a, b) -> c }
          val tokensAfter = vocab.map { case (s, c) => s.length * c }.sum
          Some((k, a, b, total, tokensAfter))
        }
      }
    }
    def wordFreq(texts: Seq[String]): Map[String, Long] =
      texts.flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // sf corpus reconciliation
    val sfTexts = t.documents.select(col("text")).collect()
      .flatMap(r => Option(r.getString(0))).toSeq
    val got = TextAnalysis.bpeTrain(t).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === train(wordFreq(sfTexts), 8))
    // planted: (a,a) run merges LTR ("aaaa" -> [aa,aa]), the 3-vs-3
    // tie breaks to "p q" < "x y", and step 4 merges the MERGED
    // symbol pair (aa,aa) -> "aaaa"
    val docs = Seq(
      (0L, "s", "aaaa aaaa"), (1L, "s", "xy xy xy"), (2L, "s", "pq pq pq")
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpetrain").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val planted = TextAnalysis.bpeTrain(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    // step 1: (a,a) counts 3 per "aaaa" occurrence (6 total) but each
    // word merges only twice (LTR non-overlap) -> 2 words x 2 symbols
    assert(planted.take(4) === Seq(
      (1, "a", "a", 6L, 16L),
      (2, "p", "q", 3L, 13L),
      (3, "x", "y", 3L, 10L),
      (4, "aa", "aa", 2L, 8L)))
    assert(planted === train(
      wordFreq(Seq("aaaa aaaa", "xy xy xy", "pq pq pq")), 8))
  }

  test("qualityBuckets: two-level rank equals a plain-Scala per-source " +
    "percent rank with ties id-ordered; singleton source is head; " +
    "empty text is excluded") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a", "the a of and to " * 10),          // strong quality
      (1L, "a", "word " * 30),                      // no stopwords
      (2L, "a", "the quick brown fox and a dog"),
      (3L, "a", "the quick brown fox and a dog"),  // exact tie with 2
      (4L, "a", "!!! ??? ..."),                     // punct-heavy
      (5L, "a", ""),                                // NULL quality: excluded
      (6L, "b", "only doc in this source the a of")
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-qbuck").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val ft = Tables(spark, dir.getAbsolutePath)
    val got = TextAnalysis.qualityBuckets(ft).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getString(4)))

    // independent rank from F2's (separately spec'd) quality values
    val quality = TextAnalysis.qualityScore(ft).collect()
      .flatMap(r => if (r.isNullAt(5)) None
        else Some(r.getLong(0) -> r.getDouble(5))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq("a", "b").flatMap { src =>
      val members = (0L to 6L).filter(id =>
        quality.contains(id) && (if (src == "a") id <= 5 else id == 6))
      val ordered = members.sortBy(id => (-quality(id), id))
      val n = ordered.size
      ordered.zipWithIndex.map { case (id, i) =>
        val p = if (n == 1) 0.0 else i.toDouble / (n - 1)
        val bucket = if (p <= 1.0 / 3) "head"
          else if (p <= 2.0 / 3) "middle" else "tail"
        (id, src, quality(id), r6(p), bucket)
      }
    }.sortBy(e => (e._2, e._1))
    assert(got.toSeq === expected)
    // the planted facts: doc 5 excluded, the singleton source is its
    // own head, and the tie pair ordered by id
    assert(!got.exists(_._1 == 5L))
    assert(got.find(_._1 == 6L).get._5 === "head")
    val tie = got.filter(g => g._1 == 2L || g._1 == 3L)
    assert(tie.map(_._3).distinct.length === 1 && tie(0)._4 < tie(1)._4)
  }

  test("pipelineFunnel: every stage drops its planted doc exactly once, " +
    "and the final survivors are F9's kept docs") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over a lazy dog of and to near river bank today"
    val textB = "a big cat and the mat of milk to shop sat on it today fine"
    val docs = Seq(
      (0L, "s1", textA),                          // contaminated by the eval copy
      (1L, "s1", "!!!"),                          // quality fail
      (2L, "s1", Seq.fill(50)("spam").mkString(" ")), // repetition flag
      (3L, "s5", textA),                          // EVAL doc (source % 5 == 0)
      (4L, "s1", textB),                          // clean survivor
      (5L, "s1", textB)                           // exact duplicate of 4
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val ft = Tables(spark, dir.getAbsolutePath)
    val got = TextAnalysis.pipelineFunnel(ft).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1, "quality_gate", 6L, 5L, 1L, 0.166667),
      (2, "repetition_gate", 5L, 4L, 1L, 0.2),
      (3, "decontaminate", 4L, 3L, 1L, 0.25),
      (4, "exact_dedup", 3L, 2L, 1L, 0.333333)))
    // stage 4's survivors ARE the composed pipeline's kept docs
    assert(got.last._4 === TextAnalysis.pipelineKeptDocs(ft).count())
    // and the identity holds on the corpus fixture too
    val full = TextAnalysis.pipelineFunnel(t).collect()
    assert(full.last.getLong(3) === TextAnalysis.pipelineKeptDocs(t).count())
    // funnel invariant: n_out never exceeds n_in, chain is contiguous
    full.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) === b.getLong(2), "funnel chain must be contiguous")
    }
    assert(full.forall(r => r.getLong(3) <= r.getLong(2)))
  }

  test("tokenHistogram: exact power-of-two buckets with boundary docs, " +
    "empty doc lands in bucket -1, cumulative share closes at 1") {
    import spark.implicits._
    // token counts under F3's regex rule: "a b c" = 3 (bucket 1),
    // 8 and 15 pin bucket 3's lo/hi boundaries, 16 opens bucket 4,
    // "" = 0 tokens -> the dedicated -1 bucket
    val docs = Seq(
      (0L, "s", ""),
      (1L, "s", "a b c"),
      (2L, "s", (1 to 8).map(i => s"w$i").mkString(" ")),   // w1 = 2 tokens? no: wN is letters+digits
      (3L, "s", Seq.fill(8)("tok").mkString(" ")),
      (4L, "s", Seq.fill(15)("tok").mkString(" ")),
      (5L, "s", Seq.fill(16)("tok").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tokhist").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.tokenHistogram(Tables(spark, dir.getAbsolutePath))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(7)))
    // doc 2's "wN" words are letter-run + digit-run = 2 regex tokens
    // each -> 16 tokens -> bucket 4 beside doc 5
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)).toSeq === Seq(
      (-1, 0L, 0L, 1L, 0L),    // the empty doc, zero volume
      (1, 2L, 3L, 1L, 3L),     // 3 tokens
      (3, 8L, 15L, 2L, 23L),   // the lo and hi boundary docs
      (4, 16L, 31L, 2L, 32L))) // 16 exact + doc 2's 16
    // cumulative token share closes at exactly 1
    assert(got.last._6 === 1.0)
    // monotone cumulative
    assert(got.map(_._6).toSeq === got.map(_._6).toSeq.sorted)
  }

  test("collocations: reconciles against an independent plain-Scala " +
    "phrase-score model, delta floor drops rare pairs") {
    import spark.implicits._
    // "new york" co-occurs 8x (clears the delta=5 floor); both words
    // also appear alone so the lift is non-trivial; "of the" is
    // frequent but its unigrams are everywhere (low score); rare
    // pairs (< 6 occurrences) must not surface at all
    val texts = Seq.tabulate(8)(i => s"new york city tour $i") ++
      Seq.fill(6)("of the corpus of the day") ++
      Seq("a new day", "york minster", "rare pair here", "new start",
        "the new york times reads of the news")
    val docs = texts.zipWithIndex
      .map { case (txt, i) => (i.toLong, "s", txt) }
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-colloc").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.collocations(Tables(spark, dir.getAbsolutePath))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))

    // independent model: same tokenize, sliding pairs, Mikolov score
    val toks = texts.map(_.toLowerCase.trim.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.map(_.size).sum.toLong
    val pairs = toks.flatMap(ws => ws.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairs.toSeq
      .filter(_._2 > 5)
      .map { case ((a, b), cab) =>
        val score = BigDecimal((cab - 5).toDouble * n.toDouble /
          (uni(a).toDouble * uni(b).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, cab, uni(a), uni(b), score)
      }
      .sortBy { case (a, b, _, _, _, s) => (-s, a, b) }
      .take(30)
    assert(got.toSeq === expected,
      s"collocations diverged from the independent model")
    // the planted collocation surfaces and rare pairs never do
    assert(got.exists(r => r._1 == "new" && r._2 == "york" && r._3 == 9L))
    assert(got.forall(_._3 > 5))
  }

  test("tokenFertility: exact byte/char/token accounting on a planted " +
    "multilingual slice (multi-byte chars, sub-word splits, NULL text)") {
    val docs = Seq(
      (0L, "alpha", "en", "hello world"),  // ascii: bytes = chars, 1 token/word
      (1L, "alpha", "en", "don't stop"),   // don|'|t|stop: 4 tokens over 2 words
      (2L, "beta", "zh", "你好 世界"), // 4 CJK chars à 3 UTF-8 bytes
      (3L, "beta", "zh", null)             // counts in n_docs, all sums skip
    ).toDF("doc_id", "source", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-fertility").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.tokenFertility(Tables(spark, dir.getAbsolutePath))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7), r.getDouble(8), r.getDouble(9)))).toMap
    // alpha/en: bytes=chars=21, ws=4, re=2+4=6
    assert(got(("alpha", "en")) ===
      ((2L, 21L, 21L, 4L, 6L, 3.5, 3.5, 1.5)))
    // beta/zh: the non-null doc is 4 ideographs + 1 space — 13 bytes
    // for 5 code points (bytes > chars is the multi-byte signal),
    // each ideograph lexes as a single-symbol token (4 re over 2 ws)
    assert(got(("beta", "zh")) ===
      ((2L, 13L, 5L, 2L, 4L, 3.25, 1.25, 2.0)))
    assert(got.size === 2)
    // reconciliation: the audit's token volume is exactly F3's rule
    // summed — one definition, two consumers
    val fromF3 = TextAnalysis.tokenCount(t).agg(sum("re_tokens")).first().getLong(0)
    val fromF28 = TextAnalysis.tokenFertility(t).agg(sum("re_tokens")).first().getLong(0)
    assert(fromF3 === fromF28)
  }

  test("sampleWeighted equals an independent A-ES replication and is " +
    "size-biased relative to a uniform draw") {
    val docs = t.documents.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keys = docs.map { case (id, w) =>
      val v = java.lang.Long.parseLong(md5hex(s"wsample:$id").substring(0, 12), 16)
      val u = (v + 0.5) / 281474976710656.0
      val k = BigDecimal(math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, k)
    }
    val expected = keys.sortBy { case (id, k) => (-k, id) }
      .take(TextAnalysis.weightedK).map(_._1).toSeq
    val got = TextAnalysis.sampleWeighted(t).collect().map(_.getLong(0)).toSeq
    assert(got === expected)
    // the A-ES point: longer docs are over-represented vs uniform
    val sel = expected.toSet
    val meanSel = docs.filter(d => sel(d._1)).map(_._2).sum.toDouble / sel.size
    val meanAll = docs.map(_._2).sum.toDouble / docs.length
    assert(meanSel > meanAll,
      s"selected mean weight $meanSel not above corpus mean $meanAll")
  }

  test("bpeApply: corpus BPE volume reconciles with the trainer's own " +
    "final tokens_after (one trained tokenizer, two consumers), and a " +
    "repetitive planted source compresses better than a diverse one") {
    import org.apache.spark.sql.functions.{col => c}
    val rows = TextAnalysis.bpeApply(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // compression is exactly the emitted longs' division
    rows.foreach { case (_, _, chars, bpe, comp) =>
      val expect = BigDecimal(chars.toDouble / bpe.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(comp === expect)
      assert(comp >= 1.0, "a merge can only shorten a segmentation")
    }
    // Σ-per-source BPE volume == the trainer's corpus-wide
    // tokens_after at the final step
    val trainerFinal = TextAnalysis.bpeTrain(t)
      .orderBy(c("step").desc).limit(1).collect()(0).getLong(4)
    assert(rows.map(_._4).sum === trainerFinal)
    // planted: source A repeats one phrase (its pairs win the merges),
    // source B is all-distinct words — A must compress strictly better
    import spark.implicits._
    val docs = (
      (0L until 8L).map(i => (i, "aba aba aba aba aba aba", "en", "rep", 23L)) ++
        (8L until 16L).map(i => (i, s"qw${i}x er${i}y tu${i}z", "en", "div", 15L))
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpeapply").toFile
    dir.deleteOnExit()
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val planted = TextAnalysis.bpeApply(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(planted("rep") > planted("div"),
      s"repetitive source did not compress better: $planted")
  }

  test("plan: sampleWeighted is one TakeOrderedAndProject over the " +
    "scan — per-partition heaps, no global sort, no shuffle") {
    val df = TextAnalysis.sampleWeighted(t)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k plan:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
