package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import graft.sources.{Export, Tables}

class ExportSpec extends SparkTestBase {

  test("exportManifest: read-back manifest equals the pre-write frame's " +
    "facts (counts, token volume, xor checksum) — the round trip is exact") {
    val t = Tables(spark, sfDir)
    val pre = TextAnalysis.pipelineKeptDocs(t)
      .join(t.documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("split"), col("source"), col("doc_id"),
        size(TextFunctions.words(col("text"))).cast("long").as("toks"))
      .collect()
    assert(pre.nonEmpty, "pipeline kept nothing — fixture drifted")
    val expected = pre.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_.getLong(3)).sum,
          rs.map(_.getLong(2)).reduce(_ ^ _)))
      }
    val got = Export.exportManifest(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected)
  }

  test("exportManifest: a corpus where every doc fails the gates yields an " +
    "EMPTY manifest, not a schema-inference crash (explicit read schema)") {
    import spark.implicits._
    // two-word junk docs: quality = 0.4*min(1, 2/50) + 0.3*1 + 0 =
    // 0.316 < 0.5 — the quality gate drops everything
    val docs = (0L to 4L).map(i => (i, "s", s"zz$i yy$i"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-empty").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val out = Export.exportManifest(Tables(spark, dir.getAbsolutePath))
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq ===
      Seq("split", "source", "n_docs", "n_tokens", "id_xor"))
  }

  test("exportShards: read-back shard manifest equals the pre-write " +
    "frame's facts under the doc_id mod N rule, and every (split, shard) " +
    "row is the shard a loader would actually read") {
    val t = Tables(spark, sfDir)
    val pre = TextAnalysis.pipelineKeptDocs(t)
      .join(t.documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("split"), col("doc_id"),
        size(TextFunctions.words(col("text"))).cast("long").as("toks"))
      .collect()
    assert(pre.nonEmpty, "pipeline kept nothing — fixture drifted")
    val expected = pre
      .groupBy(r => (r.getString(0), r.getLong(1) % Export.exportShardCount))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_.getLong(2)).sum,
          rs.map(_.getLong(1)).reduce(_ ^ _)))
      }
    val got = Export.exportShards(t).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected)
    // shuffle-sharding coverage: with dense ids the corpus reaches
    // every shard slot (a tiny split may legitimately miss one — the
    // per-(split, shard) facts above are the exact contract)
    assert(got.keys.map(_._2).toSet === (0L until Export.exportShardCount).toSet,
      "dense ids must reach every shard slot")
  }

  test("exportCurriculum: read-back manifest equals the pre-write frame " +
    "under F26's buckets, and mean quality is monotone across phases") {
    val t = Tables(spark, sfDir)
    val buckets = TextAnalysis.qualityBuckets(t)
      .select(col("doc_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val phaseOf = Map("tail" -> 1, "middle" -> 2, "head" -> 3)
    val pre = TextAnalysis.pipelineKeptDocs(t)
      .filter(col("split") === "train")
      .join(t.documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"),
        size(TextFunctions.words(col("text"))).cast("long").as("toks"),
        round(TextAnalysis.qualityExpr * 1e6, 0).cast("long").as("q_u"))
      .collect()
    assert(pre.nonEmpty, "pipeline kept no train docs — fixture drifted")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = pre
      .groupBy(r => (phaseOf(buckets(r.getLong(0))),
        r.getLong(0) % Export.exportShardCount))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_.getLong(1)).sum,
          rs.map(_.getLong(0)).reduce(_ ^ _),
          r6(rs.map(_.getLong(2)).sum.toDouble / (rs.length * 1000000L))))
      }
    val got = Export.exportCurriculum(t).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got === expected)
    // the curriculum claim itself: per-phase mean quality rises
    val byPhase = got.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
      .map { case (p, rs) =>
        val n = rs.map(_._2._1).sum
        p -> rs.map(r => r._2._4 * r._2._1).sum / n
      }
    assert(byPhase.map(_._1) === Seq(1, 2, 3))
    assert(byPhase.sliding(2).forall(p => p(0)._2 < p(1)._2),
      s"phase mean quality not monotone: $byPhase")
  }

  test("exportJsonl: per-split manifest equals the pre-write frame, " +
    "through the JSON round trip") {
    val t = Tables(spark, sfDir)
    val pre = TextAnalysis.pipelineKeptDocs(t)
      .join(t.documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("split"), col("doc_id"),
        size(TextFunctions.words(col("text"))).cast("long").as("toks"))
      .collect()
    assert(pre.nonEmpty)
    val expected = pre.groupBy(_.getString(0)).map { case (k, rs) =>
      k -> ((rs.length.toLong, rs.map(_.getLong(2)).sum,
        rs.map(_.getLong(1)).reduce(_ ^ _)))
    }
    val got = Export.exportJsonl(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
  }

  test("jsonlRoundTrip: quotes, backslashes, newlines, tabs and non-ASCII " +
    "round-trip exactly, one line per doc, every line parseable") {
    import spark.implicits._
    val nasty = Seq(
      (0L, "s", "plain text", "train"),
      (1L, "s", "a \"quoted\" word and a back\\slash", "train"),
      (2L, "s", "line one\nline two\r\nwindows", "train"),
      (3L, "s", "tab\there and unicode: 漢字 émoji ❤", "test"),
      (4L, "s", "{\"looks\":\"like json\"}", "test"),
      (5L, "s", "", "test"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl").toString
    val back = Export.jsonlRoundTrip(
      nasty.toDF("doc_id", "source", "text", "split"), s"$dir/out")
      .collect()
      .map(r => (r.getLong(1), (r.getString(2), r.getString(3), r.getString(0))))
      .toMap
    nasty.foreach { case (id, src, tx, sp) =>
      assert(back(id) === ((src, tx, sp)), s"doc $id mangled")
    }
    // framing: exactly one physical line per doc (embedded newlines
    // must be escaped, never split the record), and each line parses
    val lines = spark.read.text(s"$dir/out")
      .select(col("value")).collect().map(_.getString(0))
    assert(lines.length === nasty.length)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }

  test("exportManifest: a numeric-looking source survives the partition " +
    "round trip as a STRING (no partition-type inference corruption)") {
    import spark.implicits._
    val prose = ("the quick brown fox jumps over a lazy dog and runs to " * 5).trim
    val docs = Seq((0L, "007", prose), (1L, "2023", prose + " extra words here"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-numsrc").toFile
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = Export.exportManifest(Tables(spark, dir.getAbsolutePath))
      .collect().map(r => r.getString(1)).toSet
    assert(got === Set("007", "2023"), s"partition values corrupted: $got")
  }

  test("compactStore: many small files re-land at the size-derived " +
    "count, losslessly — the file-count facts no SQL oracle can see") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toFile
    val in = s"${dir.getAbsolutePath}/in"
    val out = s"${dir.getAbsolutePath}/out"
    try {
      spark.range(0, 20000)
        .select(col("id"), concat(lit("row text payload "), col("id")).as("text"))
        .repartition(32)
        .write.parquet(in)
      val target = 64L * 1024
      val (before, after, bytes) =
        Export.compactStore(spark, "id LONG, text STRING", in, out, target)
      assert(before === 32L)
      assert(after === math.max(1L, (bytes + target - 1) / target))
      assert(after < before, s"no compaction: $before -> $after")
      // losslessness: exact multiset equality through the rewrite
      val a = spark.read.parquet(in).as[(Long, String)].collect().sorted
      val b = spark.read.parquet(out).as[(Long, String)].collect().sorted
      assert(a.toSeq === b.toSeq)
    } finally graft.sources.LayoutStore.deleteRecursively(dir)
  }

  test("compactShards manifest equals the direct per-source manifest " +
    "of the original table") {
    val t = Tables(spark, sfDir)
    val got = Export.compactShards(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val direct = t.documents
      .select(col("source"), col("doc_id"),
        size(TextFunctions.words(col("text"))).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("toks")).as("tk"),
        expr("bit_xor(doc_id)").as("x"))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === direct.toSeq)
    assert(got.nonEmpty)
  }

  test("mergeLatest: updates replace, inserts append, untouched rows " +
    "survive; re-merging the same delta is a no-op") {
    import spark.implicits._
    val state = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("o_orderkey", "v")
    val delta = Seq((2L, "B2"), (9L, "new"))
      .toDF("o_orderkey", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val merged = Export.mergeLatest(state, delta, "o_orderkey")
    assert(rows(merged) ===
      Set((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
    assert(merged.count() === 4L, "a merge must not duplicate rows")
    // idempotent: the anti join removes exactly what the union
    // re-adds — compare COUNTS too (a set compare alone would hide a
    // re-appended duplicate)
    val again = Export.mergeLatest(merged, delta, "o_orderkey")
    assert(rows(again) === rows(merged) && again.count() === 4L)
  }

  test("purge: listed ids are gone from the read-back (residual 0), " +
    "everything else survives, and the counts close the ledger") {
    val t = Tables(spark, sfDir)
    val rows = Export.purge(t).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("residual") === 0L),
      "a listed id survived the purge")
    val nPurged = rows.head.getAs[Long]("n_purged")
    val expectedPurged = t.documents
      .filter(col("doc_id") % 97 === 0).count()
    assert(nPurged === expectedPurged && nPurged > 0,
      "the fixture must actually exercise the takedown path")
    // ledger closes: survivors + purged = corpus
    val survivors = rows.map(_.getAs[Long]("n_docs")).sum
    assert(survivors + nPurged === t.documents.count())
    // per-source survivor counts match an independent recompute
    val expected = t.documents.filter(col("doc_id") % 97 =!= 0)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_docs") === expected(r.getString(0))))
  }

  test("schemaEvolve: one mergeSchema read serves both generations — " +
    "legacy rows NULL-backfill, evolved volume matches the new files") {
    val t = Tables(spark, sfDir)
    val rows = Export.schemaEvolve(t).collect()
    assert(rows.nonEmpty)
    val split = t.documents.agg(max(col("doc_id"))).first().getLong(0) / 2
    val legacy = t.documents.filter(col("doc_id") <= split)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val evolved = t.documents.filter(col("doc_id") > split)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("n_legacy") === legacy.getOrElse(src, 0L),
        s"NULL backfill drifted for $src")
      assert(r.getAs[Long]("evolved_chars") === evolved.getOrElse(src, 0L),
        s"evolved volume drifted for $src")
    }
    assert(rows.map(_.getAs[Long]("n_legacy")).sum > 0)
    assert(rows.map(_.getAs[Long]("evolved_chars")).sum > 0)
  }

  test("scd2Apply: matched versions close, history is append-only, and " +
    "point-in-time reads resolve each era to the right version") {
    import spark.implicits._
    val state = Seq((1L, "a", 0L, Option.empty[Long]),
      (2L, "b", 0L, Option.empty[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val delta = Seq((2L, "B2", 5L, Option.empty[Long]),
      (9L, "new", 5L, Option.empty[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val hist = Export.scd2Apply(state, delta, "k", closeAt = 5L)
    val rows = hist.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(rows === Set(
      (1L, "a", 0L, None),          // survivor stays current
      (2L, "b", 0L, Some(5L)),      // matched version CLOSED, not lost
      (2L, "B2", 5L, None),         // its replacement is current
      (9L, "new", 5L, None)))       // insert appends as current
    assert(hist.count() === 4L, "history must not duplicate versions")
    // exactly one current version per key
    val current = hist.filter(col("valid_to").isNull)
      .groupBy(col("k")).count().filter(col("count") > 1).count()
    assert(current === 0L)
    // the point-in-time contract (the B7 as-of consumer): at t=3 key 2
    // reads 'b'; at t=7 it reads 'B2'
    def asOf(tq: Long, k: Long): String = hist
      .filter(col("k") === k && col("valid_from") <= tq &&
        (col("valid_to").isNull || col("valid_to") > tq))
      .collect().map(_.getString(1)).toSeq match { case Seq(v) => v }
    assert(asOf(3L, 2L) === "b" && asOf(7L, 2L) === "B2")
  }

  test("export salt conf: the salted distribution keeps the shard " +
    "manifest byte-identical — the file-count bound is layout-only") {
    val t = Tables(spark, sfDir)
    val unsalted = Export.exportShards(t).collect().toSeq
    spark.conf.set(Export.saltKey, "3")
    try {
      val salted = Export.exportShards(t).collect().toSeq
      assert(salted === unsalted,
        "salting the write distribution must not change one manifest byte")
    } finally spark.conf.unset(Export.saltKey)
  }
}
