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
}
