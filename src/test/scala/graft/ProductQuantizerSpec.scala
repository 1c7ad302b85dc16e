package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingStore, ProductQuantizer}
import graft.sources.Tables

class ProductQuantizerSpec extends SparkTestBase {

  private def freshIndex(): (String, org.apache.spark.sql.DataFrame) = {
    val t = Tables(spark, sfDir)
    val vecs = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val path = Files.createTempDirectory("pq-spec").toString
    EmbeddingStore.buildIvfIndex(spark, vecs, path)
    (path, vecs)
  }

  test("codebooks are the seeded rule and codes stay in range") {
    val (path, vecs) = freshIndex()
    val n = vecs.count()
    val cb = spark.read.parquet(s"$path/pq_codebooks")
    val m = 64 / ProductQuantizer.subDim
    val ncent = math.min(n, ProductQuantizer.numCentroids.toLong).toInt
    assert(cb.count() === (m * ncent).toLong)
    // codebook entry (s, cid) is EXACTLY the cid-th lowest doc_id's
    // quantized subvector — the rule the oracle replays
    val seeds = vecs.orderBy(col("doc_id")).limit(ncent)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(ProductQuantizer.quantizeLong))
    val got = cb.orderBy(col("sub"), col("cid")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
    got.foreach { case (s, cid, cvec) =>
      val d = ProductQuantizer.subDim
      assert(cvec.toSeq === seeds(cid).slice(s * d, (s + 1) * d).toSeq,
        s"codebook ($s,$cid) is not the seeded subvector")
    }
    // every stored code addresses a codebook entry
    val codes = spark.read.parquet(s"$path/pq_codes")
    assert(codes.count() === n)
    val bad = codes
      .select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= ncent).count()
    assert(bad === 0L)
  }

  test("searchIvfPq returns the exact integer ADC ranking over the probed cells") {
    val (path, _) = freshIndex()
    val got = ProductQuantizer.searchIvfPq(spark, path, queryDocId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    // independent ground truth, all in plain JVM arithmetic: read the
    // stored codes + codebooks + query vector and re-rank
    val probed = got.map(_._2).toSet
    val cb = spark.read.parquet(s"$path/pq_codebooks").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Long](2))).toMap
    val qv = spark.read.parquet(s"$path/cells")
      .filter(col("doc_id") === 0L).select(col("embedding")).first()
      .getSeq[Float](0).map(ProductQuantizer.quantizeLong)
    val expected = spark.read.parquet(s"$path/pq_codes").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Int](1)))
      .filter { case (id, cell, _) => id != 0L && probed(cell) }
      .map { case (id, cell, codes) =>
        val adist = codes.zipWithIndex.map { case (c, s) =>
          val cv = cb((s, c))
          (0 until ProductQuantizer.subDim).map { i =>
            val d = qv(s * ProductQuantizer.subDim + i) - cv(i); d * d
          }.sum
        }.sum
        (id, cell, adist)
      }
      .sortBy { case (id, _, adist) => (adist, id) }
      .take(10)
    assert(got.toSeq === expected.toSeq)
  }

  test("appendToIvfIndex keeps the code sidecar consistent with the cells") {
    val t = Tables(spark, sfDir)
    val all = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val maxId = all.agg(max(col("doc_id"))).first().getLong(0)
    val base = all.filter(col("doc_id") <= maxId / 2)
    val delta = all.filter(col("doc_id") > maxId / 2)
    val path = Files.createTempDirectory("pq-append").toString
    EmbeddingStore.buildIvfIndex(spark, base, path)
    val cbBefore = spark.read.parquet(s"$path/pq_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2))).sortBy(x => (x._1, x._2))
    EmbeddingStore.appendToIvfIndex(spark, path, delta)
    // codebooks FIXED across the append (standard IVF-PQ posture)
    val cbAfter = spark.read.parquet(s"$path/pq_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2))).sortBy(x => (x._1, x._2))
    assert(cbAfter.toSeq === cbBefore.toSeq)
    // every vector in the cells has exactly one code row, in the SAME
    // cell the vector was assigned to (probe pruning must agree)
    val cells = spark.read.parquet(s"$path/cells")
      .select(col("doc_id"), col("cell").as("vcell"))
    val codes = spark.read.parquet(s"$path/pq_codes")
      .select(col("doc_id"), col("cell").as("ccell"))
    assert(codes.count() === cells.count())
    val mismatched = cells.join(codes, "doc_id")
      .filter(col("vcell") =!= col("ccell")).count()
    assert(mismatched === 0L)
    // appended rows are probe-visible in the compressed domain: a
    // search for a delta doc returns neighbors (its own cell is
    // non-empty by construction)
    val probeId = maxId
    val res = ProductQuantizer.searchIvfPq(spark, path, probeId, k = 5)
    assert(res.count() > 0L)
  }

  test("rebuildIfDrifted swaps the PQ sidecars with the cells") {
    val t = Tables(spark, sfDir)
    val all = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val maxId = all.agg(max(col("doc_id"))).first().getLong(0)
    val path = Files.createTempDirectory("pq-rebuild").toString
    EmbeddingStore.buildIvfIndex(spark, all.filter(col("doc_id") <= maxId / 2), path)
    EmbeddingStore.appendToIvfIndex(spark, path,
      all.filter(col("doc_id") > maxId / 2))
    assert(EmbeddingStore.rebuildIfDrifted(spark, path, threshold = 0.1))
    // post-rebuild: codes cover the full corpus, cells agree, and the
    // codebook is the re-seeded rule over the merged corpus (same
    // seeds here, since seeds are the lowest ids — but the swap must
    // have left no stale/replaced dirs behind)
    val n = all.count()
    assert(spark.read.parquet(s"$path/pq_codes").count() === n)
    val leftovers = new java.io.File(path).list().filter(_.endsWith("_replaced"))
    assert(leftovers.isEmpty, s"stale dirs after rebuild: ${leftovers.mkString(",")}")
    val res = ProductQuantizer.searchIvfPq(spark, path, queryDocId = 0L, k = 10)
    assert(res.count() === 10L)
  }
}
