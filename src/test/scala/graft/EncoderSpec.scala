package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingStore, Encoder, HashingEncoder, VectorSearch}
import graft.sources.Tables

/** The ALTERNATE deterministic encoder: character-TRIGRAM hashing —
  * structurally different from the shipped word-level
  * [[HashingEncoder]] on every axis (tokenization unit, hash salt,
  * bucket nibble count, sign rule), so anything downstream that
  * secretly depended on the default encoder's shape would break
  * under it. This is the sandbox stand-in for "swap in ONNX MiniLM
  * on day one": only the [[Encoder]] binding changes. */
final case class TrigramEncoder(dim: Int) extends Encoder {
  def encodeRaw(docs: DataFrame): DataFrame = {
    // cleaned text lands as a plain attribute BEFORE the HOF touches
    // it (house rule: a non-lambda expression inside a HOF lambda
    // re-evaluates per element)
    val grams = docs
      .select(col("doc_id"), lower(trim(col("text"))).as("c"))
      .filter(length(col("c")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("c")) - 2),
          i => col("c").substr(i, lit(3)))).as("g"))
      .select(col("doc_id"), md5(concat(lit("tri:"), col("g"))).as("h"))
      .select(col("doc_id"),
        (conv(substring(col("h"), 1, 5), 16, 10).cast("int") % dim).as("bucket"),
        when(substring(col("h"), 6, 1) <= "9", 1.0).otherwise(-1.0).as("sign"))
    grams.groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("v"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("raw"))
  }
}

/** The THIRD encoder, loadable purely by conf: no-arg constructor
  * (Class.forName + newInstance — the production deployment path),
  * word-LENGTH count bucketing, nothing shared with either other
  * encoder. */
final class ByteFoldEncoder() extends Encoder {
  val dim = 16
  def encodeRaw(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.words(
          lower(trim(col("text"))))).as("w"))
      .select(col("doc_id"), (length(col("w")) % dim).cast("int").as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("v"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("raw"))
}

/** Proves the [[Encoder]] seam: the whole store → index → search →
  * recall → stats machinery runs unchanged under an encoder that
  * shares nothing with the default but the contract. */
class EncoderSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)
  private val alt = TrigramEncoder(32)

  private lazy val altVecs = EmbeddingStore
    .embedWith(alt, t.documents)
    .select(col("doc_id"), col("embedding"))
    .localCheckpoint(true)

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  test("embedWith(alt) honors the shared normalize/shard contract and " +
    "differs from the default encoder") {
    val rows = EmbeddingStore.embedWith(alt, t.documents).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](2)
      assert(v.length === alt.dim)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n === 0.0 || math.abs(n - 1.0) < 1e-5, s"norm $n")
      assert(r.getLong(1) === java.lang.Math.floorMod(r.getLong(0),
        EmbeddingStore.numShards.toLong))
    }
    // non-vacuity: at matching width the two encoders disagree
    val defVecs = EmbeddingStore.embedWith(HashingEncoder(alt.dim), t.documents)
      .select(col("doc_id"), col("embedding").as("dv"))
    val joined = EmbeddingStore.embedWith(alt, t.documents)
      .select(col("doc_id"), col("embedding").as("av"))
      .join(defVecs, "doc_id").collect()
    assert(joined.exists(r => r.getSeq[Float](1) != r.getSeq[Float](2)))
  }

  test("D8 machinery is encoder-agnostic: full-probe searchIvf over an " +
    "alternate-encoder index equals independent brute force") {
    val dir = Files.createTempDirectory("graft-enc-ivf").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    EmbeddingStore.buildIvfIndex(spark, altVecs, path)

    val nCells = graft.sources.IndexCatalog.read(spark, path, "centroids").count().toInt
    val got = EmbeddingStore
      .searchIvf(spark, path, queryDocId = 0L, k = 10, probes = nCells)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // independent plain-Scala brute force over the same vectors
    val all = altVecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val q = all.find(_._1 == 0L).get._2
    val expected = all.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, math.round(cos(q, v) * 1e6) / 1e6) }
      .sortBy { case (id, s) => (-s, id) }
      .take(10).toSeq
    assert(got === expected)
  }

  test("D9 stats and D7 recall evaluator run unchanged over the " +
    "alternate-encoder corpus") {
    val dir = Files.createTempDirectory("graft-enc-stats").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    EmbeddingStore.buildIvfIndex(spark, altVecs, path)

    val st = EmbeddingStore.indexStats(spark, path).first()
    assert(st.getAs[Long]("n_vectors") === altVecs.count())
    assert(st.getAs[Double]("appended_frac") === 0.0)
    val mic = st.getAs[Double]("mean_intra_cosine")
    assert(mic > 0.0 && mic <= 1.0, s"mean_intra_cosine $mic")

    val recall = VectorSearch.ivfRecallOver(spark, altVecs)
      .orderBy(col("probes")).collect()
      .map(r => (r.getInt(0), r.getAs[Double]("recall")))
    assert(recall.map(_._1).toSeq === Seq(1, 2, 4))
    assert(recall.forall { case (_, rc) => rc >= 0.0 && rc <= 1.0 })
    // more probes can only add candidates: recall is non-decreasing
    assert(recall.map(_._2).toSeq === recall.map(_._2).sorted.toSeq)
  }

  test("the incremental and query-time paths thread the seam: " +
    "updateSinceWith appends, searchTextWith serves") {
    val dir = Files.createTempDirectory("graft-enc-store").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/store"
    val n = t.documents.count()
    val mid = t.documents.agg(expr("percentile(doc_id, 0.5)")).first()
      .getDouble(0).toLong
    EmbeddingStore.store(
      EmbeddingStore.embedWith(alt, t.documents.filter(col("doc_id") <= mid)),
      path)
    val stats = EmbeddingStore.updateSinceWith(alt, t, path, mid, None)
    assert(stats.processed === n - t.documents
      .filter(col("doc_id") <= mid).count())
    assert(spark.read.parquet(path).count() === n)
    // appended vectors came through the SAME encoder: width alt.dim
    val widths = spark.read.parquet(path)
      .select(size(col("embedding")).as("w")).distinct().collect()
    assert(widths.map(_.getInt(0)).toSeq === Seq(alt.dim))

    val hits = EmbeddingStore.searchTextWith(alt, t,
      "the quick brown fox jumps over the lazy dog", 5).collect()
    assert(hits.length === 5)
    assert(hits.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
  }

  test("BatchedHashEncoder equals HashingEncoder vector-for-vector: " +
    "the executed mapPartitions batch path computes the same model " +
    "function as the declarative path") {
    import graft.operators.BatchedHashEncoder
    val batched = EmbeddingStore
      .embedWith(new BatchedHashEncoder(32), t.documents)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val declarative = EmbeddingStore
      .embedWith(HashingEncoder(32), t.documents)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(batched.keySet === declarative.keySet)
    assert(batched === declarative,
      "batched and declarative encoder paths diverged")
  }

  test("the batched encoder takes the SIZED batches: full batches at " +
    "the bound, per-partition tails smaller, every row encoded " +
    "exactly once") {
    import graft.operators.{BatchedEncoder, BatchedHashEncoder}
    import scala.jdk.CollectionConverters._
    // force multi-batch partitions at toy corpus size by overriding
    // ONLY the sizing rule; the model function is the shared one
    val tiny = new BatchedEncoder {
      private val inner = new BatchedHashEncoder(16)
      val dim = 16
      override protected def batchRowsFor(h: Long): Int = 7
      def encodeBatch(texts: Seq[String]): Seq[Array[Double]] =
        inner.encodeBatch(texts)
    }
    BatchedEncoder.recordedBatchSizes.clear()
    BatchedEncoder.recordBatchSizes = true
    try {
      val n = EmbeddingStore.embedWith(tiny, t.documents).count()
      val sizes = BatchedEncoder.recordedBatchSizes.asScala
        .map(_.toInt).toSeq
      assert(sizes.sum === n.toInt, "batched rows != encoded rows")
      assert(sizes.forall(_ <= 7), s"batch over the bound: $sizes")
      assert(sizes.contains(7),
        "no full batch taken — grouping never exercised")
      // the production sizing derives from the measured per-core
      // budget: a non-overridden instance sizes by
      // Tuning.encoderBatchRows' documented derivation
      class Probe extends BatchedEncoder {
        val dim = 384
        def encodeBatch(ts: Seq[String]): Seq[Array[Double]] =
          ts.map(_ => new Array[Double](dim))
        def sized(h: Long): Int = batchRowsFor(h)
      }
      assert(new Probe().sized(1L << 30) ===
        graft.Tuning.encoderBatchRows(1L << 30, 384))
    } finally {
      BatchedEncoder.recordBatchSizes = false
      BatchedEncoder.recordedBatchSizes.clear()
    }
  }

  test("D8 + D21 serve through the conf-bound BATCHED encoder: the " +
    "persisted-index probe and the free-text search equal their " +
    "declarative-encoder twins") {
    import graft.operators.BatchedHashEncoder
    try {
      spark.conf.set(Encoder.classKey, "graft.operators.BatchedHashEncoder")
      spark.conf.set(Encoder.dimKey, "32")
      // D21: the free-text query chain (corpus AND query embed
      // through the batched path via the PUBLIC default entry point)
      val hits = EmbeddingStore.searchText(t, "the quick brown fox", 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val expect = EmbeddingStore.searchTextWith(HashingEncoder(32), t,
        "the quick brown fox", 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(hits === expect, "conf-bound batched D21 diverged")
      // D8: an IVF index built from batched-encoder vectors probes
      // identically to one built from the declarative twin
      val vecs = EmbeddingStore
        .embedWith(new BatchedHashEncoder(32), t.documents)
        .select(col("doc_id"), col("embedding"))
      val dirA = Files.createTempDirectory("graft-benc-ivf").toFile
      dirA.deleteOnExit()
      EmbeddingStore.buildIvfIndex(spark, vecs, dirA.getAbsolutePath)
      val got = EmbeddingStore.searchIvf(spark, dirA.getAbsolutePath,
        queryDocId = 0L, k = 10, probes = 4)
        .select(col("doc_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val dirB = Files.createTempDirectory("graft-denc-ivf").toFile
      dirB.deleteOnExit()
      EmbeddingStore.buildIvfIndex(spark,
        EmbeddingStore.embedWith(HashingEncoder(32), t.documents)
          .select(col("doc_id"), col("embedding")),
        dirB.getAbsolutePath)
      val want = EmbeddingStore.searchIvf(spark, dirB.getAbsolutePath,
        queryDocId = 0L, k = 10, probes = 4)
        .select(col("doc_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === want, "conf-bound batched D8 diverged")
    } finally {
      spark.conf.unset(Encoder.classKey)
      spark.conf.unset(Encoder.dimKey)
    }
  }

  test("conf-driven binding: a THIRD encoder loads via " +
    "graft.encoder.class with zero engine changes, the dim conf " +
    "selects the (dim: Int) constructor, and no conf means the " +
    "shipped default") {
    assert(Encoder.resolve(spark) === EmbeddingStore.defaultEncoder)
    try {
      // the (dim: Int) constructor path
      spark.conf.set(Encoder.classKey, "graft.TrigramEncoder")
      spark.conf.set(Encoder.dimKey, "48")
      assert(Encoder.resolve(spark) === TrigramEncoder(48))
      spark.conf.unset(Encoder.dimKey)
      // the no-arg constructor path, driven through the PUBLIC
      // default entry points — the engine never names the class
      spark.conf.set(Encoder.classKey, "graft.ByteFoldEncoder")
      val docs = t.documents.limit(50)
      val viaConf = EmbeddingStore.embed(docs)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
      val direct = EmbeddingStore.embedWith(new ByteFoldEncoder(), docs)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
      assert(viaConf === direct, "conf binding did not select the encoder")
      val hashed = EmbeddingStore.embedWith(HashingEncoder(16), docs)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
      assert(viaConf !== hashed, "third encoder indistinct — vacuous")
      // the search chain end-to-end under the conf binding
      val hits = EmbeddingStore.searchText(t, "the quick brown fox", 5)
        .collect()
      val expect = EmbeddingStore.searchTextWith(new ByteFoldEncoder(),
        t, "the quick brown fox", 5).collect()
      assert(hits.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
        expect.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    } finally {
      spark.conf.unset(Encoder.classKey)
      spark.conf.unset(Encoder.dimKey)
    }
  }
}
