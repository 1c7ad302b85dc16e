package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** The reference's embedding pipeline re-expressed Spark-first
  * (reference: src/core/embeddings/processor.py:174 `_generate_
  * embeddings_batch` — batch-encode cleaned message text — and :326
  * `store_embeddings` — persist vectors for later search; engine.py:57
  * `update_embeddings` runs it incrementally from a watermark).
  *
  * No model exists in this sandbox, so the encoder is deterministic
  * FEATURE HASHING (the standard model-free text embedding): each
  * token votes ±1 into one of `dim` md5-addressed buckets, the vector
  * is L2-normalized. The encoder is a stand-in; everything around it —
  * clean → tokenize → batch-embed → normalized float vectors →
  * shard-partitioned parquet store → incremental append → cosine
  * search over the store — is the production DataFrame shape, and
  * near-duplicate documents measurably embed to near-parallel vectors
  * (the property the reference's search relies on).
  *
  * Scale shape: embedding is explode + two keyed aggregations (both
  * map-side-combining, keyed on doc_id — parallel in the corpus);
  * the store is written partitioned by shard so incremental appends
  * create new files without rewriting history, and search reads
  * stream through the codegen'd cosine expression.
  */
object EmbeddingStore {

  val dim = 64
  val numShards = 16

  /** Batch-embed cleaned document text → (doc_id, shard, embedding
    * float[dim], norm 1). */
  def embed(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(words(cleanText(col("text")))).as("w"))
      .select(col("doc_id"), md5(col("w")).as("h"))
      .select(col("doc_id"),
        (conv(substring(col("h"), 1, 6), 16, 10).cast("int") % dim).as("bucket"),
        when(substring(col("h"), 7, 1) <= "7", 1.0).otherwise(-1.0).as("sign"))
    val sums = tok.groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("v"))
    val dense = sums.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("raw"))
    dense
      .select(col("doc_id"),
        transform(col("raw"), x => x / sqrt(aggregate(col("raw"), lit(0.0),
          (acc, y) => acc + y * y))).cast("array<float>").as("embedding"))
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(numShards)).as("shard"), col("embedding"))
  }

  /** Persist (or append) embeddings shard-partitioned — the vector
    * store (reference processor.py:326). */
  def store(vectors: DataFrame, path: String, append: Boolean = false): Unit =
    vectors.write
      .mode(if (append) "append" else "overwrite")
      .partitionBy("shard")
      .parquet(path)

  /** Incremental update from a doc_id watermark (the reference keys
    * incrementality on last-processed timestamp, engine.py:57; the
    * documents table has no timestamp, so doc_id is the watermark
    * column). Only new docs are embedded and appended. */
  def updateSince(t: Tables, path: String, sinceDocId: Long): Unit =
    store(embed(t.documents.filter(col("doc_id") > sinceDocId)), path, append = true)

  /** Cosine top-k over the store for a query vector taken from the
    * store itself (reference search_similar_messages, processor.py:436,
    * with the query embedded at search time). */
  def search(spark: SparkSession, path: String, queryDocId: Long, k: Int): DataFrame = {
    val store = spark.read.parquet(path)
    val qv = store.filter(col("doc_id") === queryDocId)
      .select(col("embedding").as("qv"))
    store
      .filter(col("doc_id") =!= queryDocId)
      .join(broadcast(qv))
      .select(col("doc_id"),
        round(cosineSim(col("embedding"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
