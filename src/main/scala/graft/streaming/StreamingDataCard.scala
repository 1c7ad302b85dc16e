package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.words
import graft.operators.TextAnalysis

/** LIVE data-card maintenance — the streaming sibling of F16's
  * per-source data card (`q_source_profile`): as document files land
  * in a drop directory, each micro-batch folds its per-source
  * partials (doc count, token volume, quality micro-sums) into a
  * persisted card table, so the "what is in this corpus" audit is
  * continuously current instead of a nightly batch job (the
  * reference's stats entry point, engine.py:228, served live).
  *
  * Spark-first, the poll loop disappears: `readStream` over the drop
  * dir IS the incremental scan, and the per-source partials are the
  * SAME additive integer sums batch uses — tokens = F3's whitespace
  * rule, quality = F2's [[TextAnalysis.qualityExpr]] in integer
  * micro-units (empty-text NULLs drop from sum AND count), so the
  * folded card equals a batch recompute over everything ingested,
  * exactly (StreamingSpec reconciles; column-for-column the F16
  * subset that is additively foldable — the dup rate and language
  * majority are NOT, by design: exact-dup needs cross-batch text
  * hashes, which is StreamingDeduper's keyed-state job, and a
  * majority cannot fold without per-language counts, which the card
  * table would carry in production).
  *
  * Exactly-once: the StreamingVectorIngest recipe — foreachBatch +
  * last-committed-batchId marker beside the card; the new card
  * writes to a staged sibling then swaps by rename, so a reader
  * never sees a half-written table, and a crash-replayed micro-batch
  * skips instead of double-folding. The usual plain-filesystem crash
  * window between rename and marker applies (see
  * `advanceDedupState`'s transactional-table note). */
object StreamingDataCard {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def lastCommitted(cardPath: String): Long = {
    val f = java.nio.file.Paths.get(cardPath, "_STREAM_BATCH")
    if (java.nio.file.Files.exists(f))
      java.nio.file.Files.readString(f).trim.toLong
    else -1L
  }

  /** The additive per-source partials of a document frame — the ONE
    * fold rule both the micro-batch side and the spec's batch
    * reconciliation use. */
  private[graft] def partials(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      size(words(col("text"))).cast(LongType).as("toks"),
      round(TextAnalysis.qualityExpr * 1e6, 0).cast(LongType).as("q_mu"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("q_mu")).as("q_sum"),
        count(col("q_mu")).as("q_n"))

  /** Read the current card (an empty frame with the right schema if
    * nothing has been ingested yet — a missing state dir must read
    * as "no sources", not throw): per source, docs, tokens, mean
    * tokens and the F16-exact mean quality. */
  def readCard(spark: SparkSession, cardPath: String): DataFrame = {
    val stateSchema =
      "source STRING, n_docs LONG, n_tokens LONG, q_sum LONG, q_n LONG"
    val cardDir = new java.io.File(cardPath, "card")
    val state =
      if (cardDir.exists())
        spark.read.schema(stateSchema).parquet(cardDir.getPath)
      else
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType.fromDDL(stateSchema))
    state.select(col("source"), col("n_docs"), col("n_tokens"),
      round(col("n_tokens").cast("double") /
        col("n_docs").cast("double"), 6).as("mean_tokens"),
      round(col("q_sum").cast("double") / col("q_n").cast("double") /
        lit(1e6), 6).as("mean_quality"))
      .orderBy(col("source"))
  }

  /** Start the card maintenance over a document drop directory.
    * Trigger semantics as in [[StreamingVectorIngest.run]]. */
  def run(spark: SparkSession, inputDir: String, cardPath: String,
      checkpointDir: String, availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cardPath))
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val docs = reader.parquet(inputDir)
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastCommitted(cardPath) && !batch.isEmpty) {
          val cardDir = new java.io.File(cardPath, "card")
          val delta = partials(batch)
          val merged =
            if (cardDir.exists()) {
              val prev = spark.read
                .schema("source STRING, n_docs LONG, n_tokens LONG, q_sum LONG, q_n LONG")
                .parquet(cardDir.getPath)
              prev.unionByName(delta)
                .groupBy(col("source"))
                .agg(sum(col("n_docs")).as("n_docs"),
                  sum(col("n_tokens")).as("n_tokens"),
                  sum(col("q_sum")).as("q_sum"),
                  sum(col("q_n")).as("q_n"))
            } else delta
          // staged swap: never mutate the table a reader might hold
          val next = new java.io.File(cardPath, s"card_next_$batchId")
          merged.write.mode("overwrite").parquet(next.getPath)
          graft.sources.LayoutStore.deleteRecursively(cardDir)
          require(next.renameTo(cardDir),
            s"card swap failed: $next -> $cardDir")
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(cardPath, "_STREAM_BATCH"),
            batchId.toString)
          ()
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
