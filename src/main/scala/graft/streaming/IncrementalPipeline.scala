package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** B6 — the reference's incremental update loop as Structured
  * Streaming (reference: src/core/search/engine.py:57
  * `update_embeddings` polls for messages newer than the stored
  * watermark and processes them in batches; processor.py:320 is the
  * batched scan). Spark-first, the loop disappears: `readStream` over
  * the event directory IS the incremental scan, the event-time
  * watermark replaces the stored `last_processed_timestamp`
  * (processor.py:78), and the same tumbling-window aggregation used in
  * batch (EventOps.timeWindow) runs unchanged on the stream.
  *
  * At scale this is the production shape: new parquet files land in
  * the directory, each micro-batch reads only new files
  * (IncrementalStreamSpec proves a checkpointed restart processes only
  * the delta), state for open windows lives in the state store, and a
  * production sink runs in APPEND mode so the watermark closes windows
  * exactly once. The `runAvailableNow` harness below instead uses
  * COMPLETE mode deliberately: a one-shot drain never advances the
  * watermark past its own data, so append mode would emit nothing —
  * complete mode lets the test reconcile every window against batch.
  */
object IncrementalPipeline {

  /** Streaming hourly counts per event type with a 2-hour watermark.
    * Watermarks require TIMESTAMP (never NTZ) — EventStream supplies
    * one whose epoch micros equal the batch NTZ wall-clock, and the
    * output hour_start converts back to TIMESTAMP_NTZ with the same
    * epoch arithmetic, so stream output equals batch
    * (EventOps.timeWindow) in ANY session timezone. */
  def hourlyCounts(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    EventStream.read(spark, inputDir, maxFilesPerTrigger)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(EventStream.ntzFromEpochMicros(col("window.start")).as("hour_start"),
        col("event_type"), col("n"))
  }

  /** Streaming exact-dedup on the event stream: duplicate event_ids
    * arriving within the watermark horizon are dropped from keyed
    * state (`dropDuplicatesWithinWatermark`) — the streaming
    * counterpart of E1 exact dedup and the production answer to
    * at-least-once upstream delivery. State holds one small record
    * per event_id seen inside the 2-hour horizon and is evicted as
    * the watermark passes — bounded regardless of stream length,
    * partitioned by the dedup key across executors. Emits in append
    * mode (rows emit on first sight; no window to close). */
  def dedupedEvents(spark: SparkSession, inputDir: String): DataFrame =
    EventStream.read(spark, inputDir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      // back to the library-wide NTZ event time (EventStream's output
      // contract) so the deduped stream reconciles with batch
      // Tables.events in any session timezone
      .withColumn("ts", EventStream.ntzFromEpochMicros(col("ts")))

  /** Drain the deduped stream into a memory sink (test/dev harness). */
  def runDedupAvailableNow(spark: SparkSession, inputDir: String,
      name: String): String = {
    val q = dedupedEvents(spark, inputDir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }

  /** Drain all currently-available input into an in-memory table
    * (test/dev harness; production would write a parquet/Delta sink
    * with `append` + checkpointing). Returns the sink table name. */
  def runAvailableNow(spark: SparkSession, inputDir: String, name: String): String = {
    val q = hourlyCounts(spark, inputDir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }
}
