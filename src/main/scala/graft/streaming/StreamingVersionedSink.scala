package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sources.{Export, TableFormat}

/** Micro-batch commits through the VERSIONED TABLE — the streaming
  * exactly-once discipline unified with the table-format core
  * (StreamingDataCard predates sources/TableFormat and carries its
  * own pointer swap; this sink is the composition the round-15
  * verdict asked for, and the one a new stream should use).
  *
  * Generation mapping: generation g = the table state after batches
  * 0..g−1. Batch b MERGES (latest-wins on the key, H8's rule) into
  * generation b and commits the result as generation b+1 via
  * [[TableFormat.tryCommitGen]] with expected = b. Exactly-once
  * falls out of OCC: foreachBatch is at-least-once, and a
  * crash-replayed batch b finds currentGen > b and commits NOTHING —
  * the skip costs one pointer read, no data write. A mid-stream
  * reader time-travels ANY committed generation (H12) while the
  * stream runs, because commits never touch older generations, and
  * the retention sweep (H15) bounds the history exactly as for a
  * batch-written table.
  *
  * Scale shape: each batch is one key-shuffle merge (anti join +
  * union) over state ∪ delta plus one staged write — the same cost
  * as H8 per batch; the OCC critical section is check + two renames
  * (data-size independent). Single-writer by contract: one stream
  * owns one table root (Spark already serializes batches within a
  * query); a second concurrent writer loses the OCC race loudly. */
object StreamingVersionedSink {

  /** One micro-batch's commit; returns true iff THIS call advanced
    * the table. Exposed for the replay spec — foreachBatch is
    * at-least-once, so the spec drives a literal duplicate delivery
    * and asserts the no-op. A lock found while the table still sits
    * at this batch's generation is crash debris from a killed run of
    * this same stream (single-writer contract; a kill -9 skips the
    * lock's finally) — healed by the lease rule, then one retry. */
  private[graft] def commitBatch(root: String, schema: StructType,
      key: String, lockStaleMillis: Long = 600000L)(
      batch: DataFrame, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    if (TableFormat.currentGen(root) != batchId) false // replayed: done
    else {
      val prev = TableFormat.readGen(spark, root, batchId, schema)
      // within-batch duplicates collapse BEFORE the merge: an
      // at-least-once source can repeat a key inside one batch, and
      // mergeLatest's contract is key-unique sides
      val delta = batch
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        .dropDuplicates(key)
      val merged = Export.mergeLatest(prev, delta, key)
      var ok = TableFormat.tryCommitGen(merged, root, expected = batchId)
      if (!ok && TableFormat.currentGen(root) == batchId) {
        TableFormat.healLock(root, lockStaleMillis)
        ok = TableFormat.tryCommitGen(merged, root, expected = batchId)
      }
      require(ok, s"versioned-table commit failed at generation " +
        s"$batchId — a second writer is racing on $root, or a crash " +
        s"lock younger than ${lockStaleMillis}ms is still leased")
      ok
    }
  }

  /** Ensure the table exists at generation 0 — the committed EMPTY
    * state, so batch 0's merge and every H12 read have a base. */
  private[graft] def init(spark: SparkSession, root: String,
      schema: StructType): Unit = {
    Files.createDirectories(Paths.get(root))
    if (!Files.exists(Paths.get(root, "_GEN")))
      TableFormat.commitGen(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        root, 0L)
  }

  /** Start the stream: parquet drops under `inputDir` merge into the
    * versioned table at `root`, one committed generation per
    * micro-batch. Trigger semantics as in the other B6 sinks. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, schema: StructType, key: String,
      availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    init(spark, root, schema)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val rows = reader.parquet(inputDir)
    val writer = rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(root, schema, key)(batch, batchId)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
