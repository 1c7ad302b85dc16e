package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** A document's token count on the packer's wire. */
case class DocTokens(source: String, doc_id: Long, nt: Long)

/** Open-sequence state carried between micro-batches: the index of
  * the sequence currently filling, how many tokens it holds, and how
  * many docs have STARTED in it. */
case class OpenSeq(seq_idx: Long, tokens: Long, docs_started: Long)

/** A completed fixed-length training sequence. */
case class PackedSeq(source: String, seq_idx: Long, n_docs_started: Long)

/** Streaming counterpart of F12 `q_pack_sequences`
  * (TextAnalysis.packSequences): concat-and-chunk sequence packing as
  * a LIVE accumulator — per source, arriving documents' token counts
  * append to an open sequence held in keyed state; every time the
  * running total crosses the 2048-token boundary a `PackedSeq` is
  * emitted downstream (the signal a continual-training shard writer
  * consumes) and the overflow rolls into the next sequence, exactly
  * the batch operator's document-spanning rule. The open partial
  * sequence stays in state — it is not a completed shard yet.
  *
  * Ordering contract: a live packer packs in ARRIVAL order. Within a
  * micro-batch the group's iterator order is unspecified (it arrives
  * off a shuffle), so the handler sorts by doc_id — hence when input
  * arrives in doc_id order across batches (as in the backfill/test
  * harness), the emitted sequences reproduce the batch operator's
  * bins EXACTLY, closed-prefix for closed-prefix; under out-of-order
  * live traffic the semantics are arrival-order packing, the honest
  * streaming behavior (sequences already shipped cannot be repacked).
  *
  * Scale shape: state is ONE small record per source (the group key),
  * each micro-batch shuffles only its own slim (source, doc_id, nt)
  * rows, and tokenization runs before the shuffle — the same
  * scan-then-reduce shape as the batch side's first aggregate. The
  * low-cardinality group key concentrates per-batch iteration the
  * same way the batch side's naive window would; at production rates
  * the per-batch volume per source is bounded by the trigger
  * interval, which is what keeps the hot-key cost constant (the batch
  * side needs the two-level prefix sum precisely because it has no
  * such bound). */
object StreamingPacker {

  val seqLen: Long = 2048L

  private def pack(
      source: String,
      docs: Iterator[DocTokens],
      state: GroupState[OpenSeq]): Iterator[PackedSeq] = {
    val sorted = docs.toIndexedSeq.sortBy(_.doc_id)
    val out = ListBuffer.empty[PackedSeq]
    var open = state.getOption.getOrElse(OpenSeq(0L, 0L, 0L))
    sorted.foreach { d =>
      var tokens = open.tokens + d.nt
      var started = open.docs_started + 1
      var idx = open.seq_idx
      while (tokens >= seqLen) {
        out += PackedSeq(source, idx, started)
        tokens -= seqLen
        idx += 1
        started = 0
      }
      open = OpenSeq(idx, tokens, started)
    }
    state.update(open)
    out.iterator
  }

  /** Completed sequences as a streaming Dataset over a DIRECTORY of
    * documents parquet files (the streaming file source requires a
    * directory; `Tables`' single-file layout stages into one).
    * Tokenization mirrors the batch operator's BPE-ish regex, so
    * counts agree engine-wide. `maxFilesPerTrigger` bounds each
    * micro-batch (production backfill pacing; the recovery spec uses
    * it to force a multi-batch run it can kill mid-stream). */
  def sequences(spark: SparkSession, docsDir: String,
      maxFilesPerTrigger: Option[Int] = None): Dataset[PackedSeq] = {
    import spark.implicits._
    val schema = spark.read.parquet(docsDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    reader
      .parquet(docsDir)
      .select(col("source"), col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
          .cast(LongType).as("nt"))
      .as[DocTokens]
      .groupByKey(_.source)
      .flatMapGroupsWithState[OpenSeq, PackedSeq](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(pack)
  }

  /** Drain all currently-available input into an in-memory table
    * (test/dev harness; production writes the shard manifest to a
    * transactional sink with checkpointing). */
  def runAvailableNow(spark: SparkSession, docsDir: String, name: String): String = {
    val q = sequences(spark, docsDir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }
}
