package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions.words
import graft.operators.TextAnalysis

/** H1 — `q_export_manifest`: the pipeline's SINK — materialize the
  * curated corpus (F9's kept documents) as split/source-partitioned
  * parquet, then report the manifest a downstream training job (or a
  * data card) consumes: per partition, document count, token volume
  * and an order-insensitive id checksum.
  *
  * The manifest aggregates the READ-BACK files, not the pre-write
  * frame — the row fails if the write half-runs, drops rows, or
  * mangles the partition columns (the advance-day read-back
  * discipline applied to the export sink), and recomputing
  * `n_tokens` from the read-back text proves the text column
  * round-trips byte-exact through the partitioned layout.
  *
  * Scale shape: the write is Spark's standard partitioned-parquet
  * sink (one shuffle-free pass over the kept frame; at 100 TB the
  * partition columns bound file counts to splits × sources ×
  * tasks); the manifest is a map-side-combining aggregate over the
  * same data. The id checksum is `bit_xor` — order-insensitive and
  * overflow-free, so it replays identically in DuckDB with no
  * collect_list anywhere (a sorted-concat hash would serialize each
  * partition's ids through one reducer). The temp store deletes
  * after the 1-row-per-partition manifest pins (searchRefreshQuery's
  * cleanup discipline).
  *
  * (Reference posture: the reference persists its curated artifact —
  * the embedding store — and serves stats about it, engine.py:228;
  * this is the batch-corpus equivalent of that persist-then-report
  * cycle.)
  */
object Export {

  def exportManifest(t: Tables): DataFrame = {
    val spark = t.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-export")
    val out = s"$dir/corpus"
    TextAnalysis.pipelineKeptDocs(t)
      .join(t.documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("text"), col("split"), col("source"))
      .write.partitionBy("split", "source").parquet(out)
    val manifest = spark.read.parquet(out)
      .select(col("split"), col("source"), col("doc_id"),
        size(words(col("text"))).cast(LongType).as("toks"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        expr("bit_xor(doc_id)").as("id_xor"))
      .orderBy(col("split"), col("source"))
      .localCheckpoint(true)
    LayoutStore.deleteRecursively(dir.toFile)
    manifest
  }
}
