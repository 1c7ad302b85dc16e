package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** G1 — multimodal payload plumbing. Image/audio/video assets ride
  * through the pipeline as opaque `binary` columns plus typed
  * metadata; all Spark-side mechanics (binary casts, byte lengths,
  * content hashing, per-row decode, grouped rollups) are real and
  * oracle-checked, while the decode itself is a clearly-marked
  * deterministic STUB (`stubDecode`) — no media libraries exist in
  * this container. In production the stub body is the only thing that
  * changes: swap the arithmetic for an image decoder inside the same
  * per-row column contract (or a `mapPartitions` batch decoder for
  * vectorized codecs) and every downstream plan is unchanged.
  */
object Multimodal {

  /** STUB decoder: derives fake "decoded dimensions" from the payload
    * byte length. Deterministic + engine-portable, so the oracle can
    * replay it; replace with a real codec at the same signature. */
  def stubDecode(nBytes: Column): (Column, Column) =
    ((nBytes % 640).cast(LongType), ((nBytes * 7) % 480).cast(LongType))

  /** Per-payload typed metadata, then a per-source rollup — the shape
    * of a media-corpus inventory pass: bytes, distinct-content counts
    * (md5 identity), and stub-decoded dimensions. Everything before
    * the single groupBy is per-row at scan speed. */
  def multimodalMeta(t: Tables): DataFrame = {
    val payload = col("text").cast("binary")
    val nBytes = length(payload).cast(LongType)
    val (w, h) = stubDecode(nBytes)
    val meta = t.documents.select(
      col("doc_id"), col("source"),
      payload.as("payload"),
      nBytes.as("n_bytes"),
      md5(payload).as("payload_md5"),
      w.as("stub_width"), h.as("stub_height"))
    meta
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("payload_md5")).as("n_uniq_payloads"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        sum(col("stub_width") * col("stub_height")).as("stub_pixels"))
      .orderBy(col("source"))
  }
}
