package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tuning

/** The EXECUTED batched-inference encoder path — the `mapPartitions`
  * shape a real model wrapper runs (reference
  * src/core/embeddings/processor.py:174 batch-encodes through
  * all-MiniLM-L6-v2 at hardware_optimizer.py:87's derived
  * `embedding_batch_size`): partition rows group into model-call
  * batches sized by [[Tuning.encoderBatchRows]] from the MEASURED
  * per-core executor heap, and the model-shaped batch function
  * ([[encodeBatch]]: texts → one raw vector each) is invoked once per
  * batch. Until round 15 this shape lived only in the [[Encoder]]
  * scaladoc's production wrapper; this class executes it, so the
  * store → index → search chain is proven to run through a genuinely
  * batched encoder (EncoderSpec drives the public conf binding
  * through it and asserts the batch sizes actually taken).
  *
  * Scale shape: one `mapPartitions` pass — embarrassingly parallel in
  * the corpus, no shuffle, no driver involvement; the batch bound is
  * what keeps a transformer's activation footprint inside the
  * per-core budget at ANY corpus size. Determinism contract
  * ([[Encoder]]'s retry rule): [[encodeBatch]] must be a pure
  * function of the batch's texts, and because each vector depends
  * only on its own text, the GROUPING boundary cannot change results
  * — a retried task re-batches identically anyway (same partition,
  * same order). */
abstract class BatchedEncoder extends Encoder {

  /** The model call: one vector of [[dim]] raw components per input
    * text, positionally. Must be pure/deterministic per text. */
  def encodeBatch(texts: Seq[String]): Seq[Array[Double]]

  /** Rows per model call given the per-core heap budget — override
    * only in tests (to force multi-batch partitions at toy sizes);
    * production sizing is the measured-budget derivation. */
  protected def batchRowsFor(heapBytesPerCore: Long): Int =
    Tuning.encoderBatchRows(heapBytesPerCore, dim)

  def encodeRaw(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext.getConf
    val b = batchRowsFor(Tuning.heapPerCoreFrom(
      sc.getOption("spark.executor.memory"),
      sc.getOption("spark.executor.cores").map(_.toInt),
      spark.sparkContext.defaultParallelism,
      sc.getOption("spark.executor.instances").map(_.toInt)))
    require(b > 0, s"encoder batch must be positive, got $b")
    val record = BatchedEncoder.recordBatchSizes
    docs.select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(b).flatMap { batch =>
          if (record) BatchedEncoder.recordedBatchSizes.add(batch.length)
          val vecs = encodeBatch(batch.map(r => Option(r._2).getOrElse("")))
          require(vecs.length == batch.length,
            s"model returned ${vecs.length} vectors for ${batch.length} texts")
          batch.iterator.zip(vecs.iterator)
            .map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF("doc_id", "raw")
  }
}

object BatchedEncoder {
  /** Test-only observability of the batch sizes actually taken.
    * Local-mode diagnostic (tasks share the driver JVM only there —
    * a cluster deployment reads its own executor metrics instead);
    * disabled by default so nothing accumulates at scale. */
  @volatile private[graft] var recordBatchSizes: Boolean = false
  private[graft] val recordedBatchSizes =
    new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
}

/** [[HashingEncoder]]'s exact math executed through the BATCHED
  * `mapPartitions` path — same md5 bucket, same vote sign, same
  * cleaning/tokenization — so the declarative and batched paths are
  * mutually checking implementations of one model function
  * (EncoderSpec asserts vector-for-vector equality, then runs the
  * public search chain under this class via the conf binding). This
  * is the sandbox stand-in for the ONNX wrapper: swap
  * [[encodeBatch]]'s body for a model session call and nothing else
  * changes. */
final class BatchedHashEncoder(val dim: Int) extends BatchedEncoder {

  def encodeBatch(texts: Seq[String]): Seq[Array[Double]] =
    texts.map { t =>
      val v = new Array[Double](dim)
      // TextFunctions.cleanText then words, replicated locally (same
      // Java regex engine Spark's regexp_replace/split compile to)
      val cleaned = t
        .replaceAll("\\s+", " ")
        .replaceAll("https?://\\S+", "")
        .replaceAll("[^\\w\\s.,!?;:\\-'\"]", "")
        .trim
      val md = MessageDigest.getInstance("MD5")
      cleaned.toLowerCase.trim.split("\\s+").foreach { w =>
        md.reset()
        val h = md.digest(w.getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        val bucket = Integer.parseInt(h.substring(0, 6), 16) % dim
        v(bucket) += (if (h.charAt(6) <= '7') 1.0 else -1.0)
      }
      v
    }
}
