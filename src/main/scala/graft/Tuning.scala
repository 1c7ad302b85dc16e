package graft

import org.apache.spark.sql.SparkSession

/** Hardware/data-adaptive session tuning — the Spark analog of the
  * reference's hardware optimizer (hardware_optimizer.py:28-199:
  * detect cores/memory, derive embedding/processing batch sizes and
  * worker counts). On Spark the knobs worth deriving are the ones
  * Catalyst does NOT adapt at runtime:
  *
  *  - `spark.sql.shuffle.partitions` — the pre-AQE upper bound for
  *    every exchange. AQE COALESCES down from it but never splits
  *    up past it, so it must start high enough that a full-corpus
  *    shuffle partition fits in an executor core's working memory,
  *    and low enough that a tiny job isn't 10k empty tasks. Rule:
  *    clamp(ceil(shuffleBytes / targetPartitionBytes), cores,
  *    maxPartitions).
  *  - `spark.sql.files.maxPartitionBytes` — scan-split sizing; the
  *    default 128 MB is right until per-core memory is tight, then
  *    it shrinks with the per-core budget.
  *  - the UPDATE BATCH bound (`updateSince(maxDocs)`) — the
  *    reference's `processing_batch_size`: rows per bounded
  *    incremental call, from the per-core budget and an estimated
  *    row width.
  *
  * Everything here is a PURE function of (cores, memory, data size),
  * so it is spec-checkable and portable; [[applyTo]] sets only
  * runtime-settable confs on a live session, the rest are returned
  * for spark-submit. Static heuristics, deliberately conservative —
  * the point is a programmatic, tested derivation instead of conf
  * folklore (SURVEY §8's guidance, enforced). */
object Tuning {

  /** ~AQE's advisory partition size default; a shuffle partition this
    * big deserializes comfortably inside a multi-hundred-MB per-core
    * budget. */
  val targetPartitionBytes: Long = 64L << 20

  /** Backstop against task-launch overhead swamping tiny work. */
  val maxShufflePartitions: Int = 200000

  final case class Recommendation(
      shufflePartitions: Int,
      maxPartitionBytes: Long,
      updateBatchRows: Int) {
    def asConf: Map[String, String] = Map(
      "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
      "spark.sql.files.maxPartitionBytes" -> maxPartitionBytes.toString)
  }

  /** Derive the recommendation from first principles:
    * @param totalCores   cluster task slots (local[n]: n)
    * @param heapBytesPerCore executor heap divided by its task slots
    * @param dataBytes    the size of the largest table the job
    *                     shuffles (0 = unknown: cores-based floor)
    * @param rowBytes     estimated on-heap row width for the bounded
    *                     update path (text + vector, generous) */
  def recommend(totalCores: Int, heapBytesPerCore: Long, dataBytes: Long,
      rowBytes: Long = 8192): Recommendation = {
    require(totalCores > 0 && heapBytesPerCore > 0 && rowBytes > 0)
    // shuffle partitions: every partition of a full-data shuffle
    // should be ~targetPartitionBytes, floored at one wave of tasks,
    // capped at the scheduler-sanity backstop
    val byData = math.ceil(dataBytes.toDouble / targetPartitionBytes).toLong
    val shuffle = math.min(maxShufflePartitions.toLong,
      math.max(totalCores.toLong, byData)).toInt
    // scan splits: default 128 MB while a core can hold ~4 splits'
    // decoded data, else shrink to a quarter of the per-core budget
    // (never below 16 MB — parquet footer overhead dominates there)
    val maxPart = math.max(16L << 20,
      math.min(128L << 20, heapBytesPerCore / 4))
    // bounded-update rows per call: one core's quarter-budget of rows
    // across the cluster's cores, floored at the reference's
    // conservative default (processing_batch_size = 1000)
    val batch = math.max(1000L,
      math.min(Int.MaxValue.toLong,
        heapBytesPerCore / 4 / rowBytes * totalCores)).toInt
    Recommendation(shuffle, maxPart, batch)
  }

  /** Detect this JVM/session's resources and derive the
    * recommendation for a data directory (size = one stat walk). */
  def recommendFor(spark: SparkSession, dataDir: String): Recommendation = {
    val cores = spark.sparkContext.defaultParallelism
    val heap = Runtime.getRuntime.maxMemory()
    def sizeOf(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .map(sizeOf).sum
    recommend(cores, math.max(1L, heap / math.max(1, cores)),
      sizeOf(new java.io.File(dataDir)))
  }

  /** Apply the runtime-settable knobs to a live session (both are
    * read per query, so this takes effect immediately); returns the
    * recommendation so callers can thread `updateBatchRows` into
    * their bounded-update loops. */
  def applyTo(spark: SparkSession, dataDir: String): Recommendation = {
    val r = recommendFor(spark, dataDir)
    r.asConf.foreach { case (k, v) => spark.conf.set(k, v) }
    r
  }
}
