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

  /** The encoder INFERENCE batch: rows per model call inside a
    * `mapPartitions` encoder (the sizing
    * [[graft.operators.BatchedEncoder]] executes — reference
    * hardware_optimizer.py:87-131 steps `embedding_batch_size`
    * 32→256 by hardware tier and caps a memory fraction; here the
    * same decision derives from the MEASURED per-core executor
    * budget). Transformer activations dominate a batch's footprint:
    * ~4 bytes × tokens × hidden per row in flight plus the output
    * row, and a quarter of the per-core heap is the batch's budget
    * (the update path's fraction), bounded to [16, 4096] — the
    * floor keeps per-call model overhead amortized on tiny
    * executors, the cap is past where batching stops helping on
    * CPU (the reference's own top tier is 256).
    *
    * Per-OPERATOR, per-SESSION: an executor running 384-dim MiniLM
    * on an 8 GB/8-core executor gets
    * `encoderBatchRows(1 GiB, 384)` ≈ 680 → 680-row model calls,
    * while a 2 GB/4-core executor lands ~340 — sized, not guessed. */
  def encoderBatchRows(heapBytesPerCore: Long, dim: Int,
      tokensPerDoc: Int = 256, hiddenWidth: Int = 384): Int = {
    require(heapBytesPerCore > 0 && dim > 0 &&
      tokensPerDoc > 0 && hiddenWidth > 0)
    val perRowBytes = 4L * (tokensPerDoc.toLong * hiddenWidth + dim)
    math.max(16L, math.min(4096L,
      heapBytesPerCore / 4 / perRowBytes)).toInt
  }

  /** Parse a Spark memory string to bytes. Spark's own suffix table
    * (JavaUtils.byteSuffixes) accepts BOTH the one- and two-letter
    * forms — "4g" and "4gb", up to "p"/"pb" — so this must too
    * (matching on the last char alone read "4gb" as 4 bytes of "4g"
    * and threw). Longest suffix wins; bare numbers are MiB, the
    * Spark memory-conf convention. */
  private[graft] def memoryBytes(s: String): Long = {
    val t = s.trim.toLowerCase
    val suffixes = Seq(
      "kb" -> (1L << 10), "mb" -> (1L << 20), "gb" -> (1L << 30),
      "tb" -> (1L << 40), "pb" -> (1L << 50),
      "k" -> (1L << 10), "m" -> (1L << 20), "g" -> (1L << 30),
      "t" -> (1L << 40), "p" -> (1L << 50), "b" -> 1L)
    suffixes.collectFirst {
      case (suf, mult) if t.endsWith(suf) && t.length > suf.length =>
        (t.dropRight(suf.length).toDouble * mult).toLong
    }.getOrElse((t.toDouble * (1L << 20)).toLong)
  }

  /** Detect this SESSION's resources and derive the recommendation
    * for a data directory. The per-core budget is the EXECUTOR
    * heap over the executor's task slots — read from
    * `spark.executor.memory` / `spark.executor.cores` when the
    * session declares them (any real cluster); only a local[*]
    * session, where the driver JVM IS the executor, falls back to
    * this JVM's heap over its slots. Data size is one stat walk,
    * EXCLUDING derived layouts (`_graft_layouts` holds indexes and
    * scaling replicas — derived storage must not inflate the
    * shuffle sizing of the data it derives from). */
  /** The executor per-core heap budget: declared executor resources
    * when the session has them (any real cluster), else this JVM's
    * heap over its slots (local mode, where the driver IS the one
    * executor). Pure so the cluster branch is testable — executor
    * confs are immutable on a live session. */
  private[graft] def heapPerCoreFrom(execMemory: Option[String],
      execCores: Option[Int], defaultParallelism: Int,
      execInstances: Option[Int] = None,
      jvmHeap: => Long = Runtime.getRuntime.maxMemory()): Long =
    (execMemory.map(memoryBytes), execCores) match {
      case (Some(h), Some(c)) => math.max(1L, h / math.max(1, c))
      // memory declared but cores not (e.g. standalone mode, where an
      // executor takes the whole worker): defaultParallelism is
      // CLUSTER-wide, so h (ONE executor's heap) must be divided by
      // one executor's SLOTS — parallelism over the declared instance
      // count. With no instance count either, the cluster-wide
      // division stands as a documented conservative understatement
      // (budget shrinks toward the floors by the executor count; the
      // knobs only ever get smaller/safer, never oversized).
      case (Some(h), None) =>
        val slots = math.max(1, defaultParallelism /
          math.max(1, execInstances.getOrElse(1)))
        math.max(1L, h / slots)
      // cores declared but memory not: a real cluster whose executors
      // run Spark's documented 1g default — dividing the DRIVER's
      // heap by cluster-wide parallelism here would collapse the
      // per-core budget to its floors (the mis-sizing this derivation
      // exists to prevent)
      case (None, Some(c)) => math.max(1L, (1L << 30) / math.max(1, c))
      case _ => math.max(1L, jvmHeap / math.max(1, defaultParallelism))
    }

  def recommendFor(spark: SparkSession, dataDir: String): Recommendation = {
    val sc = spark.sparkContext.getConf
    val heapPerCore = heapPerCoreFrom(
      sc.getOption("spark.executor.memory"),
      sc.getOption("spark.executor.cores").map(_.toInt),
      spark.sparkContext.defaultParallelism,
      sc.getOption("spark.executor.instances").map(_.toInt))
    def sizeOf(f: java.io.File): Long =
      if (f.isFile) f.length()
      else if (f.getName == "_graft_layouts") 0L
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .map(sizeOf).sum
    recommend(spark.sparkContext.defaultParallelism, heapPerCore,
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
