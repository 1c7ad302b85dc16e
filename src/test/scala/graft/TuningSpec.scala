package graft

import org.scalatest.funsuite.AnyFunSuite

/** The hardware/data-adaptive conf derivation (the reference's
  * hardware_optimizer analog): pure-function properties plus the
  * live-session application path. */
class TuningSpec extends AnyFunSuite {

  private val GiB = 1L << 30
  private val MiB = 1L << 20

  test("shuffle partitions: one wave minimum, data-proportional, capped") {
    // tiny data: floor at the core count (one task wave)
    assert(Tuning.recommend(32, 4 * GiB, 10 * MiB).shufflePartitions === 32)
    // big data: ~dataBytes / target, so a full shuffle's partitions
    // stay ~64 MB at ANY corpus size (100 TB -> ~1.6M, capped)
    val r1tb = Tuning.recommend(1000, 4 * GiB, 1L << 40)
    assert(r1tb.shufflePartitions === math.ceil((1L << 40).toDouble /
      Tuning.targetPartitionBytes).toInt)
    val r100tb = Tuning.recommend(1000, 4 * GiB, 100L << 40)
    assert(r100tb.shufflePartitions === Tuning.maxShufflePartitions)
    // monotone in data
    assert(r100tb.shufflePartitions >= r1tb.shufflePartitions)
  }

  test("scan split and update batch follow the per-core budget") {
    // roomy core: the 128 MB default is optimal
    assert(Tuning.recommend(32, 4 * GiB, GiB).maxPartitionBytes === 128L * MiB)
    // tight core (256 MB): splits shrink to a quarter-budget
    assert(Tuning.recommend(32, 256 * MiB, GiB).maxPartitionBytes === 64L * MiB)
    // never below the parquet-overhead floor
    assert(Tuning.recommend(32, 1 * MiB, GiB).maxPartitionBytes === 16L * MiB)
    // update batch: scales with cores and budget, floored at the
    // reference's conservative default
    assert(Tuning.recommend(1, 8192 * 100, GiB).updateBatchRows === 1000)
    val small = Tuning.recommend(8, 1 * GiB, GiB).updateBatchRows
    val big = Tuning.recommend(32, 4 * GiB, GiB).updateBatchRows
    assert(big > small && small >= 1000)
  }

  test("applyTo sets the runtime knobs on a live session") {
    val spark = SparkTestBase.spark
    // restore EVERY touched conf — the session is shared JVM-wide,
    // and a leaked maxPartitionBytes would change scan partition
    // counts for every suite that runs after this one
    val beforeShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val beforeSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      val r = Tuning.applyTo(spark, "/root/testdata/sf0.001")
      assert(spark.conf.get("spark.sql.shuffle.partitions") ===
        r.shufflePartitions.toString)
      assert(spark.conf.get("spark.sql.files.maxPartitionBytes") ===
        r.maxPartitionBytes.toString)
      // tiny fixture on a local session: one task wave
      assert(r.shufflePartitions === spark.sparkContext.defaultParallelism)
      assert(r.updateBatchRows >= 1000)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", beforeShuffle)
      spark.conf.set("spark.sql.files.maxPartitionBytes", beforeSplit)
    }
  }

  test("memoryBytes parses Spark memory strings; the per-core budget honors " +
    "declared executor resources over the driver JVM") {
    assert(Tuning.memoryBytes("4g") === 4L * GiB)
    assert(Tuning.memoryBytes("512m") === 512L * MiB)
    assert(Tuning.memoryBytes("2048") === 2048L * MiB)
    assert(Tuning.memoryBytes("1t") === 1L << 40)
    // Spark's JavaUtils accepts the TWO-letter forms too ("4gb") and
    // the PiB suffixes — matching on the last char alone read "4gb"
    // as 4 bytes of "4g" and threw NumberFormatException on a legal
    // spark.executor.memory value
    assert(Tuning.memoryBytes("4gb") === 4L * GiB)
    assert(Tuning.memoryBytes("512mb") === 512L * MiB)
    assert(Tuning.memoryBytes("2kb") === 2048L)
    assert(Tuning.memoryBytes("1tb") === 1L << 40)
    assert(Tuning.memoryBytes("1p") === 1L << 50)
    assert(Tuning.memoryBytes("1pb") === 1L << 50)
    assert(Tuning.memoryBytes("1048576b") === 1L * MiB)
    // cluster: 16g executors x 8 cores => 2 GiB/core from the
    // DECLARED resources, regardless of this (driver) JVM's heap —
    // dividing driver heap by cluster-wide cores was the bug this
    // pins against (it collapsed every knob to its floor)
    assert(Tuning.heapPerCoreFrom(Some("16g"), Some(8),
      defaultParallelism = 400, jvmHeap = 4L * GiB) === 2L * GiB)
    // executor memory declared without cores: divide by parallelism
    assert(Tuning.heapPerCoreFrom(Some("8g"), None,
      defaultParallelism = 8, jvmHeap = 1L * GiB) === 1L * GiB)
    // ...but when the instance count IS declared (standalone mode
    // with spark.executor.instances), h is ONE executor's heap and
    // must be divided by one executor's slots, not cluster-wide
    // parallelism — 50 executors x 8 slots, 8g each => 1 GiB/core,
    // not 20 MiB/core
    assert(Tuning.heapPerCoreFrom(Some("8g"), None,
      defaultParallelism = 400, execInstances = Some(50),
      jvmHeap = 1L * GiB) === 1L * GiB)
    // cores declared but memory not: a real cluster on Spark's 1g
    // executor-memory default — the driver heap over cluster-wide
    // parallelism (the old fallthrough) would collapse the budget to
    // ~2.6 MB/core on a 400-slot cluster
    assert(Tuning.heapPerCoreFrom(None, Some(8),
      defaultParallelism = 400, jvmHeap = 1L * GiB) === (1L * GiB) / 8)
    // local mode: the driver JVM is the one executor
    assert(Tuning.heapPerCoreFrom(None, None,
      defaultParallelism = 4, jvmHeap = 8L * GiB) === 2L * GiB)
  }

  test("encoderBatchRows sizes the inference batch from the per-core " +
    "budget, bounded to [16, 4096], monotone in memory") {
    val GiB = 1L << 30
    // 1 GiB/core at MiniLM geometry (256 tokens × 384 hidden):
    // 268435456 / (4 × (256×384 + 384)) ≈ 680 rows
    assert(Tuning.encoderBatchRows(1L * GiB, 384) === 680)
    // half the budget → half the batch (integer floor)
    assert(Tuning.encoderBatchRows(GiB / 2, 384) === 340)
    // a tiny executor floors at 16, never 0
    assert(Tuning.encoderBatchRows(1L << 20, 384) === 16)
    // a huge budget caps at 4096
    assert(Tuning.encoderBatchRows(64L * GiB, 384) === 4096)
    // longer documents shrink the batch
    assert(Tuning.encoderBatchRows(1L * GiB, 384, tokensPerDoc = 512) <
      Tuning.encoderBatchRows(1L * GiB, 384, tokensPerDoc = 256))
    assertThrows[IllegalArgumentException](Tuning.encoderBatchRows(0, 384))
  }
}
