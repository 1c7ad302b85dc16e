package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Explicit Bloom pre-join pruning for selective semi/anti joins.
  *
  * AQE's runtime Bloom filter (proven injectable for the library's
  * join keys in RuntimeFilterSpec) only fires when its own thresholds
  * and plan patterns line up; this is the same optimization as a
  * LIBRARY PRIMITIVE the caller controls: build a Bloom filter over
  * the build side's join keys (distributed partial filters, one
  * driver merge — the same treeAggregate shape AQE's creation side
  * uses), embed it in the plan as a literal, and pre-filter the probe
  * side with Spark's own codegen'd `BloomFilterMightContain`
  * expression BEFORE the join. At 100 TB the win is shuffle volume:
  * a 1% -selective semi join shuffles ~1% of the fact table instead
  * of all of it, for the cost of a ~1.2 MB filter per 1M build keys
  * (fpp 0.01). The build side must be the SMALL side — a filter over
  * 1e9 keys is ~GBs and belongs in a shuffle-side runtime filter
  * instead.
  *
  * Hashing convention: both sides hash the key through `xxhash64`
  * first and the sketch stores/probes those longs (putLong /
  * mightContainLong) — the same convention Spark's InjectRuntimeFilter
  * uses, and self-consistent by construction regardless of key type.
  */
object JoinPruning {

  /** Hard cap on distinct build-side keys (~12 MB serialized at fpp
    * 0.01). The whole filter lives on the driver and ships with every
    * task as a plan literal, so an oversized build side is a silent
    * driver-memory/plan-size hazard — [[buildKeyBloom]] fails loud
    * instead. A build side past this belongs in a shuffle-side
    * runtime filter (AQE's InjectRuntimeFilter), not a literal. */
  val maxBuildKeys: Long = 10L * 1000 * 1000

  /** Serialized Bloom filter over `xxhash64(keyCol)` of `build`,
    * usable as a literal probe via [[mightContain]]. Two passes over
    * the build side (count to size the sketch, then the aggregate) —
    * the build side is small by contract, enforced via
    * [[maxBuildKeys]]. */
  def buildKeyBloom(build: DataFrame, keyCol: String,
      fpp: Double = 0.01): Array[Byte] = {
    // distinct BEFORE sizing and inserting: a fact-table build side
    // (e.g. lineitem keyed by orderkey) repeats each key many times —
    // sizing from raw rows oversizes the filter by the duplication
    // factor, and the sketch only needs each key once
    val hashes = build.select(xxhash64(col(keyCol)).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
    val expected = math.max(1L, hashes.count())
    require(expected <= maxBuildKeys,
      s"buildKeyBloom: $expected distinct build keys exceeds maxBuildKeys " +
        s"($maxBuildKeys) — the literal filter would bloat the driver and " +
        s"every task binary; use AQE's runtime filter for large build sides")
    val bf = hashes.rdd.treeAggregate(BloomFilter.create(expected, fpp))(
      (f, r) => { f.putLong(r.getLong(0)); f },
      (a, b) => a.mergeInPlace(b))
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column — Spark's own
    * codegen'd predicate over a literal filter; false positives
    * possible, false negatives never. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))

  /** EXISTS with a Bloom pre-filter: probe rows that cannot match
    * drop before the shuffle; the exact left-semi join removes the
    * false positives, so the result is identical to the plain semi
    * join. */
  def semiJoinPruned(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, fpp: Double = 0.01): DataFrame = {
    val bloom = buildKeyBloom(build, buildKey, fpp)
    probe
      .filter(mightContain(bloom, col(probeKey)))
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }

  /** NOT EXISTS with a Bloom definite-negative bypass: a Bloom miss
    * PROVES absence, so those rows go straight to the output and only
    * the might-contain slice (build-side selectivity + fpp of the
    * probe) pays the anti join. The probe scans twice — at scale,
    * cheaper than shuffling the whole probe side whenever the
    * might-contain slice is small; materialize the probe first if
    * the double scan dominates. */
  def antiJoinPruned(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, fpp: Double = 0.01): DataFrame = {
    val bloom = buildKeyBloom(build, buildKey, fpp)
    val mc = mightContain(bloom, col(probeKey))
    val keys = build.select(col(buildKey)).distinct()
    probe.filter(!mc)
      .unionByName(
        probe.filter(mc)
          .join(keys, col(probeKey) === col(buildKey), "left_anti"))
  }

  /** A8b — `q_semi_bloom`: the A8 EXISTS with the Bloom pre-filter.
    * Result is identical to A8 by construction (the exact join removes
    * false positives), so the oracle is the same EXISTS SQL — the
    * driver check proves the pruning changes the plan, not the
    * answer. */
  def semiBloomQuery(t: graft.sources.Tables): DataFrame =
    semiJoinPruned(t.customer, t.orders.select(col("o_custkey")),
      "c_custkey", "o_custkey")
      .select(col("c_custkey"))

  /** A9b — `q_anti_bloom`: the A9 NOT EXISTS with the definite-
    * negative bypass; same oracle as A9. */
  def antiBloomQuery(t: graft.sources.Tables): DataFrame =
    antiJoinPruned(t.orders, t.lineitem.select(col("l_orderkey")),
      "o_orderkey", "l_orderkey")
      .select(col("o_orderkey"))
}
