package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime Bloom-filter join pruning — the engine-level mechanism
  * that makes selective fact⋈fact joins cheap at 100 TB: the
  * optimizer injects a Bloom filter built from the selective
  * (creation) side into the large (application) side's scan, so most
  * non-matching fact rows die before the shuffle instead of after
  * it. This spec pins down the exact session confs that enable it in
  * Spark 4 at test-data sizes, proving the library's plans are
  * runtime-filterable as written (equi-joins on raw columns — an
  * expression-wrapped join key would defeat injection). */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective fact join gets a bloom filter on the big side's scan") {
    val t = Tables(spark, sfDir)
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-data sizes are far below the production thresholds;
      // zeroing them shows the mechanism, not the heuristics. Bloom
      // injection targets SHUFFLE joins (a broadcast join's stream
      // side gains little), so broadcast is disabled for this plan.
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~top decile of order values at every SF — selective but non-empty
      val selective = t.orders.filter(col("o_totalprice") > 300000)
      assert(selective.count() > 0)
      val j = t.lineitem
        .join(selective, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      // the filter must sit on the lineitem (application) side scan
      assert(plan.contains("might_contain"),
        s"bloom probe (might_contain) missing from the plan:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
