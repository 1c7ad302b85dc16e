package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkTestBase {

  test("bucketed co-located join plans zero shuffle exchanges") {
    val t = Tables(spark, sfDir)
    Bucketing.writeBucketed(t.orders, "orders_b", "o_custkey")
    Bucketing.writeBucketed(t.customer, "customer_b", "c_custkey")
    try {
      val joined = spark.table("orders_b").hint("merge")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must need no repartitioning: both sides' bucketed
      // scans already satisfy the required hash distribution
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey") &&
        !joinSection.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$plan")
      // same totals as the unbucketed query
      val n = joined.agg(sum("n")).first().getLong(0)
      assert(n === t.orders.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("q_incremental_pruned: watermark scan prunes day partitions and matches the flat scan") {
    val t = Tables(spark, sfDir)
    val df = graft.operators.EventOps.incrementalPruned(t)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the derived date predicate must land as a PARTITION filter
    // (whole day-directories skipped at the file listing), and the
    // exact watermark must still push into the surviving files
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("event_date") && !plan.contains("PartitionFilters: []"),
      s"no partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(ts"),
      s"watermark not pushed in:\n$plan")
    // identical rows to the flat-table scan (B5)
    val flat = graft.operators.EventOps.incremental(t)
    assert(df.count() === flat.count())
    assert(df.except(flat).isEmpty && flat.except(df).isEmpty)
  }

  test("q_join_bucketed: end-to-end plan has no exchange at all") {
    val t = Tables(spark, sfDir)
    val df = Bucketing.joinBucketed(t)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join+agg should plan zero exchanges:\n$plan")
    // same revenue total as the raw-parquet join
    val bucketed = df.agg(sum("revenue")).first().getDouble(0)
    val raw = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      .first().getDouble(0)
    assert(math.abs(bucketed - raw) / raw < 1e-6)
  }
}
