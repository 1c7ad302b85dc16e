package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for repeat-join workloads. When two tables
  * are bucketed (and bucket-sorted) on their join key with the same
  * bucket count, every subsequent equi-join on that key is CO-LOCATED:
  * the scans satisfy the join's required distribution, so the plan has
  * NO shuffle exchange at any data size — the shuffle is paid once at
  * write time instead of once per query. This is the storage-layout
  * half of SURVEY.md §5: at 100 TB the fact tables (orders/lineitem/
  * events keyed by their join keys, embeddings by cell) would be
  * written this way, and the per-query win is the entire fact-table
  * shuffle. Verified by BucketingSpec: the bucketed join plans
  * zero `Exchange hashpartitioning` nodes.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
