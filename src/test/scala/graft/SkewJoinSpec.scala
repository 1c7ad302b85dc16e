package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: with AQE's skew-join optimization, a
  * sort-merge join whose shuffle has one hot key gets its oversized
  * partition split into parallel sub-partitions at runtime — the
  * engine-level answer (alongside salting, used in windowRank/knnJoin)
  * to skewed join keys at 100 TB. */
class SkewJoinSpec extends SparkTestBase {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // fact: ~90% of rows share key 7; dim: uniform keys
      val fact = spark.range(0, 300000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
          .as("k"), col("id").as("v"))
      val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.hint("merge").join(dim, "k")
      // collect() executes THIS dataframe's QueryExecution (count/write
      // plan separate queries and leave joined's adaptive plan
      // unfinalized)
      assert(joined.collect().length === 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
