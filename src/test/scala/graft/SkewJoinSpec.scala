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

  test("saltedJoin equals the plain join on a planted-skew frame, " +
    "with both the hot and cold paths engaged") {
    // fact: 1000 rows on hot key 7, a handful on keys 0-9
    val fact = spark.range(0, 1030)
      .select(when(col("id") < 1000, lit(7L)).otherwise(col("id") % 10)
        .as("fk"), col("id").as("v"))
    val dim = spark.range(0, 10)
      .select(col("id").as("dk"), (col("id") * 100).as("w"))
    val got = graft.operators.Relational
      .saltedJoin(fact, dim, "fk", "dk", threshold = 50, salts = 4)
      .select("fk", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === plain)
    assert(got.nonEmpty)
    // both paths really engaged: key 7 is above the threshold (hot),
    // the others below it (cold)
    assert(got.count(_._1 == 7L) === 1003)  // 1000 planted + ids 1007/1017/1027
    assert(got.exists(_._1 != 7L))
  }

  test("joinSkew equals the plain orders-customer aggregate") {
    val t = graft.sources.Tables(spark, sfDir)
    val got = graft.operators.Relational.joinSkew(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val plain = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("tt"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === plain.toSeq)
    // the fixture really exercises the hot path: some customer is
    // above the threshold
    val hot = t.orders.groupBy(col("o_custkey")).count()
      .filter(col("count") > graft.operators.Relational.skewHotThreshold)
      .count()
    assert(hot > 0, "no hot keys at this SF — the hot path is vacuous")
  }

  test("plan: joinSkew really takes the salted SHUFFLE path — two " +
    "shuffled hash joins, not broadcasts of the dim") {
    val t = graft.sources.Tables(spark, sfDir)
    val df = graft.operators.Relational.joinSkew(t)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // one ShuffledHashJoin per half (hot salted + cold plain); the
    // only broadcasts are the tiny hot-key set (semi/anti splits and
    // the dim-side semi)
    assert(plan.split("\n").count(_.contains("ShuffledHashJoin")) === 2,
      s"salted path not taken:\n$plan")
  }
}
