package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling probe: paired A/B evidence for the two mitigations a
  * 100-TB deployment leans on when a join/aggregation key is hot —
  * AQE's runtime skew-join split and manual salting — against the
  * unmitigated straggler and against the broadcast plan that makes
  * the problem vanish when one side is small.
  *
  * Synthetic skew, deterministic: events replicated M× (default 64,
  * ~6.4M rows at sf0.1) with `skew_id` = one hot key for ~40% of rows
  * (chosen by murmur3 of the replicated event_id), the rest keeping
  * their real user_id. Two workloads:
  *
  *  - JOIN: fact ⋈ per-user dim on skew_id, then a scalar sum — arms:
  *    `broadcast` (the right plan while the dim fits), `smj_skew_on`
  *    (shuffle join, AQE skew split enabled), `smj_skew_off` (the
  *    straggler: one task sorts/joins ~40% of the fact), `salted`
  *    (fact salted 32 ways on the join key, dim exploded ×32 — the
  *    manual fix when BOTH sides are too big to broadcast and AQE is
  *    unavailable/ineffective, e.g. pre-AQE engines or a skewed
  *    aggregation upstream of the join).
  *  - DISTINCT AGG (negative control): count(DISTINCT event_id) per
  *    skew_id — Spark's two-phase distinct rewrite already departs on
  *    (key, value) and partial-counts before the per-key exchange, so
  *    the hot key NEVER concentrates; `dist_direct` vs `dist_salted`
  *    documents that manual salting buys nothing here (and costs one
  *    extra aggregation).
  *  - SET AGG (the aggregation that DOES need salting): collect_set
  *    per skew_id — partial sets cannot shrink, so the hot key's
  *    whole distinct set merges on ONE reducer; `set_salted`
  *    two-phases it through a VALUE-derived salt (exact: a value's
  *    salt is a function of the value, so the per-salt sets are
  *    disjoint and their sizes sum to the true distinct count).
  *
  * Skew-split thresholds are lowered to MB scale for the probe
  * (`skewedPartitionThresholdInBytes`/`advisoryPartitionSizeInBytes`):
  * the production defaults (256 MB) are sized for real executors and
  * would classify nothing at a few-million-row local corpus; the
  * MECHANISM under test is identical. Both broadcast thresholds
  * (static + adaptive) are zeroed in the shuffle arms, else Spark
  * rightly broadcasts the 1.5k-row dim and there is nothing to probe.
  *
  * Per-arm evidence: wall minima across passes (pass-major, like
  * graft.Bench) plus the MAX TASK duration from a listener — the
  * straggler signature: smj_skew_off's max task should carry most of
  * its wall clock, smj_skew_on/salted should cut it by ~the split
  * factor while wall follows, broadcast should show neither. The two
  * distinct-agg arms must agree on the hot key's exact count (checked
  * every pass) — salting that changes the answer is a bug, not a fix.
  *
  * Usage: SPARK_GRAFT_MULT=64 sbt "runMain graft.SkewProbe"
  *        → one JSON line (also written to skew_probe.json).
  */
object SkewProbe {

  private final class MaxTaskListener extends SparkListener {
    @volatile var maxMs: Long = 0L
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val d = e.taskInfo.duration
      if (d > maxMs) maxMs = d
    }
    def reset(): Unit = maxMs = 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "64").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val salts = 32
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_HOT_PCT", "40").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MaxTaskListener
    spark.sparkContext.addSparkListener(listener)
    val osBean = java.lang.management.ManagementFactory.getPlatformMXBean(
      classOf[com.sun.management.OperatingSystemMXBean])

    // ---- skewed fact, materialized once (probe times the operators,
    // not the replication) ----
    val ev0 = graft.sources.Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("value"))
    val evBase = ev0.agg(max(col("event_id"))).first().getLong(0) + 1L
    val fact = (0 until mult).map { i =>
      ev0.select((col("event_id") + lit(i.toLong * evBase)).as("event_id"),
        col("user_id"), col("value"))
    }.reduce(_ unionByName _)
      .withColumn("skew_id",
        when(pmod(hash(col("event_id")), lit(100)) < hotPct, lit(-1L))
          .otherwise(col("user_id")))
      .localCheckpoint()
    val dim = fact.select(col("skew_id").as("d_id")).distinct()
      .withColumn("weight", (pmod(col("d_id"), lit(97)) + lit(1)) / lit(97.0))
      .localCheckpoint()
    val saltedDim = dim
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      .localCheckpoint()

    def setShuffleArm(skewFix: Boolean): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewFix.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    }
    def resetArm(): Unit = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .foreach(spark.conf.unset)

    // each arm builds its DataFrame AFTER its confs are set (the
    // static broadcast threshold is read at planning time)
    val arms: Seq[(String, () => Unit)] = Seq(
      "join_broadcast" -> (() => {
        resetArm()
        fact.join(broadcast(dim), col("skew_id") === col("d_id"))
          .agg(sum(col("weight") * col("value"))).first()
        ()
      }),
      "join_smj_skew_on" -> (() => {
        setShuffleArm(skewFix = true)
        fact.join(dim, col("skew_id") === col("d_id"))
          .agg(sum(col("weight") * col("value"))).first()
        ()
      }),
      "join_smj_skew_off" -> (() => {
        setShuffleArm(skewFix = false)
        fact.join(dim, col("skew_id") === col("d_id"))
          .agg(sum(col("weight") * col("value"))).first()
        ()
      }),
      "join_salted" -> (() => {
        setShuffleArm(skewFix = false)
        val fs = fact.withColumn("fsalt",
          pmod(hash(col("event_id"), lit(1)), lit(salts)))
        fs.join(saltedDim,
            fs("skew_id") === saltedDim("d_id") && fs("fsalt") === saltedDim("salt"))
          .agg(sum(col("weight") * col("value"))).first()
        ()
      }),
      "dist_direct" -> (() => {
        resetArm()
        val n = fact.groupBy(col("skew_id"))
          .agg(countDistinct(col("event_id")).as("n"))
          .filter(col("skew_id") === -1L).first().getLong(1)
        require(n > 0L); ()
      }),
      "dist_salted" -> (() => {
        resetArm()
        val n = fact
          .groupBy(col("skew_id"),
            pmod(hash(col("event_id"), lit(1)), lit(salts)).as("salt"))
          .agg(countDistinct(col("event_id")).as("c"))
          .groupBy(col("skew_id")).agg(sum(col("c")).as("n"))
          .filter(col("skew_id") === -1L).first().getLong(1)
        require(n > 0L); ()
      }),
      "set_direct" -> (() => {
        resetArm()
        val n = fact.groupBy(col("skew_id"))
          .agg(size(collect_set(col("event_id"))).cast("long").as("n"))
          .filter(col("skew_id") === -1L).first().getLong(1)
        require(n > 0L); ()
      }),
      "set_salted" -> (() => {
        resetArm()
        val n = fact
          .groupBy(col("skew_id"),
            pmod(hash(col("event_id"), lit(1)), lit(salts)).as("salt"))
          .agg(size(collect_set(col("event_id"))).cast("long").as("c"))
          .groupBy(col("skew_id")).agg(sum(col("c")).as("n"))
          .filter(col("skew_id") === -1L).first().getLong(1)
        require(n > 0L); ()
      }))

    // warm-up (codegen, listener-visible tasks discarded)
    arms.foreach { case (_, run) => run() }
    // exactness cross-check: the salted distinct must equal the direct
    resetArm()
    val directN = fact.groupBy(col("skew_id"))
      .agg(countDistinct(col("event_id")).as("n"))
      .filter(col("skew_id") === -1L).first().getLong(1)
    val saltedN = fact
      .groupBy(col("skew_id"),
        pmod(hash(col("event_id"), lit(1)), lit(salts)).as("salt"))
      .agg(countDistinct(col("event_id")).as("c"))
      .groupBy(col("skew_id")).agg(sum(col("c")).as("n"))
      .filter(col("skew_id") === -1L).first().getLong(1)
    require(directN == saltedN,
      s"salted distinct ($saltedN) != direct distinct ($directN)")
    val saltedSetN = fact
      .groupBy(col("skew_id"),
        pmod(hash(col("event_id"), lit(1)), lit(salts)).as("salt"))
      .agg(size(collect_set(col("event_id"))).cast("long").as("c"))
      .groupBy(col("skew_id")).agg(sum(col("c")).as("n"))
      .filter(col("skew_id") === -1L).first().getLong(1)
    require(directN == saltedSetN,
      s"salted collect_set total ($saltedSetN) != direct distinct ($directN)")

    val wall = collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    val maxTask = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val loads = (0 until passes).map { _ =>
      val load = osBean.getSystemLoadAverage
      arms.foreach { case (name, run) =>
        listener.reset()
        val t0 = System.nanoTime()
        run()
        val sec = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus by POLLING until maxMs holds
        // still for two consecutive reads (bounded at 5 s) — on a
        // loaded box the bus can lag well past any fixed beat, and an
        // undercounted read here used to flow straight into the
        // straggler stat
        var last = -1L; var stable = 0; var waited = 0
        while (stable < 2 && waited < 5000) {
          Thread.sleep(100); waited += 100
          val m = listener.maxMs
          if (m == last) stable += 1 else { stable = 0; last = m }
        }
        wall(name) = math.min(wall(name), sec)
        // wall takes the MIN across passes (co-tenant noise is strictly
        // additive) but the straggler signature takes the MAX: a pass
        // whose listener still undercounted must not mask the
        // straggler this probe exists to expose
        maxTask(name) = math.max(maxTask(name), listener.maxMs)
      }
      load
    }
    resetArm()
    val armJson = arms.map { case (name, _) =>
      s""""$name":{"wall_min":${f"${wall(name)}%.3f"},"max_task_ms":${maxTask(name)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"skew_probe","sf":"$sfDir","mult":$mult,"hot_pct":$hotPct,"salts":$salts,"rows":${fact.count()},"hot_distinct":$directN,"passes":$passes,"load_avg":${loads.map(l => f"$l%.2f").mkString("[", ",", "]")},"arms":$armJson}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("skew_probe.json"), json + "\n")
    spark.stop()
  }
}
