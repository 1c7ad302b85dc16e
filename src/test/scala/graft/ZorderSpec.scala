package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.{Tables, Zorder}

class ZorderSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  private def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(findScans)
  }

  /** Rows the SCAN emitted (post row-group pruning + pushed filters)
    * — the bytes-touched proxy the layout exists to shrink. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = findScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("zValue interleaves bits exactly") {
    import spark.implicits._
    val got = Seq((1L, 0L), (0L, 1L), (3L, 5L), (255L, 0L))
      .toDF("a", "b")
      .select(Zorder.zValue(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    // (3,5): a bits 0,1 -> positions 0,2 = 5; b bits 0,2 -> positions
    // 1,5 = 34; (255,0): 8 one-bits at even positions
    assert(got === Seq(1L, 2L, 5L + 34L,
      (0 until 8).map(i => 1L << (2 * i)).sum))
    // bucketing: min-max to [0, 256), exact integer, monotone ends
    val b = Seq((0L), (14L)).toDF("v")
      .select(Zorder.bucketed(col("v"), 0L, 14L))
      .collect().map(_.getLong(0)).toSeq
    assert(b.head === 0L && b.last < 256L && b.last >= 238L)
  }

  test("zorderScan equals the box query over the raw table") {
    val got = Zorder.zorderScan(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Zorder.boxFilterRaw(t.events)
      .select(col("event_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === raw)
    assert(got.nonEmpty, "box query empty — vacuous")
  }

  test("appends DEGRADE z-order pruning and a re-optimize pass " +
    "restores it, with the box result identical in every phase") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zopt").toFile
    try {
      val schema = "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING, day LONG"
      val path = s"${dir.getAbsolutePath}/store"
      // split by PARITY, not by id range: event ids are assigned in
      // time order, so an id-range delta would cover only late days
      // and the box's day stats would prune the appended files for
      // the wrong reason — parity makes every append batch span the
      // full user AND day range, the real worst case
      val base = t.events.filter(pmod(col("event_id"), lit(2L)) === 0L)
      val delta = t.events.filter(pmod(col("event_id"), lit(2L)) === 1L)
      val deltaRows = delta.count()

      // phase 1: fresh z-ordered store over the lower half
      Zorder.writeZordered(base, path)
      def store = spark.read.schema(schema).parquet(path)
      def boxRows(df: DataFrame) = Zorder.boxFilter(df)
        .select("event_id").collect().map(_.getLong(0)).toSet
      val freshScan = scanRows(Zorder.boxFilter(store).select("event_id"))
      assert(boxRows(store) === Zorder.boxFilterRaw(base)
        .select("event_id").collect().map(_.getLong(0)).toSet)

      // phase 2: four arrival-order append batches — the daily-append
      // accretion; each file spans the full user AND day range, so
      // min/max stats cannot prune it
      (0 until 4).foreach { i =>
        delta.filter(pmod(col("event_id"), lit(8L)) === (2 * i + 1))
          .withColumn("day", Zorder.dayCol)
          .coalesce(1).write.mode("append").parquet(path)
      }
      val degradedScan = scanRows(Zorder.boxFilter(store).select("event_id"))
      assert(boxRows(store) === Zorder.boxFilterRaw(t.events)
        .select("event_id").collect().map(_.getLong(0)).toSet,
        "append changed the box ANSWER — decay must be a cost story only")
      // the decay fact: the appended half is scanned essentially in
      // full on top of the fresh half's pruned scan
      assert(degradedScan >= freshScan + (deltaRows * 9) / 10,
        s"appends should defeat pruning: $degradedScan vs " +
          s"$freshScan + ~$deltaRows")

      // phase 3: OPTIMIZE — re-cluster the whole store (a production
      // pass scopes this to partitions the appends touched; the
      // rewrite itself is H7's swap discipline)
      val opt = s"${dir.getAbsolutePath}/optimized"
      Zorder.writeZordered(store.drop("day"), opt)
      def optStore = spark.read.schema(schema).parquet(opt)
      val reoptScan = scanRows(Zorder.boxFilter(optStore).select("event_id"))
      info(s"scan rows: fresh=$freshScan degraded=$degradedScan " +
        s"reoptimized=$reoptScan (delta=$deltaRows)")
      assert(boxRows(optStore) === boxRows(store),
        "re-optimize changed the box answer")
      assert(reoptScan * 2 <= degradedScan,
        s"re-optimize recovered too little: $reoptScan vs $degradedScan")
      // recovered to fresh-level pruning: the store doubled, so the
      // scan should land near 2× the fresh cost, not near the
      // degraded cost (25% slack — at ~16 rows/file the bucket
      // boundaries are coarse)
      assert(reoptScan * 10 <= freshScan * 25,
        s"pruning did not recover to fresh level: $reoptScan vs 2×$freshScan")
    } finally graft.sources.LayoutStore.deleteRecursively(dir)
  }

  test("the z-ordered layout prunes BOTH dimensions where a " +
    "single-column sort only prunes its own") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    try {
      val zPath = s"${dir.getAbsolutePath}/z"
      val tPath = s"${dir.getAbsolutePath}/bytime"
      Zorder.writeZordered(t.events, zPath)
      // the control: same day key persisted, same file count, but
      // single-column time sort
      t.events.withColumn("day", Zorder.dayCol)
        .repartitionByRange(Zorder.zFiles, col("ts"))
        .sortWithinPartitions(col("ts"))
        .write.parquet(tPath)
      val schema = "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING, day LONG"
      def z = spark.read.schema(schema).parquet(zPath)
      def byTime = spark.read.schema(schema).parquet(tPath)
      val total = t.events.count()

      // user-only box: the time-sorted layout cannot prune AT ALL
      // (every file spans every user); the z-ordered one must
      def userBox(df: DataFrame) =
        df.filter(col("user_id").between(Zorder.boxUserLo, Zorder.boxUserHi))
          .select("event_id")
      val zUser = scanRows(userBox(z))
      val tUser = scanRows(userBox(byTime))
      info(s"user box: z=$zUser time=$tUser total=$total")
      assert(tUser === total, "time-sorted layout unexpectedly pruned users")
      assert(zUser * 2 <= tUser,
        s"z layout pruned nothing on users: $zUser vs $tUser")

      // day-only box: the z layout still prunes (interleaved day
      // bits), even though a time sort is the specialist here
      def dayBox(df: DataFrame) =
        df.filter(col("day").between(Zorder.boxDayLo, Zorder.boxDayHi))
          .select("event_id")
      val zDay = scanRows(dayBox(z))
      val tDay = scanRows(dayBox(byTime))
      info(s"day box: z=$zDay time=$tDay total=$total")
      assert(tDay < total / 2, "time sort failed to prune its own dimension")
      assert(zDay * 2 <= total,
        s"z layout read most of the store for the day box: $zDay")

      // the row's two-dimensional box: z at least matches the time
      // sort (which prunes days only) and typically beats it
      val zBoth = scanRows(Zorder.boxFilter(z).select("event_id"))
      val tBoth = scanRows(Zorder.boxFilter(byTime).select("event_id"))
      info(s"both box: z=$zBoth time=$tBoth total=$total")
      assert(zBoth <= tBoth,
        s"z layout worse than time sort on the 2-d box: $zBoth vs $tBoth")
    } finally graft.sources.LayoutStore.deleteRecursively(dir)
  }
}
