package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.IncrementalPipeline

/** B6 — the streaming incremental pipeline, exercised end-to-end on a
  * real event directory with an AvailableNow trigger and a memory
  * sink, then reconciled against the equivalent batch aggregation. */
class StreamingSpec extends SparkTestBase {

  test("watermark late-data semantics: an event OLDER than the " +
    "watermark is dropped, an out-of-order event inside the horizon " +
    "is kept, and emitted windows equal batch on the on-time corpus") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-late").toFile
    in.deleteOnExit()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // one file per land() = one micro-batch (maxFilesPerTrigger=1);
    // the file source processes oldest-modification-time first, so
    // each landed file gets an EXPLICIT, monotonically increasing
    // mtime (a minute apart) — arrival order is structural, never a
    // race against wall-clock or coarse filesystem timestamps
    val stamped = scala.collection.mutable.Set[String]()
    var tick = 0
    def land(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit = {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in.getAbsolutePath)
      tick += 1
      in.listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-") &&
          !stamped(f.getName))
        .foreach { f =>
          java.nio.file.Files.setLastModifiedTime(f.toPath,
            java.nio.file.attribute.FileTime
              .fromMillis(1700000000000L + tick * 60000L))
          stamped += f.getName
        }
    }
    land(Seq((1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:20:00"), 1L, "click", 1.0),
      (3L, ts("2024-01-01 00:40:00"), 2L, "click", 1.0),
      (4L, ts("2024-01-01 01:15:00"), 1L, "click", 1.0)))
    // advances the watermark to 08:30 (= 10:30 − the 2h lateness)
    land(Seq((5L, ts("2024-01-01 10:30:00"), 3L, "click", 1.0)))
    // spacer batch: the engine applies a batch's watermark update to
    // FILTERING one batch later (it commits post-batch), so give the
    // 08:30 watermark one batch to become the active filter
    land(Seq((9L, ts("2024-01-01 10:45:00"), 3L, "click", 1.0)))
    // 00:30 is LATE (window end 01:00 < 08:30 watermark → dropped);
    // 09:15 is merely OUT OF ORDER (window end 10:00 > watermark →
    // kept) — the distinction the allowed-lateness contract draws
    land(Seq((6L, ts("2024-01-01 00:30:00"), 4L, "click", 1.0),
      (7L, ts("2024-01-01 09:15:00"), 5L, "click", 1.0)))
    // advances the watermark to 11:30, closing hours 9 and 10
    land(Seq((8L, ts("2024-01-01 13:30:00"), 6L, "click", 1.0)))

    val q = IncrementalPipeline.hourlyCounts(spark, in.getAbsolutePath,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("late_drop")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("late_drop").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).getHour,
        r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    // hour 0 counts THREE clicks, not four: the late 00:30 event is
    // dropped per the declared lateness. Hour 9 counts the
    // out-of-order event. Hour 13 is still open (never emitted in
    // append mode) — absent by contract, not lost.
    assert(got === Seq((0, "click", 3L), (1, "click", 1L),
      (9, "click", 1L), (10, "click", 2L)))
    // batch equivalence on the on-time corpus: the same aggregation
    // over everything except the late row, restricted to closed
    // windows, is exactly what the stream emitted
    val batch = spark.read.parquet(in.getAbsolutePath)
      .filter(col("event_id") =!= 6L &&
        col("ts") < ts("2024-01-01 11:30:00"))
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).toLocalDateTime.getHour,
        r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === batch)
  }

  test("streaming hourly counts reconcile with the batch timeWindow") {
    // stream source needs a directory of parquet files
    val dir = Files.createTempDirectory("graft-stream").toFile
    dir.deleteOnExit()
    val t = Tables(spark, sfDir)
    t.events.write.mode("overwrite").parquet(dir.getAbsolutePath)

    IncrementalPipeline.runAvailableNow(spark, dir.getAbsolutePath, "b6_sink")
    val streamed = spark.table("b6_sink")
      .groupBy("hour_start", "event_type").agg(sum("n").as("n"))

    // both sides are TIMESTAMP_NTZ now — no cast needed
    val batch = EventOps.timeWindow(t)
      .select(col("hour_start"), col("event_type"), col("n"))

    assert(streamed.count() > 0)
    val diff = streamed.join(batch, Seq("hour_start", "event_type"))
      .filter(streamed("n") =!= batch("n"))
    assert(diff.count() === 0)
    assert(streamed.count() === batch.count())
  }

  test("hour windows agree with batch in a non-UTC session timezone") {
    // a half-hour-offset zone is the adversarial case: any LTZ<->NTZ
    // cast hiding in the pipeline shifts hour bounds by 30 minutes
    val dir = Files.createTempDirectory("graft-stream-tz").toFile
    dir.deleteOnExit()
    val t = Tables(spark, sfDir)
    t.events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      IncrementalPipeline.runAvailableNow(spark, dir.getAbsolutePath, "b6_tz_sink")
      val streamed = spark.table("b6_tz_sink")
        .groupBy("hour_start", "event_type").agg(sum("n").as("n"))
      val batch = EventOps.timeWindow(Tables(spark, sfDir))
        .select(col("hour_start"), col("event_type"), col("n"))
      assert(streamed.count() === batch.count())
      assert(streamed.join(batch, Seq("hour_start", "event_type"))
        .filter(streamed("n") =!= batch("n")).count() === 0)
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("streaming dedup drops at-least-once duplicates with bounded state") {
    // duplicate the whole corpus: two parquet copies in the directory
    // simulate an at-least-once upstream re-delivering every event
    val dir = Files.createTempDirectory("graft-stream-dup").toFile
    dir.deleteOnExit()
    val t = Tables(spark, sfDir)
    t.events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    t.events.write.mode("append").parquet(dir.getAbsolutePath)

    IncrementalPipeline.runDedupAvailableNow(spark, dir.getAbsolutePath, "b6_dedup_sink")
    val deduped = spark.table("b6_dedup_sink")
    assert(deduped.count() === t.events.count(),
      "each duplicated event must be emitted exactly once")
    assert(deduped.select("event_id").distinct().count() === t.events.count())
    // event time round-trips to the batch NTZ wall-clock exactly
    val tsMismatch = deduped.select(col("event_id"), col("ts"))
      .join(t.events.select(col("event_id"), col("ts").as("bts")), "event_id")
      .filter(col("ts") =!= col("bts")).count()
    assert(tsMismatch === 0)
  }

  test("streaming near-dup pairs reconcile with batch minhash dedup, across micro-batches") {
    import graft.streaming.StreamingDeduper
    val t = Tables(spark, sfDir)
    val base = t.documents.select(col("doc_id"), col("text"))
    // two stream deliveries: the low half first, then the high half
    // PLUS planted near-copies of low-half docs — so real pairs span
    // the delivery boundary and only carried state can find them
    val half1 = base.filter(col("doc_id") < 250)
    val copies = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" streamed tail")).as("text"))
    val half2 = base.filter(col("doc_id") >= 250).unionByName(copies)

    val in = Files.createTempDirectory("graft-stream-neardup").toFile
    val ckpt = Files.createTempDirectory("graft-stream-neardup-ckpt").toFile
    val out = Files.createTempDirectory("graft-stream-neardup-out").toFile
    half1.write.mode("append").parquet(in.getAbsolutePath)
    StreamingDeduper.runAvailableNow(spark, in.getAbsolutePath,
      ckpt.getAbsolutePath, out.getAbsolutePath)
    val p1 = spark.read.parquet(out.getAbsolutePath).collect()

    half2.write.mode("append").parquet(in.getAbsolutePath)
    StreamingDeduper.runAvailableNow(spark, in.getAbsolutePath,
      ckpt.getAbsolutePath, out.getAbsolutePath)
    val pAll = spark.read.parquet(out.getAbsolutePath).collect()
    val p1Keys = p1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = pAll.filterNot(r => p1Keys((r.getLong(0), r.getLong(1))))

    // multi-bucket re-emissions dedup at the sink, like batch E2's
    // candidate distinct()
    val streamed = (p1 ++ p2)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.Dedup
      .dedupMinhashDocs(half1.unionByName(half2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "planted copies must make real pairs")
    assert(streamed === batch,
      s"stream/batch divergence: only-stream=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
    // the second run found CROSS-DELIVERY pairs via carried state —
    // and found them without re-emitting run-1 pairs: every run-1
    // pair key's OCCURRENCE COUNT (multi-bucket emissions included)
    // is unchanged in the full sink after run 2
    val run2Pairs: Set[(Long, Long)] =
      p2.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run2Pairs.exists(p => p._1 < 250 && p._2 >= 10000))
    def occurrences(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(r => (r.getLong(0), r.getLong(1))).map { case (k, v) => k -> v.length }
    val occ1 = occurrences(p1)
    val occAll = occurrences(pAll)
    occ1.foreach { case (k, n) =>
      assert(occAll(k) === n,
        s"restart re-emitted run-1 pair $k (${occAll(k)} vs $n sink rows)")
    }
  }

  test("streaming reader handles a RAW nanos-timestamp event directory") {
    // copy the original TIMESTAMP(NANOS) parquet file untouched — the
    // stream must truncate nanos itself, not depend on Tables' rewrite
    val dir = Files.createTempDirectory("graft-rawns").toFile
    dir.deleteOnExit()
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))
    IncrementalPipeline.runAvailableNow(spark, dir.getAbsolutePath, "b6_raw_sink")
    val streamed = spark.table("b6_raw_sink")
      .groupBy("hour_start", "event_type").agg(sum("n").as("n"))
    val batch = EventOps.timeWindow(Tables(spark, sfDir))
      .select(col("hour_start"), col("event_type"), col("n"))
    assert(streamed.count() === batch.count())
    assert(streamed.join(batch, Seq("hour_start", "event_type"))
      .filter(streamed("n") =!= batch("n")).count() === 0)
  }

  test("stream-stream interval join reconciles with the batch range join") {
    val dir = Files.createTempDirectory("graft-stream-join").toFile
    dir.deleteOnExit()
    val t = Tables(spark, sfDir)
    t.events.write.mode("overwrite").parquet(dir.getAbsolutePath)

    graft.streaming.StreamJoins.runAvailableNow(
      spark, dir.getAbsolutePath, "b8_sink")
    val streamed = spark.table("b8_sink")
      .select("view_id", "error_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventOps.rangeJoin(t)
      .select("view_id", "error_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stream-static user enrichment matches the batch userNames resolve") {
    val dir = Files.createTempDirectory("graft-stream-enrich").toFile
    dir.deleteOnExit()
    val t = Tables(spark, sfDir)
    t.events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val users = EventOps.userNames(t) // (user_id, display_name)

    val q = graft.streaming.StreamJoins
      .enrichWithUsers(spark, dir.getAbsolutePath, users)
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("enrich_sink")
    assert(streamed.count() === t.events.count())
    // every event resolved to exactly the batch mapping
    val mismatches = streamed
      .join(users.withColumnRenamed("display_name", "expected"), "user_id")
      .filter(col("display_name") =!= col("expected")).count()
    assert(mismatches === 0)
    assert(streamed.filter(col("display_name").isNull).count() === 0)
  }
}
