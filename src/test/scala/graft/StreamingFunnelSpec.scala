package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.StreamingFunnel

/** The streaming funnel must agree with batch B14 click-for-click:
  * every emitted click carries exactly the batch flag, and every
  * batch-CONVERTED click is emitted (conversion needs no watermark —
  * it fires when the later of the pair arrives). NOT-converted
  * clicks need the watermark to pass their deadline, which a finite
  * drain only guarantees for all but the tail — so the assertion
  * there is the sessionizer's shape: emitted ⊆ batch, plus a
  * non-vacuousness check that the timeout path really fired. */
class StreamingFunnelSpec extends SparkTestBase {

  test("streaming funnel clicks reconcile with batch sequence-match flags") {
    val dir = Files.createTempDirectory("graft-funnel").toFile
    dir.deleteOnExit()
    val t = Tables(spark, sfDir)
    // one file per day, written in day order (mtime order = event-time
    // order), so the AvailableNow drain advances the watermark day by
    // day and deadlines expire as later days process
    val days = t.events.select(to_date(col("ts")).as("d")).distinct()
      .orderBy(col("d")).collect().map(_.getDate(0).toString)
    days.foreach { d =>
      t.events.filter(to_date(col("ts")) === lit(d))
        .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    }

    // maxFilesPerTrigger = 1 forces one micro-batch per day file, so
    // cross-batch state carry-over (held clicks answered by a later
    // batch's purchases, held purchases answering later clicks, the
    // watermark-deadline sweep) is what this reconcile actually tests
    StreamingFunnel.runAvailableNow(spark, dir.getAbsolutePath, "funnel_sink",
      maxFilesPerTrigger = Some(1))
    val streamed = spark.table("funnel_sink")
      .select(col("user_id"), col("click_us"), col("event_id"),
        col("converted").cast("long").as("converted"))

    val batch = EventOps.clickConversionsOn(t.events).select(
      col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("click_us"),
      col("event_id"), col("converted"))

    assert(streamed.count() > 0)
    // exact flag agreement for everything emitted
    assert(streamed.except(batch).count() === 0,
      "a streamed click disagrees with the batch flag")
    // every converted click is emitted (no watermark needed)
    assert(batch.filter(col("converted") === 1L).except(streamed).count() === 0,
      "a batch-converted click was never emitted")
    // the timeout path really fired: non-converted clicks emitted too
    assert(streamed.filter(col("converted") === 0L).count() > 0,
      "no not-converted click emitted — the deadline sweep is vacuous")
  }
}
