package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.StatefulSessionizer

/** The stateful streaming sessionizer must agree with the batch
  * sessionization (B2): every emitted session is exactly a batch
  * session, and every session a successor event closed is emitted.
  * (Per-user final sessions may or may not emit in a single
  * AvailableNow drain — the event-time timeout that closes them fires
  * on a later micro-batch's watermark — so the assertions are
  * emitted ⊆ all-batch and closed-by-successor ⊆ emitted.) */
class StatefulSessionizerSpec extends SparkTestBase {

  test("streaming sessions reconcile exactly with batch sessionization") {
    val dir = Files.createTempDirectory("graft-sess").toFile
    dir.deleteOnExit()
    val t = Tables(spark, sfDir)
    t.events.write.mode("overwrite").parquet(dir.getAbsolutePath)

    StatefulSessionizer.runAvailableNow(spark, dir.getAbsolutePath, "sess_sink")
    val streamed = spark.table("sess_sink")
      .select(col("user_id"), col("sess_start_us"), col("sess_end_us"), col("n_events"))

    val batch = EventOps.sessionize(t).select(
      col("user_id"),
      unix_micros(col("sess_start").cast("timestamp")).as("sess_start_us"),
      unix_micros(col("sess_end").cast("timestamp")).as("sess_end_us"),
      col("n_events"), col("sess_id"))
    val lastPerUser = batch.groupBy("user_id").agg(max("sess_id").as("sess_id"))
    val closedBatch = batch.join(lastPerUser, Seq("user_id", "sess_id"), "left_anti")
      .drop("sess_id")

    val allBatch = batch.drop("sess_id")
    val nStreamed = streamed.count()
    assert(nStreamed > 0)
    // every emitted session matches a batch session exactly
    assert(streamed.except(allBatch).count() === 0)
    // every session closed by a successor event was emitted
    assert(closedBatch.except(streamed).count() === 0)
  }
}
