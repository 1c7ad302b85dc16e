package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.StatefulSessionizer

/** The stateful streaming sessionizer must agree with the batch
  * sessionization (B2) on every CLOSED session; each user's final
  * session stays open in the state store (nothing after it to close
  * it), so the reconciliation excludes exactly the per-user last
  * batch session. */
class StatefulSessionizerSpec extends SparkTestBase {

  test("streaming closed sessions == batch sessions minus each user's open tail") {
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

    val nStreamed = streamed.count()
    assert(nStreamed > 0)
    assert(nStreamed === closedBatch.count())
    // exact session bounds and sizes agree
    assert(streamed.except(closedBatch).count() === 0)
    assert(closedBatch.except(streamed).count() === 0)
  }
}
