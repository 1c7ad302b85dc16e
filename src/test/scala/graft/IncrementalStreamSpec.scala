package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables

/** The incremental contract of the streaming source (reference:
  * src/core/search/engine.py:57 `update_embeddings` — each poll
  * processes only messages newer than the stored watermark): with a
  * checkpoint, a restarted AvailableNow run reads ONLY files that
  * arrived since the previous run. */
class IncrementalStreamSpec extends SparkTestBase {

  test("restarted file-stream run processes only newly-arrived files") {
    val in = Files.createTempDirectory("graft-inc-in").toFile
    val out = Files.createTempDirectory("graft-inc-out").toFile
    val ckpt = Files.createTempDirectory("graft-inc-ckpt").toFile
    Seq(in, out, ckpt).foreach(_.deleteOnExit())
    val t = Tables(spark, sfDir)
    val half = t.events.agg(expr("percentile(event_id, 0.5)")).first().getDouble(0)

    def runOnce(): Unit = {
      val schema = spark.read.parquet(in.getAbsolutePath).schema
      val q = spark.readStream.schema(schema).parquet(in.getAbsolutePath)
        .select(col("event_id"), col("user_id"))
        .writeStream
        .format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1 lands, first run drains it
    t.events.filter(col("event_id") <= half)
      .write.mode("append").parquet(in.getAbsolutePath)
    runOnce()
    val n1 = spark.read.parquet(out.getAbsolutePath).count()
    assert(n1 === t.events.filter(col("event_id") <= half).count())

    // batch 2 lands, restarted run appends exactly the delta
    t.events.filter(col("event_id") > half)
      .write.mode("append").parquet(in.getAbsolutePath)
    runOnce()
    val n2 = spark.read.parquet(out.getAbsolutePath).count()
    assert(n2 === t.events.count(),
      "second run must add exactly the new files' rows, no reprocessing")
    // no duplicates: every event exactly once across both runs
    assert(spark.read.parquet(out.getAbsolutePath)
      .select("event_id").distinct().count() === n2)
  }
}
