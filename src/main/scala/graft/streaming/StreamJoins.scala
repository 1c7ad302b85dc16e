package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream event-time interval join — the streaming analogue of
  * the batch range join (EventOps.rangeJoin, B8): every (view, error)
  * pair for the same user with the error inside one day after the
  * view, computed continuously as both streams arrive.
  *
  * The scale contract is the WATERMARK-BOUNDED STATE: each side keys
  * its state by user across executors; a view is held only until the
  * error-side watermark passes `view_ts + 1 day` (no match can arrive
  * after that), and an error is held only within its own watermark
  * horizon — state is bounded by rate × horizon regardless of stream
  * length. This is the same bin-the-time-axis trade as the batch
  * operator, enforced by the engine's state eviction instead of an
  * explicit bucket column. Inner-join matches emit as soon as both
  * rows exist (append mode; no window close needed).
  */
object StreamJoins {

  /** Views joined to the errors that follow them within one day, per
    * user. Two independent readers over the same directory: each side
    * filters and watermarks its own stream (the join's range condition
    * plus BOTH watermarks is what lets the state store evict). */
  def viewErrorJoin(spark: SparkSession, inputDir: String): DataFrame = {
    val views = EventStream.read(spark, inputDir)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val errors = EventStream.read(spark, inputDir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_uid"),
        col("ts").as("error_ts"))
      // 26h is the error-side LATE-ARRIVAL tolerance (how far behind
      // the max seen error_ts a straggler may land and still join);
      // view-state lifetime is derived independently by Spark from
      // the join's range condition (view_ts + 1 day) plus the
      // watermark, regardless of this delay
      .withWatermark("error_ts", "26 hours")
    views
      .join(errors,
        col("user_id") === col("e_uid") &&
          col("error_ts") >= col("view_ts") &&
          col("error_ts") <= col("view_ts") + expr("INTERVAL 1 DAY"))
      .select(col("view_id"), col("error_id"), col("user_id"),
        EventStream.ntzFromEpochMicros(col("view_ts")).as("view_ts"),
        EventStream.ntzFromEpochMicros(col("error_ts")).as("error_ts"))
  }

  /** Stream-static enrichment: the event stream joined to a static
    * user directory (the reference's per-message user-name resolve,
    * user_mapper.py:252, applied continuously). Stream-static joins
    * need NO watermark or state — every micro-batch broadcasts or
    * re-reads the static side, so directory updates between batches
    * are picked up, and unmatched users coalesce to the same
    * `User {id}` fallback as the batch operator. */
  def enrichWithUsers(spark: SparkSession, inputDir: String,
      users: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    EventStream.read(spark, inputDir)
      .join(org.apache.spark.sql.functions.broadcast(users), Seq("user_id"), "left")
      .withColumn("display_name",
        coalesce(col("display_name"),
          concat(lit("User "), col("user_id").cast("string"))))
      .withColumn("ts", EventStream.ntzFromEpochMicros(col("ts")))

  /** Drain all currently-available input into a memory sink
    * (test/dev harness; production appends to a table sink with
    * checkpointing). Returns the sink table name. */
  def runAvailableNow(spark: SparkSession, inputDir: String,
      name: String): String = {
    val q = viewErrorJoin(spark, inputDir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }
}
