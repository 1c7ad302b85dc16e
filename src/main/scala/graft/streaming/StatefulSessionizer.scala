package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Event wire format for the stateful sessionizer (micros since epoch
  * keeps full event-time precision through the typed boundary). */
case class SessionEvent(user_id: Long, ts_us: Long, value: Double)

/** Open-session state carried between micro-batches. */
case class OpenSession(start_us: Long, end_us: Long, n: Long)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, sess_start_us: Long, sess_end_us: Long, n_events: Long)

/** Streaming gap-based sessionization with explicit keyed state —
  * the `KeyValueGroupedDataset.flatMapGroupsWithState` shape of B2
  * (EventOps.sessionize): per user, an open session lives in the
  * state store across micro-batches; events extend it while gaps are
  * under 30 minutes, a larger gap closes and emits it. This is the
  * production-streaming counterpart of the reference's incremental
  * loop keeping per-conversation progress between polls
  * (reference: src/core/search/engine.py:57).
  *
  * Scale shape: state is one small record per active user, partitioned
  * by the group key; each micro-batch shuffles only its own events on
  * user_id. Batch and stream share session semantics, so the batch
  * query (a window + running sum) is the backfill and this is the
  * live path.
  */
object StatefulSessionizer {

  val gapUs: Long = 30L * 60 * 1000 * 1000

  private def sessionize(
      uid: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    // micro-batch delivery order is unspecified: order by event time
    val sorted = events.toIndexedSeq.sortBy(_.ts_us)
    val out = ListBuffer.empty[ClosedSession]
    var open = state.getOption
    sorted.foreach { e =>
      open = open match {
        case Some(s) if e.ts_us - s.end_us > gapUs =>
          out += ClosedSession(uid, s.start_us, s.end_us, s.n)
          Some(OpenSession(e.ts_us, e.ts_us, 1))
        case Some(s) =>
          Some(s.copy(end_us = math.max(s.end_us, e.ts_us), n = s.n + 1))
        case None =>
          Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach(state.update)
    out.iterator
  }

  /** Closed sessions as a streaming Dataset over an event directory. */
  def sessions(spark: SparkSession, inputDir: String): Dataset[ClosedSession] = {
    import spark.implicits._
    EventStream.read(spark, inputDir)
      .select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionize)
  }

  /** Drain available input through the sessionizer into a memory sink
    * (test/dev harness); returns the sink table name. */
  def runAvailableNow(spark: SparkSession, inputDir: String, name: String): String = {
    val q = sessions(spark, inputDir)
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
