package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Event wire format for the stateful sessionizer (`ts` is the
  * stream-side TIMESTAMP whose epoch micros equal the batch NTZ
  * wall-clock micros — see EventStream). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

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
  * State lifecycle: EventTimeTimeout + the 30-minute watermark bound
  * the state store — when the watermark passes an open session's
  * gap deadline, the session is emitted and its state removed, so
  * inactive users cost nothing and final sessions are not stuck open
  * forever. Out-of-order arrivals within the gap extend the open
  * session backwards; a straggler older than the open session by more
  * than the gap emits as its own (already-closed) singleton session —
  * the standard late-data compromise, since sessions already emitted
  * cannot be retracted in append mode.
  *
  * Scale shape: state is one small record per ACTIVE user, partitioned
  * by the group key; each micro-batch shuffles only its own events on
  * user_id. Batch and stream share session semantics, so the batch
  * query (a window + running sum) is the backfill and this is the
  * live path.
  */
object StatefulSessionizer {

  val gapUs: Long = 30L * 60 * 1000 * 1000
  private val gapMs: Long = gapUs / 1000

  private def toUs(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def sessionize(
      uid: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(uid, s.start_us, s.end_us, s.n))
    }
    // micro-batch delivery order is unspecified: order by event time
    val sorted = events.map(e => toUs(e.ts)).toIndexedSeq.sorted
    val out = ListBuffer.empty[ClosedSession]
    var open = state.getOption
    sorted.foreach { us =>
      open = open match {
        case Some(s) if us - s.end_us > gapUs =>
          out += ClosedSession(uid, s.start_us, s.end_us, s.n)
          Some(OpenSession(us, us, 1))
        case Some(s) if s.start_us - us > gapUs =>
          // straggler older than the open session: its session already
          // ended — emit it closed, keep the open session untouched
          out += ClosedSession(uid, us, us, 1)
          Some(s)
        case Some(s) =>
          Some(OpenSession(math.min(s.start_us, us), math.max(s.end_us, us), s.n + 1))
        case None =>
          Some(OpenSession(us, us, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close via timeout once the watermark passes end + gap (the
      // deadline must stay ahead of the current watermark)
      val deadline = s.end_us / 1000L + gapMs
      state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }

  /** Closed sessions as a streaming Dataset over an event directory. */
  def sessions(spark: SparkSession, inputDir: String): Dataset[ClosedSession] = {
    import spark.implicits._
    EventStream.read(spark, inputDir)
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionize)
  }

  /** Drain all currently-available input into an in-memory table
    * (test/dev harness; production would write a parquet/Delta sink
    * with `append` + checkpointing). Returns the sink table name. */
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
