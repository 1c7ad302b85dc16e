package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Funnel wire format (ts epoch-micros TIMESTAMP, EventStream's
  * convention). */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, event_type: String)

/** Keyed funnel state: clicks awaiting a purchase or their deadline,
  * and the purchases still young enough to answer a future click. */
case class FunnelState(
    pending: List[(Long, Long)], // (click_us, event_id)
    purchases: List[(Long, Long)]) // (purchase_us, event_id)

/** A resolved click. */
case class FunnelClick(user_id: Long, click_us: Long, event_id: Long,
    converted: Boolean)

/** The LIVE sibling of B14 (`q_sequence_match`): click → purchase
  * conversion detection over a stream, with explicit keyed state —
  * `flatMapGroupsWithState` per user, the StatefulSessionizer
  * pattern applied to ordered-pattern matching. A click resolves
  * CONVERTED the moment a qualifying purchase (strictly after it in
  * the (ts, event_id) order, within 30 minutes) is seen — arrival
  * order free: a purchase arriving BEFORE its click (out-of-order
  * within the watermark) is held and consulted when the click lands
  * — and resolves NOT-CONVERTED via event-time timeout once the
  * watermark passes its 30-minute deadline (no qualifying purchase
  * can exist below the watermark).
  *
  * State lifecycle (both lists watermark-bounded): pending clicks
  * leave on match or deadline; held purchases prune once older than
  * the watermark — a future click must sit at-or-above the watermark
  * and a qualifying purchase is at-or-after its click, so a
  * sub-watermark purchase can never answer a future click. Late-data
  * compromise (the sessionizer's straggler rule): a click arriving
  * with its deadline already below the watermark resolves against
  * the held purchases only — purchases that expired before it
  * arrived are gone, so a far-late click may read not-converted
  * where the batch backfill says converted; StreamingFunnelSpec
  * asserts exact agreement for everything the watermark saw in
  * order.
  *
  * Scale shape: state is O(active clicks + recent purchases) per
  * user — both bounded by the 30-minute horizon, not history; each
  * micro-batch shuffles only its own click/purchase slice on
  * user_id. Batch B14 is the backfill; this is the live path. */
object StreamingFunnel {

  val windowUs: Long = 30L * 60 * 1000 * 1000
  private val windowMs: Long = windowUs / 1000

  private def toUs(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Does purchase p answer click c? Strictly after in the
    * (ts, event_id) total order, within the window. */
  private def answers(p: (Long, Long), c: (Long, Long)): Boolean =
    (p._1 > c._1 || (p._1 == c._1 && p._2 > c._2)) &&
      p._1 <= c._1 + windowUs

  private def resolve(
      uid: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelClick] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val out = ListBuffer.empty[FunnelClick]
    var s = state.getOption.getOrElse(FunnelState(Nil, Nil))
    if (!state.hasTimedOut) {
      val evs = events.toIndexedSeq
      val newPurchases = evs.filter(_.event_type == "purchase")
        .map(e => (toUs(e.ts), e.event_id))
      val newClicks = evs.filter(_.event_type == "click")
        .map(e => (toUs(e.ts), e.event_id))
      val purchases = (s.purchases ++ newPurchases).distinct
      // new clicks resolve against everything held + just arrived
      val (hit, miss) = newClicks.partition(c => purchases.exists(answers(_, c)))
      hit.foreach(c => out += FunnelClick(uid, c._1, c._2, converted = true))
      // held clicks may be answered by just-arrived purchases
      val (hitOld, stillPending) =
        s.pending.partition(c => newPurchases.exists(answers(_, c)))
      hitOld.foreach(c => out += FunnelClick(uid, c._1, c._2, converted = true))
      s = FunnelState((stillPending ++ miss).distinct, purchases)
    }
    // deadline sweep (timeout OR piggybacked on a data batch): any
    // pending click whose window closed below the watermark is a miss
    val (expired, live) = s.pending.partition(_._1 + windowUs < wmUs)
    expired.foreach(c => out += FunnelClick(uid, c._1, c._2, converted = false))
    val keptPurchases = s.purchases.filter(_._1 >= wmUs)
    if (live.isEmpty && keptPurchases.isEmpty) {
      state.remove()
    } else {
      state.update(FunnelState(live, keptPurchases))
      val deadline =
        if (live.nonEmpty) live.map(_._1).min / 1000L + windowMs
        else keptPurchases.map(_._1).max / 1000L + windowMs
      state.setTimeoutTimestamp(
        math.max(deadline, state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }

  /** Resolved clicks as a streaming Dataset over an event directory.
    * `maxFilesPerTrigger` bounds each micro-batch (the recovery-spec
    * knob — the reconcile spec uses it to force a genuinely
    * multi-batch drain so cross-batch state carry-over is what's
    * being tested, not a single-batch pass). */
  def clicks(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Option[Int] = None): Dataset[FunnelClick] = {
    import spark.implicits._
    EventStream.read(spark, inputDir, maxFilesPerTrigger)
      .filter(col("event_type").isin("click", "purchase"))
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelClick](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(resolve)
  }

  /** Drain all currently-available input into an in-memory table
    * (test/dev harness; production appends to a real sink with
    * checkpointing). Returns the sink table name. */
  def runAvailableNow(spark: SparkSession, inputDir: String, name: String,
      maxFilesPerTrigger: Option[Int] = None): String = {
    val q = clicks(spark, inputDir, maxFilesPerTrigger)
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
