package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.sources.Tables

/** B-family (events / time-series) + C2-C4 (the reference's message
  * pipeline semantics on the events stream table).
  *
  * The reference processes chat messages incrementally — watermark
  * scan (processor.py:320), per-message prev/next context
  * (processor.py:266), user-name mapping with a "User {id}" fallback
  * (user_mapper.py:252), per-conversation rollups and global stats
  * (engine.py:228). Here those semantics are declarative plans over
  * `events`: window functions partitioned by the session key, a
  * broadcast user directory, and aggregations whose partials combine
  * map-side. Every per-user window is keyed on user_id (thousands of
  * partitions at scale, not a handful), and every scan filter is
  * pushed to parquet.
  */
object EventOps {

  /** Exact order-independent money sum (same contract as Relational). */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Per-user event-time window: unique total order via (ts, event_id). */
  private val byUserTime =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** B1 — tumbling 1-hour window aggregation (the batch shape of the
    * streaming hourly rollup; same `window()` works under readStream). */
  def timeWindow(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** B2 — gap-based sessionization (30-min inactivity): lag to detect
    * session starts, running sum to number sessions, then a session
    * rollup. Two shuffles total, both keyed on user_id. */
  def sessionize(t: Tables): DataFrame = {
    val runSum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        lag(col("ts"), 1).over(byUserTime).as("prev_ts"))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          expr("ts - prev_ts > INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(runSum).cast(LongType))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
        dsum(col("value")).as("total_value"))
  }

  /** B3 — semi-structured JSON extraction from the props payload
    * (the reference parses message JSON per row, processor.py:117). */
  def jsonExtract(t: Tables): DataFrame =
    t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k_val")).as("k_sum"))
      .select(col("event_type"), col("n"), col("k_sum"),
        round(col("k_sum").cast("double") / col("n").cast("double"), 6).as("k_avg"))
      .orderBy(col("event_type"))

  /** B4 — table stats (reference engine.py:228 `get_database_stats`):
    * one global aggregate, map-side partials, 1-row output. */
  def eventStats(t: Tables): DataFrame =
    t.events.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"),
      dsum(col("value")).as("total_value"))

  /** B5 — incremental scan since a watermark (reference
    * processor.py:320 `process_messages(since_timestamp)`): a pushed
    * timestamp predicate — at scale, partition pruning on a
    * time-partitioned table. */
  def incremental(t: Tables): DataFrame =
    t.events
      .filter(col("ts") > lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

  /** C2 — prev/next message context (reference processor.py:266
    * `get_message_context`): one window pass computes both neighbors
    * for every row — versus the reference's two point queries per
    * message. Empty string when there is no neighbor, as the
    * reference defaults. */
  def msgContext(t: Tables): DataFrame =
    t.events.select(
      col("event_id"), col("user_id"), col("ts"),
      coalesce(lag(col("props"), 1).over(byUserTime), lit("")).as("prev_msg"),
      coalesce(lead(col("props"), 1).over(byUserTime), lit("")).as("next_msg"))

  /** C3 — user-id → display-name with the reference's `User {id}`
    * fallback (user_mapper.py:252,263). The known-name directory is
    * built from signup events, minus a deterministic slice standing in
    * for the reference's invalid-name rejection (user_mapper.py:240
    * `_is_invalid_name` drops file-name/URL-shaped names, so some
    * users never make it into the cache). Directory broadcasts;
    * unknown ids coalesce to the fallback. */
  def userNames(t: Tables): DataFrame = {
    val users = t.events.select(col("user_id")).distinct()
    val known = t.events
      .filter(col("event_type") === "signup" && col("user_id") % 5 =!= 0)
      .select(col("user_id").as("uid")).distinct()
      .select(col("uid"),
        concat(lit("u"), col("uid").cast("string"), lit("_name")).as("name"))
    users
      .join(broadcast(known), col("user_id") === col("uid"), "left")
      .select(col("user_id"),
        coalesce(col("name"),
          concat(lit("User "), col("user_id").cast("string"))).as("display_name"))
  }

  /** Conversation type from a session id (reference:
    * src/core/database/processor.py:192 `get_conversation_name` —
    * "buddy-{id}" prefixes and bare numeric ids are private chats,
    * anything else is a group). */
  def conversationType(sessionId: Column): Column =
    when(sessionId.startsWith("buddy-") || sessionId.rlike("^[0-9]+$"),
      "private").otherwise("group")

  /** Conversation display name with the reference's fallback chain
    * (processor.py:192): private chats resolve the peer's user name
    * (the "buddy-" prefix stripped first); groups use the group-name
    * field extracted from the creation message ('gn'/'group_name'),
    * trimmed; anything unresolved falls back to the session id.
    * `resolveUser` is the user-directory lookup (see userNames). */
  def conversationName(sessionId: Column, groupCreationJson: Column,
      resolveUser: Column => Column): Column = {
    val peerId = when(sessionId.startsWith("buddy-"),
      regexp_replace(sessionId, "^buddy-", "")).otherwise(sessionId)
    val groupName = trim(coalesce(
      get_json_object(groupCreationJson, "$.gn"),
      get_json_object(groupCreationJson, "$.group_name")))
    coalesce(
      when(conversationType(sessionId) === "private", resolveUser(peerId))
        .otherwise(when(length(groupName) > 0, groupName)),
      sessionId)
  }

  /** C4 — per-conversation rollup (reference conversation naming and
    * stats group messages by session; user_id is the session key
    * here). */
  def conversationAgg(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        dsum(col("value")).as("total_value"))
}
