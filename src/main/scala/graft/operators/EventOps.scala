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

  /** Exact order-independent money sum — the shared
    * [[graft.functions.Exact.dsum]] convention. */
  private def dsum(c: Column): Column = graft.functions.Exact.dsum(c)

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
  def sessionize(t: Tables): DataFrame =
    sessionIdsOn(t.events)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
        dsum(col("value")).as("total_value"))

  /** B2's session-id stage — ONE gap rule shared by the rollup (B2)
    * and the path report (B17). Per event: (event_id, ts, user_id,
    * value, sess_id) plus any `extraCols` a consumer needs —
    * parameterized so B2's window shuffle stays lean (B17 alone pays
    * for carrying event_type through the exchange). */
  private[graft] def sessionIdsOn(events: DataFrame,
      extraCols: Seq[String] = Nil): DataFrame = {
    val runSum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = Seq("event_id", "ts", "user_id", "value") ++ extraCols
    events
      .select(base.map(col) :+
        lag(col("ts"), 1).over(byUserTime).as("prev_ts"): _*)
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          expr("ts - prev_ts > INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(runSum).cast(LongType))
      .drop("prev_ts", "new_sess")
  }

  /** B17's path depth cap — paths report the first this-many steps
    * of a session (the product-analytics convention, and the memory
    * bound: events past the cap are FILTERED OUT before any
    * aggregation, so no per-group buffer ever exceeds this many
    * rows — an always-active gap-free user costs 8 structs, not a
    * session's worth). */
  private[graft] val pathDepth = 8

  /** B17 — `q_session_paths`: PATH analysis — the top-10 session
    * event-type sequences ("view>click>purchase"), the behavior-flow
    * report beside B16's one-step transition matrix (B16 is the
    * Markov model; this is the raw trajectory distribution it
    * approximates). Sessions come from the SHARED B2 gap rule
    * ([[sessionIdsOn]] — rollup and paths can never disagree about a
    * session boundary); within a session, steps order by
    * (ts, event_id) and truncate at [[pathDepth]].
    *
    * Scale shape: one user-keyed shuffle (the session window), one
    * (user, sess) aggregate whose per-group state is capped by the
    * depth truncation, then a map-side-combining path count and a
    * TakeOrdered top-10 — path cardinality ≤ |types|^depth but the
    * count table only materializes observed paths. */
  def sessionPaths(t: Tables): DataFrame = sessionPathsOn(t.events)

  /** B17 over an arbitrary events frame — the spec drives the
    * ordering/truncation proofs through this. */
  private[graft] def sessionPathsOn(events: DataFrame): DataFrame = {
    // depth-cap BEFORE aggregating (the oracle's rn <= depth filter):
    // the row_number rides the session window's existing (user_id)
    // partitioning, and collect_list then never buffers more than
    // pathDepth structs per group — aggregate-then-slice would hold a
    // whole gap-free session in one buffer
    val sw = Window.partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts"), col("event_id"))
    val paths = sessionIdsOn(events, extraCols = Seq("event_type"))
      .withColumn("rn", row_number().over(sw))
      .filter(col("rn") <= pathDepth)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(array_sort(collect_list(struct(col("rn"), col("event_type"))))
        .as("evs"))
      .select(concat_ws(">",
        transform(col("evs"), e => e.getField("event_type"))).as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
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

  /** B5b — `q_incremental_pruned`: the same watermark scan over the
    * DATE-PARTITIONED events layout
    * ([[graft.sources.Bucketing.ensureEventsByDate]]). The derived
    * `event_date >= date(watermark)` predicate is a PARTITION filter
    * — whole day-directories never enter the file listing — and the
    * exact `ts > watermark` predicate still pushes into the surviving
    * files' row groups. `date(ts) >= '2024-01-20'` is implied by
    * `ts > '2024-01-20 00:00:00'`, so the result set is EXACTLY B5's
    * (the oracle runs B5's SQL over the flat table). At 100 TB this
    * is the difference between listing 30 days and listing one — the
    * incremental contract SURVEY §8 promises. */
  def incrementalPruned(t: Tables): DataFrame = {
    val path = graft.sources.Bucketing.ensureEventsByDate(t.spark, t.dir)
    t.spark.read.parquet(path)
      .filter(col("event_date") >= lit("2024-01-20").cast("date") &&
        col("ts") > lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
  }

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

  /** Strip leading/trailing C0 controls + Unicode whitespace —
    * Python `str.strip()` parity (the reference strips names with
    * bare `.strip()`, user_mapper.py:235, processor.py:224). The
    * class is every char Python's `str.isspace()` accepts (ASCII
    * whitespace, NEL, NBSP, Ogham space, the U+2000 block, line/para
    * separators, narrow NBSP, math space, ideographic space) plus
    * the remaining C0 controls (Java-`trim`-style; Python keeps
    * \x00-\x08 etc., a deliberate superset for junk-name robustness).
    * Spark's `trim` removes spaces only — a name like "x  "
    * would count as 3 chars without this. Written with `\x{...}`
    * escapes, which parse identically in Java regex and DuckDB's
    * RE2; `PY_WS_CLASS` is mirrored verbatim in the C3/C6 oracles
    * (SparkEntry.stripRe), so both engines always agree. */
  private[graft] val PY_WS_CLASS: String =
    "\\x00-\\x20\\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}"
  private def strip(c: Column): Column =
    regexp_replace(c, s"^[$PY_WS_CLASS]+|[$PY_WS_CLASS]+$$", "")

  /** The reference's file-name/junk detector for candidate display
    * names (user_mapper.py:235 `_is_file_name`), ported rule-for-rule:
    * null/under-2-chars after trim; "user NNN" auto-fallback shapes;
    * over-100-chars; file extensions; screen-capture/log phrases;
    * path separators; http/www prefixes. Case rules follow the
    * reference exactly — extension/phrase checks are on the lowered
    * name, path/url checks on the raw name. */
  def isFileName(name: Column): Column = {
    val lname = lower(name)
    val exts = Seq(".pdf", ".mov", ".mp4", ".jpg", ".png", ".doc", ".txt", ".zip")
    val phrases = Seq("screen recording", "screenshot", "debug log")
    name.isNull ||
      length(strip(name)) < 2 ||
      lname.rlike("^user [0-9]+$") ||
      length(name) > 100 ||
      exts.map(e => lname.contains(e)).reduce(_ || _) ||
      phrases.map(p => lname.contains(p)).reduce(_ || _) ||
      name.contains("/") || name.contains("\\") ||
      name.startsWith("http") || name.startsWith("www")
  }

  /** C3 — user-id → display-name with the reference's `User {id}`
    * fallback (user_mapper.py:252,263). The known-name directory is
    * built from signup events; candidate names are deterministic
    * synthetics shaped to exercise the reference's invalid-name
    * rejection (user_mapper.py:235 `_is_file_name`, applied before
    * caching at :240): a slice gets file-shaped names and another the
    * "User NNN" auto-fallback shape — both are dropped by the ported
    * rules, so those users fall back. Directory broadcasts; unknown
    * ids coalesce to the fallback. */
  def userNames(t: Tables): DataFrame = {
    val users = t.events.select(col("user_id")).distinct()
    val candidate =
      when(col("uid") % 7 === 0,
        concat(lit("screenshot "), col("uid").cast("string"), lit(".png")))
        .when(col("uid") % 7 === 3, concat(lit("User "), col("uid").cast("string")))
        .otherwise(concat(lit("u"), col("uid").cast("string"), lit("_name")))
    val known = t.events
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("uid")).distinct()
      .select(col("uid"), candidate.as("name"))
      .filter(!isFileName(col("name")))
    users
      .join(broadcast(known), col("user_id") === col("uid"), "left")
      .select(col("user_id"),
        coalesce(col("name"),
          concat(lit("User "), col("user_id").cast("string"))).as("display_name"))
  }

  /** Conversation type from a session id (reference:
    * src/core/database/processor.py:203 — type is 'group' iff the id
    * starts with "group-"; EVERYTHING else — "buddy-" prefixes, bare
    * numeric ids, UUIDs, "room-..." — is a private chat). */
  def conversationType(sessionId: Column): Column =
    when(sessionId.startsWith("group-"), "group").otherwise("private")

  /** Conversation display name with the reference's full fallback
    * chain (processor.py:192): private chats resolve the peer's user
    * name (the "buddy-" prefix stripped first, else the raw id,
    * processor.py:250); groups first use the 'n' key from a naming
    * message (c.g.c.i / c.g.a.m / system), accepted only when
    * non-empty and under 100 chars after trimming (processor.py:224),
    * then fall back to 'gn'/'group_name' from the group-creation
    * message (processor.py:242 — 'gn' wins even when empty, matching
    * the reference's if/elif), and anything still unresolved falls
    * back to the session id. `resolveUser` is the user-directory
    * lookup (see userNames); `nameMsgJson` is the naming-message
    * content, `groupCreationJson` the creation-message content. */
  def conversationName(sessionId: Column, nameMsgJson: Column,
      groupCreationJson: Column, resolveUser: Column => Column): Column = {
    val peerId = when(sessionId.startsWith("buddy-"),
      regexp_replace(sessionId, "^buddy-", "")).otherwise(sessionId)
    // strip, not trim: the reference's .strip() removes all whitespace
    val primary = strip(get_json_object(nameMsgJson, "$.n"))
    val fallback = strip(coalesce(
      get_json_object(groupCreationJson, "$.gn"),
      get_json_object(groupCreationJson, "$.group_name")))
    coalesce(
      when(conversationType(sessionId) === "private", resolveUser(peerId))
        .otherwise(coalesce(
          when(length(primary) > 0 && length(primary) < 100, primary),
          when(length(fallback) > 0, fallback))),
      sessionId)
  }

  /** C5 — `q_extract_text`: the reference's per-message content
    * extraction as an oracle-checked query (reference:
    * src/core/database/processor.py:117 `extract_text_from_content` —
    * JSON object with `text` → that field; JSON list → member texts
    * joined; anything else, or any non-type-1 message, → content
    * as-is). The events table's props are uniform `{"k": n}` dicts, so
    * content is synthesized deterministically per event to cover all
    * four shapes (object-with-text, list, plain string, text-less
    * dict) plus the non-type-1 gate; the oracle replays the same
    * construction and the same decision chain in DuckDB. Per-row
    * codegen'd column work — scales at scan speed. */
  def extractTextQuery(t: Tables): DataFrame = {
    import graft.functions.TextFunctions.extractText
    val id = col("event_id")
    val idS = id.cast("string")
    val mtype = when(id % 5 === 0, lit(2L)).otherwise(lit(1L))
    val content =
      when(id % 4 === 0, concat(lit("{\"text\": \"t"), idS, lit("\"}")))
        .when(id % 4 === 1, concat(
          lit("[{\"text\": \"a"), idS, lit("\"}, {\"k\": 1}, {\"text\": \"b"), idS, lit("\"}]")))
        .when(id % 4 === 2, concat(lit("plain "), idS))
        .otherwise(col("props"))
    t.events.select(id,
      mtype.as("msg_type"),
      extractText(content, mtype).as("extracted"))
  }

  /** C6 — `q_conversation_name`: the reference's conversation
    * naming as an oracle-checked query (processor.py:192). Session ids
    * are synthesized deterministically per user to cover every branch:
    * "buddy-" prefixes and bare numeric ids (private, peer resolved
    * through the user directory), "room-" ids (private under the
    * reference's type rule, resolved as raw ids → `User {sid}`), and
    * "group-" ids with all three group-name sources ('n' with the
    * <100-char guard — including an over-long rejected name that falls
    * back — then 'gn'/'group_name', then the session id). The user
    * directory broadcasts; everything else is per-row column logic. */
  def conversationNameQuery(t: Tables): DataFrame = {
    val uid = col("user_id")
    val uidS = uid.cast("string")
    val longName = "x" * 120
    val sid =
      when(uid % 4 === 0, concat(lit("buddy-"), uidS))
        .when(uid % 4 === 1, uidS)
        .when(uid % 4 === 2, concat(lit("group-"), uidS))
        .otherwise(concat(lit("room-"), uidS))
    val nameJson = when(uid % 3 === 0,
      when(uid % 6 === 0, lit(s"""{"n": "$longName"}"""))
        .otherwise(concat(lit("{\"n\": \"Team "), uidS, lit("\"}"))))
    val creationJson =
      when(uid % 3 === 1, concat(lit("{\"gn\": \"G"), uidS, lit("\"}")))
        .when(uid % 3 === 2, concat(lit("{\"group_name\": \"GN"), uidS, lit("\"}")))
    // userNames already emits one row per distinct user with the
    // resolved display name — no extra events scan needed here
    userNames(t)
      .select(uid,
        sid.as("session_id"),
        conversationType(sid).as("conv_type"),
        conversationName(sid, nameJson, creationJson,
          peer => when(peer === uidS, col("display_name"))
            .otherwise(concat(lit("User "), peer))).as("conv_name"))
  }

  /** B12 — `q_session_window`: gap sessionization through Spark's
    * NATIVE `session_window` aggregate — the engine feature B2 builds
    * by hand (lag + cumulative sum). Both coexist deliberately: B2's
    * window form generalizes (per-event session ids, custom gap
    * predicates), while the native form is the one that runs
    * UNCHANGED under Structured Streaming with merging session state.
    * Window end = last event + gap (Spark's exclusive-bound
    * convention), and a new session starts when the gap is ≥ 30 min
    * (Spark merges only strictly-overlapping windows) — the oracle
    * replays exactly that with lag/cumsum, making this a
    * cross-implementation check of the sessionization itself. */
  def sessionWindowAgg(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"), col("total_value"))

  /** B10 — `q_histogram`: fixed-width value histograms per event
    * type — the distribution sketch every pipeline dashboard needs.
    * Binning is a pure per-row projection (floor of an IEEE division,
    * identical in both engines), so the whole query is one map-side-
    * combining aggregate: scan-speed at 100 TB. */
  def histogram(t: Tables): DataFrame =
    t.events
      .select(col("event_type"),
        floor(col("value") / 5.0).cast(LongType).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))

  /** B11 — `q_resample`: per-user daily time-grid resampling with
    * forward fill — turning an irregular event stream into the
    * regular grid that feature pipelines and charting consume. Three
    * steps, all keyed on user_id: the daily rollup (one shuffle), the
    * per-user span (min/max day), and the grid itself — a `sequence`
    * explode over each user's span, NOT a global calendar cross-join
    * (rows generated = sum of user spans, and each user's grid lands
    * in its own partition). Gap days left-join to nothing: counts
    * coalesce to 0 and the value forward-fills with a running
    * `last(ignoreNulls)` — the same one-pass carry as the as-of
    * join. */
  def resample(t: Tables): DataFrame = {
    // DATE, not date_trunc: date_trunc on an NTZ input casts through
    // the session-zone TIMESTAMP (day bounds would shift outside
    // UTC); to_date truncates in calendar space, zone-free — the
    // library-wide tz-independence convention
    val daily = t.events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("day_value"))
    val spans = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = spans.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
  }

  /** B13 — `q_retention`: the cohort RETENTION matrix — users
    * cohorted by their first-activity day, per (cohort_day,
    * day_offset) how many came back and the retention rate. The
    * standard product-analytics triangle every event warehouse
    * publishes, and (for a training-data system) the "does the crawl
    * keep re-seeing the same producers" table behind source-freshness
    * decisions. to_date (zone-free calendar truncation) per the
    * library convention — see resample's note.
    *
    * Scale shape: three map-side-combining aggregates — per-user
    * first day (keyed user), distinct (user, day) activity (the same
    * key, so the two aggs share one shuffle partitioning), and the
    * (cohort, offset) counts whose key space is bounded by days² —
    * plus one user-keyed equi-join; the ≤days-row cohort-size table
    * broadcasts back for the rate. Nothing after the user-keyed
    * stages grows with the event count. Rate = one exact-long
    * division, 6dp. */
  def retention(t: Tables): DataFrame = {
    val days = t.events.select(col("user_id"), to_date(col("ts")).as("day"))
    val firsts = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val active = days.distinct()
    val counts = active.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_n"))
    counts.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_n"),
        round(col("n_active").cast("double") /
          col("cohort_n").cast("double"), 6).as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** B9 — `q_percentiles`: exact per-group value percentiles (the
    * latency/size distribution summary every event pipeline reports).
    * Spark's `percentile` is the EXACT distributed implementation —
    * per-group value buffers merge map-side, the interpolated
    * quantile computes once per group at reduce time — versus
    * `approx_percentile`'s sketch when exactness can be traded away
    * (not here: the oracle is DuckDB's quantile_cont, and both engines
    * interpolate linearly on the sorted values, so 6-dp rounding makes
    * them bit-comparable). One shuffle on the group key. */
  def percentiles(t: Tables): DataFrame =
    t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, array(0.5D, 0.9D, 0.95D))").as("ps"))
      .select(col("event_type"), col("n"),
        round(col("ps").getItem(0), 6).as("p50"),
        round(col("ps").getItem(1), 6).as("p90"),
        round(col("ps").getItem(2), 6).as("p95"))
      .orderBy(col("event_type"))

  /** B9b — `q_percentiles_approx`: the SKETCH form of B9 for true
    * 100-TB group sizes. Exact `percentile` buffers the per-group
    * value multiset in aggregation state — the one memory term in the
    * library that grows with data volume. `approx_percentile`
    * (Greenwald–Khanna / QuantileSummaries) keeps O(accuracy)
    * state per group INDEPENDENT of row count, with a guaranteed
    * RANK error ≤ n/accuracy — here accuracy=10000, so every
    * reported quantile sits within ±0.01% of the requested rank in
    * the group's sorted order. Same shape as B9: one map-side-
    * combining shuffle on the group key.
    *
    * Contract: DuckDB's approx_quantile is a differently-seeded
    * t-digest, so the sketch VALUES can never hash-match a
    * cross-engine oracle. The row therefore carries the sketch's
    * real guarantee as data: a second pass ranks each reported
    * quantile inside its group's exact value order (lo = values
    * strictly below, hi = values at-or-below — the tie window) and
    * emits `pXX_ok` = 1 iff the requested rank q·n falls inside
    * [lo − tol, hi + tol] with tol = n/accuracy + 2 (the GK bound
    * plus its off-by-one rank conventions). The oracle pins the
    * group sizes and the literal 1s, so a sketch past its documented
    * rank error fails the DRIVER gate, not just the ScalaTest one
    * (round-15 verdict item 7). Shape: the sketch pass is one
    * map-side-combining shuffle; the audit is one broadcast of the
    * ≤|event types| sketch rows back into the events scan plus a
    * second map-side-combining aggregate — two corpus passes total,
    * the honest price of an in-row audit (production would sample
    * it). */
  def percentilesApprox(t: Tables): DataFrame = {
    val sketch = t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(value, array(0.5D, 0.9D, 0.95D), 10000)").as("ps"))
    def okCol(i: Int, q: Double): Column = {
      val v = col("ps").getItem(i)
      val lo = sum(when(col("value") < v, 1L).otherwise(0L))
      val hi = sum(when(col("value") <= v, 1L).otherwise(0L))
      val n = first(col("n"))
      val tol = n / lit(10000.0) + lit(2.0)
      val target = lit(q) * n
      when(lo - tol <= target && target <= hi + tol, 1L).otherwise(0L)
    }
    t.events.select(col("event_type"), col("value"))
      .join(broadcast(sketch), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        okCol(0, 0.5).as("p50_ok"),
        okCol(1, 0.9).as("p90_ok"),
        okCol(2, 0.95).as("p95_ok"))
      .orderBy(col("event_type"))
  }

  /** B7 — `q_asof_join`: event-time AS-OF join — for every error
    * event, the most recent click by the same user at or before it
    * (the "state at event time" lookup every event pipeline needs:
    * price as-of trade, config as-of request, last-touch as-of
    * conversion). Spark has no native as-of join; the scalable
    * composition is UNION-TAG + RUNNING LAST: both streams shuffle
    * once on user_id, a single window pass carries the latest click
    * attributes forward, and error rows read them — linear in the
    * partition, no range-candidate fan-out ever materializes (the
    * naive `e.ts >= c.ts` join plans as a per-user cross product and
    * dies at scale; this shape is one shuffle + one sort, the same
    * cost as sessionize). At equal timestamps the click tag sorts
    * first, so an exactly-simultaneous click matches — the inclusive
    * as-of bound. Inner semantics: errors with no preceding click
    * drop. The oracle is DuckDB's NATIVE `ASOF JOIN` — an independent
    * implementation of the operator, not a replay of this plan
    * (deterministic here: the corpus has no duplicate
    * (user_id, ts) click rows for ASOF's tie to be arbitrary over). */
  def asofJoin(t: Tables): DataFrame = {
    val base = t.events
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all three window expressions in ONE projection: chained
    // withColumns interleave Projects that defeat CollapseWindow,
    // leaving three Window passes over the same sort — one select
    // plans a single WindowExec
    def lastClick(c: Column): Column =
      last(when(col("tag") === 0, c), ignoreNulls = true).over(w)
    base
      .select(col("event_id"), col("user_id"), col("ts"), col("tag"),
        lastClick(col("event_id")).as("click_id"),
        lastClick(col("ts")).as("click_ts"),
        lastClick(col("value")).as("click_value"))
      .filter(col("tag") === 1 && col("click_id").isNotNull)
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"), col("click_id"), col("click_ts"),
        col("click_value"))
  }

  /** B8 — `q_range_join`: bounded event-time interval join — every
    * (view, error) pair for the same user with the error inside one
    * day after the view (attribution windows, error-after-exposure
    * analysis). An inequality-only join plans as a nested-loop per
    * user; the scale shape is BIN + EQUI-JOIN: timestamps bin to
    * horizon-sized buckets, each view replicates to its bucket and
    * the next (factor 2, independent of data size — a [t, t+H] window
    * spans at most two H-buckets), the join is an equi-join on
    * (user_id, bucket), and the exact range predicate filters the
    * candidates. Work is proportional to true pairs per bucket, skew
    * is bounded by bucket population, and the bucket arithmetic stays
    * internal (never output, so engine epoch conventions can't leak
    * into the compare). The oracle is the plain inequality join —
    * independent of the binning. */
  def rangeJoin(t: Tables): DataFrame = {
    val horizonSec = 86400L
    // tz-FREE epoch bucket: diffing the NTZ value against the NTZ
    // epoch never touches the session zone — a cast through
    // TIMESTAMP would make a DST-transition day span ≠ 86400 epoch
    // seconds in a non-UTC session, letting a true pair straddle two
    // non-adjacent buckets and silently drop from the equi-join
    def bkt(ts: Column): Column =
      floor(timestamp_diff("SECOND",
        lit("1970-01-01 00:00:00").cast("timestamp_ntz"), ts)
        .cast("double") / horizonSec).cast(LongType)
    val views = t.events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val errors = t.events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_uid"),
        col("ts").as("error_ts"), bkt(col("ts")).as("e_bkt"))
    val vRep = views.select(col("view_id"), col("user_id"), col("view_ts"),
      explode(array(bkt(col("view_ts")), bkt(col("view_ts")) + 1)).as("v_bkt"))
    vRep
      .join(errors,
        col("user_id") === col("e_uid") && col("v_bkt") === col("e_bkt"))
      .filter(col("error_ts") >= col("view_ts") &&
        col("error_ts") <= col("view_ts") + expr("INTERVAL 1 DAY"))
      .select(col("view_id"), col("error_id"), col("user_id"),
        col("view_ts"), col("error_ts"))
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

  /** B14's conversion window. */
  private[graft] val sequenceWindow = expr("INTERVAL 30 MINUTES")

  /** B14 — `q_sequence_match`: ordered-pattern detection — for every
    * click, did a purchase by the same user follow within
    * [[sequenceWindow]]? (The funnel-step/conversion primitive —
    * MATCH_RECOGNIZE's two-step case — expressed as ONE reverse
    * cumulative window instead of a self-join.) "Follow" is the
    * (ts, event_id) total order: the next purchase is the minimum
    * purchase timestamp among rows at-or-after the click in that
    * order, computed as a running `min(CASE purchase)` over the
    * per-user sequence traversed DESCENDING — so each user's whole
    * history answers every click in one pass, where the naive
    * clicks⋈purchases time-range self-join is quadratic in a user's
    * event count (the hot-user pathology). Output: per-day click
    * volume, conversions, conversion rate (one exact division, 6dp).
    *
    * Scale shape: one shuffle on user_id for the window sort, then a
    * map-side-combining day rollup; nothing pairwise anywhere.
    * Timestamp comparisons are exact (microsecond integers on both
    * engines). */
  def sequenceMatch(t: Tables): DataFrame = sequenceMatchOn(t.events)

  /** B14's per-click stage: (user_id, ts, event_id, converted) for
    * every click — the rule the day rollup aggregates and the
    * streaming funnel (streaming/StreamingFunnel) must agree with
    * click-for-click. */
  private[graft] def clickConversionsOn(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("next_purchase",
        min(when(col("event_type") === "purchase", col("ts"))).over(w))
      .filter(col("event_type") === "click")
      .withColumn("converted",
        (col("next_purchase").isNotNull &&
          col("next_purchase") <= col("ts") + sequenceWindow).cast(LongType))
      .select(col("user_id"), col("ts"), col("event_id"), col("converted"))
  }

  /** B14 over an arbitrary events frame — the spec drives the
    * 30-minute-boundary and ordering-rule proofs through this. */
  private[graft] def sequenceMatchOn(events: DataFrame): DataFrame = {
    clickConversionsOn(events)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("converted")).as("n_converted"),
        round(sum(col("converted")).cast("double") /
          count(lit(1)).cast("double"), 6).as("conversion_rate"))
      .orderBy(col("day"))
  }

  /** B18's gates: minimum history before a user's distribution is
    * trusted, and the |z| alarm threshold. */
  private[graft] val anomalyMinEvents = 5L
  private[graft] val anomalyZ = 3.0

  /** B18 — `q_anomaly`: per-user OUTLIER detection — events whose
    * value sits more than [[anomalyZ]] standard deviations from that
    * user's own mean (the per-entity z-score alarm every metrics/
    * fraud pipeline runs; population stats would flag every big
    * spender instead of behavior CHANGES). Users need
    * [[anomalyMinEvents]] events before their distribution is
    * trusted; zero-variance users cannot alarm.
    *
    * Exactness: per-user sums and sum-of-squares accumulate in exact
    * DECIMAL (order-independent) and cast to double once, so both
    * engines derive mean/std from identical doubles via the identical
    * expression (variance clamped at 0 before the sqrt — fp can put
    * an all-equal user's variance at -1e-18, and sqrt(negative)
    * diverges between engines); z rounds to 6dp BEFORE the threshold
    * so the alarm set is engine-exact.
    *
    * Scale shape: one map-side-combining stats pass grouped by user,
    * then the events⋈stats join keyed on user_id (both sides already
    * user-keyed; at 100 TB this is one co-partitioned shuffle, and
    * under the bucketed layout zero exchanges) and a codegen'd
    * projection+filter. Output is alarms only. */
  def anomalies(t: Tables): DataFrame = {
    val dv = col("value").cast(DecimalType(18, 2))
    val stats = t.events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(dv).cast(DoubleType).as("s"),
        sum(dv * dv).cast(DoubleType).as("ss"))
      .filter(col("n") >= anomalyMinEvents)
      .select(col("user_id"), (col("s") / col("n")).as("mean"),
        sqrt(greatest(col("ss") / col("n") -
          (col("s") / col("n")) * (col("s") / col("n")), lit(0.0)))
          .as("std"))
      .filter(col("std") > 0.0)
    t.events
      .join(stats, "user_id")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z"))
      .filter(abs(col("z")) > anomalyZ)
      .orderBy(col("user_id"), col("event_id"))
  }

  /** B16 — `q_event_transitions`: the behavior-flow TRANSITION
    * matrix — per user, consecutive event-type pairs in the
    * (ts, event_id) order; globally, each (prev, next) pair's count
    * and its probability among the prev type's outgoing transitions
    * (the first-order Markov model product analytics fits to "what
    * do users do after X"). Output is |types|² rows at most —
    * bounded by the type vocabulary at any corpus size.
    *
    * Scale shape: one user-keyed shuffle for the lead window, then a
    * map-side-combining pair count; per-prev totals derive from the
    * ≤|types|²-row count table itself (never a second corpus pass)
    * and broadcast back; probability = one exact-long division, 6dp. */
  def eventTransitions(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = t.events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("prev_type"))
      .withColumn("next_type", lead(col("prev_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("tot"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("p"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** B15 — `q_rolling_stats`: per-event trailing-window aggregates —
    * for every purchase, the same user's purchase count and exact
    * value sum over the preceding hour INCLUDING the event (the
    * velocity/fraud-signal shape: "3rd purchase this hour"). A RANGE
    * frame over the timestamp itself with a calendar-interval bound
    * (SQL-expressed: the DataFrame Window API only takes numeric
    * offsets, and these TIMESTAMP_NTZ values have no epoch accessor
    * to key on) — timestamp-minus-interval is exact microsecond
    * arithmetic on both engines, and rows with identical timestamps
    * see identical frames regardless of tie order — the determinism
    * a ROWS frame would not have. Value sums in DECIMAL(18,2)
    * (exact, order-independent), cast back once.
    *
    * Scale shape: one shuffle on user_id, one per-user sort, then
    * the sliding-frame evaluation is a single forward pass with an
    * O(frame) buffer — never per-row re-scans; the output is
    * row-per-event, written not collected. */
  def rollingStats(t: Tables): DataFrame = {
    val frame = "PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    t.events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("n_1h", expr(s"count(*) OVER ($frame)"))
      .withColumn("sum_1h", expr(
        s"CAST(sum(CAST(value AS DECIMAL(18,2))) OVER ($frame) AS DOUBLE)"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** B19 — `q_pit_lookup`: POINT-IN-TIME dimension resolution against
    * a VERSIONED (SCD-2-shaped) dimension — the temporal star-schema
    * lookup H9's history table exists to serve ("what was this
    * customer's segment WHEN the order was placed", not what it is
    * now — joining facts to a dimension's current row silently
    * rewrites history, the classic reporting bug SCD-2 prevents).
    * The dimension history derives deterministically from the corpus
    * so the oracle replays it: every customer runs their original
    * segment until 365 days after their FIRST order, then the
    * 'UPGRADED' version opens (half-open [from, to) windows, NULL =
    * unbounded). Each order resolves to the version whose window
    * covers its order date; the rollup by resolved segment splits
    * first-year revenue from post-upgrade revenue.
    *
    * Scale shape: the history build is one fact aggregate (min order
    * date per custkey) joined to the dim; the resolve is ONE equi-join
    * on the key with the window predicate as a residual filter —
    * per-key version counts are bounded (2 here; dozens in real
    * dimensions), so join fan-out is |fact|·versions, and because the
    * windows PARTITION the timeline each fact row survives exactly
    * once: output = |fact| rows, no range-join machinery needed (B8
    * covers the genuinely unbounded-interval case). Fixed-length
    * INTERVAL 365 DAYS keeps the boundary calendar-clamp-free on both
    * engines. */
  def pitLookup(t: Tables): DataFrame = {
    val upgrade = t.orders.groupBy(col("o_custkey").as("ck"))
      .agg((min(col("o_orderdate")) + expr("INTERVAL 365 DAYS")).as("upg"))
    val dim = t.customer
      .join(upgrade, col("c_custkey") === col("ck"))
      .select(col("c_custkey").as("k"), col("c_mktsegment"), col("upg"))
    val hist = dim.select(col("k"), col("c_mktsegment").as("segment"),
        lit(null).cast("timestamp").as("valid_from"), col("upg").as("valid_to"))
      .unionByName(dim.select(col("k"), lit("UPGRADED").as("segment"),
        col("upg").as("valid_from"), lit(null).cast("timestamp").as("valid_to")))
    t.orders
      .join(hist, col("o_custkey") === col("k") &&
        (col("valid_from").isNull || col("valid_from") <= col("o_orderdate")) &&
        (col("valid_to").isNull || col("o_orderdate") < col("valid_to")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("segment"))
  }
}
