package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.sources.Tables

class EventOpsSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  test("timeWindow partitions every event into exactly one hour bucket") {
    val n = EventOps.timeWindow(t).agg(sum("n")).first().getLong(0)
    assert(n === t.events.count())
  }

  test("sessionize: session count per user matches gap count + 1") {
    val sess = EventOps.sessionize(t)
    val perUser = sess.groupBy("user_id").agg(
      max("sess_id").as("max_sess"), count(lit(1)).as("n_sess")).collect()
    perUser.foreach { r => assert(r.getLong(1) === r.getLong(2)) }
    // events conserved
    assert(sess.agg(sum("n_events")).first().getLong(0) === t.events.count())
    // session bounds ordered
    assert(sess.filter(col("sess_start") > col("sess_end")).count() === 0)
  }

  test("jsonExtract parses every props payload") {
    val rows = EventOps.jsonExtract(t).collect()
    assert(rows.map(_.getLong(1)).sum === t.events.count())
    rows.foreach { r => assert(!r.isNullAt(2)) } // k_sum present for all types
  }

  test("eventStats is a single consistent row") {
    val r = EventOps.eventStats(t).first()
    assert(r.getLong(0) === t.events.count())
    assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    assert(!r.getAs[java.time.LocalDateTime](3).isAfter(
      r.getAs[java.time.LocalDateTime](4)))
  }

  test("incremental only returns rows past the watermark, filter pushed down") {
    val df = EventOps.incremental(t)
    assert(df.count() > 0 && df.count() < t.events.count())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan"))
  }

  test("msgContext: first event per user has empty prev, neighbors consistent") {
    val rows = EventOps.msgContext(t).orderBy("user_id", "ts").collect()
    val byUser = rows.groupBy(_.getLong(1))
    byUser.values.foreach { g =>
      assert(g.head.getString(3) === "")
      assert(g.last.getString(4) === "")
      if (g.length > 1) {
        // second event's prev_msg is first event's props payload
        assert(g(1).getString(3).nonEmpty)
      }
    }
  }

  test("userNames: every user resolved, fallback shaped 'User {id}'") {
    val rows = EventOps.userNames(t).collect()
    assert(rows.length === t.events.select("user_id").distinct().count())
    rows.foreach { r =>
      val uid = r.getLong(0)
      val name = r.getString(1)
      // file-shaped and "User NNN"-shaped candidate names are rejected
      // by the ported _is_file_name rules and fall back to "User {id}"
      if (uid % 7 == 0 || uid % 7 == 3) assert(name === s"User $uid")
      else assert(name === s"u${uid}_name")
    }
    // both branches exercised
    assert(rows.exists(_.getString(1).endsWith("_name")))
    assert(rows.exists(_.getString(1).startsWith("User ")))
  }

  test("conversationAgg conserves events and orders time bounds") {
    val df = EventOps.conversationAgg(t)
    assert(df.agg(sum("n_events")).first().getLong(0) === t.events.count())
    assert(df.filter(col("first_ts") > col("last_ts")).count() === 0)
  }

  test("conversation type and name follow the reference's rules") {
    import spark.implicits._
    val nul = null.asInstanceOf[String]
    val rows = Seq(
      ("buddy-42", nul, nul),
      ("12345", nul, nul),
      // NOT group- prefixed => private (resolved as a raw id), even
      // though it isn't numeric — the reference's exact type rule
      ("room-abc", nul, """{"gn": "NotUsed"}"""),
      ("group-1", """{"n": " Team Chat "}""", """{"gn": "Fallback"}"""),
      ("group-2", s"""{"n": "${"x" * 120}"}""", """{"gn": "Ops"}"""),
      ("group-3", nul, """{"group_name": "GN3"}"""),
      ("group-4", nul, nul)
    ).toDF("sid", "nmsg", "payload")
    val out = rows.select(
      EventOps.conversationType(col("sid")).as("ctype"),
      EventOps.conversationName(col("sid"), col("nmsg"), col("payload"),
        uid => concat(lit("user:"), uid)).as("cname")).collect()
    assert(out(0).getString(0) === "private" && out(0).getString(1) === "user:42")
    assert(out(1).getString(0) === "private" && out(1).getString(1) === "user:12345")
    assert(out(2).getString(0) === "private" && out(2).getString(1) === "user:room-abc")
    assert(out(3).getString(0) === "group" && out(3).getString(1) === "Team Chat")
    // over-100-char 'n' rejected by the sanity guard -> gn fallback
    assert(out(4).getString(0) === "group" && out(4).getString(1) === "Ops")
    assert(out(5).getString(0) === "group" && out(5).getString(1) === "GN3")
    assert(out(6).getString(0) === "group" && out(6).getString(1) === "group-4")
  }

  test("isFileName ports the reference's rejection rules") {
    import spark.implicits._
    val cases = Seq(
      ("Alice Smith", false), ("x", true), ("  ", true),
      ("User 123", true), ("user 99", true), ("User abc", false),
      ("report.pdf attached", true), ("clip.MOV", true),
      ("Screenshot 2024-01-01", true), ("debug log dump", true),
      ("a/b", true), ("c\\d", true), ("http site", true), ("www.x", true),
      ("y" * 101, true),
      // Python-str.strip parity: a name that is all Unicode
      // whitespace (NBSP, ideographic space, line separator, narrow
      // NBSP) strips to empty -> under-2-chars -> rejected, exactly
      // as the reference's bare .strip() would see it
      ("\u00A0\u3000\u2028\u202F", true),
      // and Unicode whitespace PADDING strips without harming the name
      ("\u00A0Alice Smith\u3000", false))
    val out = cases.toDF("name", "expected")
      .select(EventOps.isFileName(col("name")).as("got"), col("expected"), col("name"))
      .collect()
    out.foreach { r =>
      assert(r.getBoolean(0) === r.getBoolean(1), s"name=${r.getString(2)}")
    }
  }

  test("percentilesApprox: the in-row rank audit passes and a " +
    "plain-Scala replay of the GK rank-error bound agrees") {
    val row = EventOps.percentilesApprox(t).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byType = t.events.select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(byType.keySet === row.keySet)
    // independent sketch replay: raw approx values ranked in plain
    // Scala against the same GK bound the row encodes as pXX_ok
    val raw = t.events.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.5D, 0.9D, 0.95D), 10000)")
        .as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((et, vals) <- byType) {
      val (n, p50ok, p90ok, p95ok) = row(et)
      assert(n === vals.length.toLong)
      assert(p50ok === 1L && p90ok === 1L && p95ok === 1L,
        s"$et in-row rank audit failed")
      for ((qf, av) <- Seq(0.5, 0.9, 0.95).zip(raw(et))) {
        // approx_percentile returns an element of the group; its rank
        // window must cover the requested rank within n/accuracy
        // (the GK guarantee) plus its off-by-one rank conventions
        val lo = vals.count(_ < av)
        val hi = vals.count(_ <= av)
        val target = qf * n
        val tol = n / 10000.0 + 2
        assert(lo - tol <= target && target <= hi + tol,
          s"$et q=$qf approx=$av n=$n rankWindow=[$lo,$hi]")
      }
    }
  }

  test("plan: userNames broadcasts the known-name directory") {
    val df = EventOps.userNames(t)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("asofJoin matches a brute-force as-of computation") {
    val ev = t.events
      .filter(col("event_type").isin("click", "error"))
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getString(3), r.getDouble(4)))
    val clicks = ev.filter(_._4 == "click").groupBy(_._2)
    val expected = ev.filter(_._4 == "error").flatMap { case (eid, uid, ets, _, _) =>
      clicks.getOrElse(uid, Array.empty[(Long, Long, java.time.LocalDateTime, String, Double)])
        .filter(c => !c._3.isAfter(ets))
        // as-of pick: max ts, then max event_id (the window's total order)
        .sortBy(c => (c._3, c._1)).lastOption
        .map(c => (eid, c._1, c._3, c._5))
    }.toSet
    val got = EventOps.asofJoin(t)
      .select("error_id", "click_id", "click_ts", "click_value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getDouble(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("plan: asofJoin is one shuffle and one window pass, no join node") {
    val df = EventOps.asofJoin(t)
    df.collect()
    // AQE toString prints Final + Initial sections — audit the final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.split("\n").count(_.contains("Window")) === 1)
    assert(!plan.contains("Join"))
    assert(plan.split("\n").count(_.contains("ShuffleQueryStage")) === 1)
  }

  test("rangeJoin matches a brute-force interval join") {
    val ev = t.events
      .filter(col("event_type").isin("view", "error"))
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getString(3)))
    val errs = ev.filter(_._4 == "error").groupBy(_._2)
    val expected = ev.filter(_._4 == "view").flatMap { case (vid, uid, vts, _) =>
      errs.getOrElse(uid, Array.empty[(Long, Long, java.time.LocalDateTime, String)])
        .filter(e => !e._3.isBefore(vts) && !e._3.isAfter(vts.plusDays(1)))
        .map(e => (vid, e._1))
    }.toSet
    val got = EventOps.rangeJoin(t).select("view_id", "error_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("native session_window reconciles with the handmade sessionize") {
    val native = EventOps.sessionWindowAgg(t)
      .select(col("user_id"), col("sess_start"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2)))
      .toSet
    val manual = EventOps.sessionize(t)
      .select(col("user_id"), col("sess_start"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2)))
      .toSet
    // same gap rule on data with no exact-30min gaps → identical
    // session starts and populations
    assert(native === manual)
  }

  test("histogram bins partition the events exactly") {
    val h = EventOps.histogram(t)
    assert(h.agg(sum("n")).first().getLong(0) === t.events.count())
    assert(h.filter(col("bin") < 0).count() === 0)
  }

  test("resample grid is dense per user with forward-filled values") {
    val r = EventOps.resample(t).collect()
    assert(r.map(_.getLong(2)).sum === t.events.count())
    // grid dense: per user, rows == days between min and max inclusive
    val byUser = r.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val days = rows.map(_.getAs[java.sql.Date](1).toLocalDate)
        .sortBy(_.toEpochDay)
      val span = days.last.toEpochDay - days.head.toEpochDay + 1
      assert(rows.length.toLong === span)
    }
    // filled_value never null (every user's first grid day has data)
    assert(r.forall(!_.isNullAt(3)))
  }

  test("sequenceMatch matches a brute-force conversion computation") {
    val ev = t.events
      .filter(col("event_type").isin("click", "purchase"))
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    val expected = ev.filter(_._4 == "click").map { case (uid, ts, eid, _) =>
      // "after" = strictly greater in the (ts, event_id) total order
      val qual = byUser(uid).filter(p => p._4 == "purchase" &&
        (p._2.isAfter(ts) || (p._2 == ts && p._3 > eid)))
      val conv = qual.nonEmpty && {
        val next = qual.map(_._2).reduce((a, b) => if (a.isBefore(b)) a else b)
        !next.isAfter(ts.plusMinutes(30))
      }
      (ts.toLocalDate, conv)
    }.groupBy(_._1).map { case (d, cs) =>
      d -> ((cs.length.toLong, cs.count(_._2).toLong))
    }
    val got = EventOps.sequenceMatch(t).collect().map(r =>
      r.getAs[java.sql.Date](0).toLocalDate ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.values.map(_._2).sum > 0, "no conversions anywhere — vacuous corpus")
  }

  test("sequenceMatch: the 30-minute boundary is inclusive, one " +
    "microsecond past it is not, and a same-ts purchase counts only " +
    "when later in the event_id order") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: purchase exactly at +30:00 → converted
      (1L, ts("2024-03-01 10:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-03-01 10:30:00"), 2L, "purchase", 1.0),
      // user 2: purchase at +30:00.000001 → NOT converted
      (2L, ts("2024-03-01 10:00:00"), 3L, "click", 0.0),
      (2L, ts("2024-03-01 10:30:00.000001"), 4L, "purchase", 1.0),
      // user 3: same-ts purchase with HIGHER event_id → converted
      (3L, ts("2024-03-01 11:00:00"), 5L, "click", 0.0),
      (3L, ts("2024-03-01 11:00:00"), 6L, "purchase", 1.0),
      // user 4: same-ts purchase with LOWER event_id → not "after"
      (4L, ts("2024-03-01 11:00:00"), 8L, "click", 0.0),
      (4L, ts("2024-03-01 11:00:00"), 7L, "purchase", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val row = EventOps.sequenceMatchOn(ev).collect()
    assert(row.length === 1)
    assert(row(0).getLong(1) === 4L)   // n_clicks
    assert(row(0).getLong(2) === 2L)   // users 1 and 3 only
  }

  test("anomalies matches a brute-force per-user z-score scan, and " +
    "planted users behave: a spike alarms, constants and thin " +
    "histories never do") {
    val ev = t.events.select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.toSeq.flatMap { case (uid, es) =>
      if (es.length < 5) Nil
      else {
        def d2(x: Double) = BigDecimal(x)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val s = es.map(e => d2(e._3)).sum.toDouble
        val ss = es.map(e => d2(e._3) * d2(e._3)).sum.toDouble
        val n = es.length
        val mean = s / n
        val std = math.sqrt(math.max(ss / n - (s / n) * (s / n), 0.0))
        if (std <= 0.0) Nil
        else es.flatMap { e =>
          val z = BigDecimal((e._3 - mean) / std)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (math.abs(z) > 3.0) Some((uid, e._2, z)) else None
        }
      }
    }.toSet
    val got = EventOps.anomalies(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "no anomalies on the corpus — vacuous")
    // planted behaviors through the same query over a tiny dir
    import spark.implicits._
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-05-01 10:$i%02d:00")
    val planted = (
      // user 1: 15 quiet events + one spike -> exactly the spike.
      // (15, not 9: population-std z is capped at (n-1)/sqrt(n), so a
      // single outlier can only clear |z| > 3 once n >= 12.)
      (0 until 15).map(i => (1L, ts(i), (10 + i).toLong, "view", 5.0)) ++
        Seq((1L, ts(15), 25L, "view", 500.0)) ++
        // user 2: constant values (std 0) -> never alarms
        (0 until 8).map(i => (2L, ts(i), (20 + i).toLong, "view", 7.0)) ++
        // user 3: thin history (< 5) with a wild value -> excluded
        Seq((3L, ts(0), 30L, "view", 1.0), (3L, ts(1), 31L, "view", 999.0))
      ).toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val dir = java.nio.file.Files.createTempDirectory("graft-anom").toFile
    dir.deleteOnExit()
    planted.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    val alarms = EventOps.anomalies(
      graft.sources.Tables(spark, dir.getAbsolutePath)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(alarms.toSeq === Seq((1L, 25L)))
  }

  test("eventTransitions matches a brute-force per-user lead-pair count " +
    "and rows per prev type sum to probability 1") {
    val ev = t.events.select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._4) }
    }.toSeq
    val expected = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = EventOps.eventTransitions(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(g => (g._1, g._2) -> g._3).toMap === expected)
    got.groupBy(_._1).foreach { case (prev, rows) =>
      val tot = rows.map(_._3).sum
      rows.foreach { r =>
        val p = BigDecimal(r._3.toDouble / tot.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r._4 === p)
      }
    }
  }

  test("sessionPaths: counts bounded by the shared-rule session count, " +
    "and a planted session orders by (ts, event_id) and truncates at " +
    "the depth cap") {
    // top-10 counts can never exceed the session count under the SAME
    // gap rule (one definition, two consumers)
    val nPathsTotal = EventOps.sessionPaths(t)
      .agg(sum("n")).first().getLong(0)
    val allSessions = EventOps.sessionIdsOn(t.events)
      .select("user_id", "sess_id").distinct().count()
    assert(nPathsTotal > 0 && nPathsTotal <= allSessions)
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-04-01 10:$m%02d:00")
    // one user: 10 events a minute apart (ONE session, over the
    // 8-step cap), event_ids DESCENDING so ts must drive the order;
    // plus a same-ts pair where event_id must break the tie
    val ev = ((0 until 10).map { i =>
      (1L, ts(i), (100 - i).toLong, s"t$i", 0.0)
    } ++ Seq(
      (2L, ts(0), 11L, "first", 0.0),
      (2L, ts(0), 12L, "second", 0.0)
    )).toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = EventOps.sessionPathsOn(ev).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(
      ((0 until 8).map(i => s"t$i").mkString(">"), 1L), // ordered + capped
      ("first>second", 1L)))                            // event_id tie-break
  }

  test("rollingStats matches a brute-force trailing-hour scan") {
    val p = t.events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getDouble(3)))
    val byUser = p.groupBy(_._2)
    val got = EventOps.rollingStats(t).collect()
    assert(got.length === p.length)
    got.foreach { r =>
      val uid = r.getLong(1)
      val ts = r.getAs[java.time.LocalDateTime](2)
      val frame = byUser(uid).filter(e =>
        !e._3.isAfter(ts) && !e._3.isBefore(ts.minusHours(1)))
      assert(r.getLong(4) === frame.length.toLong)
      val exact = frame.map(e => BigDecimal(e._4)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(math.abs(r.getDouble(5) - exact.toDouble) < 1e-9)
    }
    assert(got.exists(_.getLong(4) > 1), "no overlapping frames — vacuous")
  }

  test("plan: rangeJoin is an equi-join on (user, bucket), never a nested loop") {
    val df = EventOps.rangeJoin(t)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("retention: planted cohorts count each user once per day, " +
    "offsets anchor to the first-activity day, rates exact") {
    import spark.implicits._
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // user 1: days 1,2,5 (cohort 01-01); user 2: three events on ONE
    // day (must count once); user 3: days 2,3 (cohort 01-02)
    val events = Seq(
      (1L, ts(1, 8), 1L), (2L, ts(2, 9), 1L), (3L, ts(5, 10), 1L),
      (4L, ts(1, 1), 2L), (5L, ts(1, 2), 2L), (6L, ts(1, 23), 2L),
      (7L, ts(2, 7), 3L), (8L, ts(3, 7), 3L)
    ).toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ret").toFile
    events.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    val got = EventOps.retention(Tables(spark, dir.getAbsolutePath)).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),  // both day-1 users active day 0
      ("2024-01-01", 1L, 1L, 2L, 0.5),  // only user 1 returns next day
      ("2024-01-01", 4L, 1L, 2L, 0.5),  // user 1's day-5 visit
      ("2024-01-02", 0L, 1L, 1L, 1.0),
      ("2024-01-02", 1L, 1L, 1L, 1.0)))
  }

  test("pitLookup matches an independent per-order resolution scan " +
    "and every order resolves exactly once") {
    val seg = t.customer.select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ords = t.orders.select("o_custkey", "o_orderdate", "o_totalprice")
      .collect().map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getDouble(2)))
    val upg = ords.groupBy(_._1).map { case (ck, os) =>
      ck -> os.map(_._2).min(Ordering.fromLessThan[java.time.LocalDateTime](
        _.isBefore(_))).plusDays(365)
    }
    val expect = ords.groupBy { case (ck, d, _) =>
      if (!d.isBefore(upg(ck))) "UPGRADED" else seg(ck)
    }.map { case (s, os) =>
      val exact = os.map(o => BigDecimal(o._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (s, os.length.toLong, exact.toDouble)
    }.toSeq.sortBy(_._1)
    val got = EventOps.pitLookup(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(x => (x._1, x._2)) === expect.map(x => (x._1, x._2)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-6, s"total mismatch for ${g._1}") }
    // windows partition the timeline: fan-out never duplicates a fact
    assert(got.map(_._2).sum === ords.length.toLong)
    assert(got.exists(_._1 == "UPGRADED"), "no post-upgrade orders — vacuous")
  }

  test("pitLookup boundary: an order ON the upgrade instant resolves " +
    "UPGRADED, one microsecond before resolves the original segment") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val customer = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    // cust 1: first order 2024-01-01 → upgrade instant 2024-12-31
    // 00:00:00 (365 days, leap year irrelevant by construction);
    // planted orders ON the instant and 1µs before it. cust 2: only
    // the first order — never upgrades.
    val orders = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-12-30 23:59:59.999999"), 20.0),
      (1L, ts("2024-12-31 00:00:00"), 40.0),
      (2L, ts("2024-03-01 12:00:00"), 80.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft-pit").toFile
    customer.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/customer.parquet")
    orders.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/orders.parquet")
    val got = EventOps.pitLookup(Tables(spark, dir.getAbsolutePath)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      ("BUILDING", 2L, 30.0),   // first order + the 1µs-before order
      ("MACHINERY", 1L, 80.0),  // never upgraded
      ("UPGRADED", 1L, 40.0)))  // the on-the-instant order
  }
}
