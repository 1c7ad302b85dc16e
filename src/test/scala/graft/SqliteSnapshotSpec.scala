package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.sources.SqliteSnapshot

/** The SQLite bootstrap loader, proven against a committed fixture
  * (scripts/make_sqlite_fixture.py) whose rows also exist as a
  * JSON-lines sidecar — engine-independent ground truth, so parity is
  * byte-for-byte and not self-referential. The fixture deliberately
  * contains multi-level B-trees, NULLs, negative/6-byte/8-byte
  * integers, floats, unicode, an INTEGER PRIMARY KEY rowid alias, and
  * 1- and multi-page overflow chains. */
class SqliteSnapshotSpec extends SparkTestBase {

  private def res(name: String): String =
    getClass.getResource(s"/seatalk/$name").getPath

  private lazy val db = res("main_1756000000.sqlite")

  test("chat_message reads byte-identical to the sidecar ground truth") {
    val got = SqliteSnapshot.readTable(spark, db, "chat_message")
    assert(got.schema.map(f => f.name -> f.dataType.typeName) === Seq(
      "sid" -> "long", "_mid" -> "long", "c" -> "string", "t" -> "long",
      "_createAt" -> "double", "u" -> "long"))
    val want = spark.read.json(res("chat_message.jsonl"))
      .select(col("sid").cast("long"), col("_mid").cast("long"), col("c"),
        col("t").cast("long"), col("_createAt").cast("double"),
        col("u").cast("long"))
    assert(got.count() === 2000)
    assert(got.except(want).count() === 0)
    assert(want.except(got).count() === 0)
    // the overflow rows really decoded in full (multi-page chain)
    val maxLen = got.agg(max(length(col("c")))).first().getInt(0)
    assert(maxLen > 10000, s"multi-page overflow payload must survive (max $maxLen)")
  }

  test("blob column decodes exactly") {
    val kv = SqliteSnapshot.readTable(spark, db, "kv").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(kv("a").toSeq === Seq[Byte](0, 1, 2))
    assert(kv("b").toSeq === (0 until 256).map(_.toByte))
    assert(kv("c").length === 0)
  }

  test("bootstrapped events feed the query surface: B4/C2 reconcile with the sidecar") {
    val dir = Files.createTempDirectory("graft-sqlite-events").toString
    val n = SqliteSnapshot.loadEvents(spark, db, dir)
    assert(n === 2000L)
    val t = graft.sources.Tables(spark, dir)

    // engine-independent ground truth: the JSONL sidecar, with ts
    // reduced to the micros loadEvents derives from _createAt
    val side = spark.read.json(res("chat_message.jsonl"))
      .select(col("u").cast("long"), col("_mid").cast("long"), col("c"),
        col("_createAt").cast("double"), col("t").cast("long"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getString(2), math.round(r.getDouble(3) * 1e6),
        r.getLong(4)))

    // B4 global stats over the SQLite-born dir
    val s = graft.operators.EventOps.eventStats(t).first()
    assert(s.getAs[Long]("n_events") === 2000L)
    assert(s.getAs[Long]("n_users") === side.flatMap(_._1).distinct.length.toLong)
    assert(s.getAs[Long]("n_types") === side.map(_._5).distinct.length.toLong)
    val micros = side.map(_._4)
    def epochMicros(ts: java.time.LocalDateTime): Long =
      ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ts.getNano / 1000L
    assert(epochMicros(s.getAs[java.time.LocalDateTime]("first_ts")) === micros.min)
    assert(epochMicros(s.getAs[java.time.LocalDateTime]("last_ts")) === micros.max)

    // C2 context over the same dir: every row's prev/next must equal
    // the sidecar's per-user (ts, event_id)-ordered chain (props = c;
    // null user_ids form one window partition, like Spark's)
    val got = graft.operators.EventOps.msgContext(t).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getString(4))).toMap
    assert(got.size === 2000)
    side.groupBy(_._1).foreach { case (_, rows) =>
      val chain = rows.sortBy(r => (r._4, r._2))
      chain.zipWithIndex.foreach { case (r, i) =>
        val prev = if (i == 0) "" else chain(i - 1)._3
        val next = if (i == chain.length - 1) "" else chain(i + 1)._3
        assert(got(r._2) === ((prev, next)), s"context of _mid ${r._2}")
      }
    }
  }

  test("findLatestDatabase picks the newest main_*.sqlite") {
    val dir = Files.createTempDirectory("graft-dbdir")
    val older = dir.resolve("main_100.sqlite")
    val newer = dir.resolve("main_200.sqlite")
    Files.copy(Paths.get(db), older)
    Files.copy(Paths.get(db), newer)
    Files.setLastModifiedTime(older,
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(newer,
      java.nio.file.attribute.FileTime.fromMillis(2000000L))
    // a decoy that must not match the reference's main_*.sqlite glob
    Files.write(dir.resolve("other.sqlite"), Array[Byte](1))
    assert(SqliteSnapshot.findLatestDatabase(dir.toString) === newer.toString)
  }

  test("createSnapshot copies once and reuses while the source is unchanged") {
    val srcDir = Files.createTempDirectory("graft-src")
    val snapDir = Files.createTempDirectory("graft-snaps")
    val src = srcDir.resolve("main_1.sqlite")
    Files.copy(Paths.get(db), src)
    val s1 = SqliteSnapshot.createSnapshot(src.toString, snapDir.toString)
    assert(Files.size(Paths.get(s1)) === Files.size(src))
    // unchanged source → the same snapshot comes back (no second copy)
    val s2 = SqliteSnapshot.createSnapshot(src.toString, snapDir.toString)
    assert(s2 === s1)
    // source modified (newer mtime, different size) → fresh snapshot
    Files.write(src, Array[Byte](0), java.nio.file.StandardOpenOption.APPEND)
    Files.setLastModifiedTime(src,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    val s3 = SqliteSnapshot.createSnapshot(src.toString, snapDir.toString)
    assert(s3 !== s1)
    assert(Files.size(Paths.get(s3)) === Files.size(src))
  }

  test("loadEvents: chat_message → events parquet round-trip with row parity") {
    val out = Files.createTempDirectory("graft-boot").toString
    val n = SqliteSnapshot.loadEvents(spark, db, out)
    assert(n === 2000)
    val events = graft.sources.Tables(spark, out).events
    val msgs = SqliteSnapshot.readTable(spark, db, "chat_message")
    // key set parity: every message became exactly one event
    assert(events.select(col("event_id")).except(
      msgs.select(col("_mid").as("event_id"))).count() === 0)
    assert(events.count() === msgs.count())
    // field mapping parity on the join: ts carries _createAt at
    // microsecond precision, props carries the raw content, the
    // session key rides along
    val joined = events.join(msgs, col("event_id") === col("_mid"))
    assert(joined.filter(col("props") =!= col("c")).count() === 0)
    assert(joined.filter(col("session_id") =!= col("sid")).count() === 0)
    assert(joined.filter(!(col("user_id") <=> col("u"))).count() === 0)
    assert(joined.filter(col("event_type") =!= col("t").cast("string")).count() === 0)
    val tsDrift = joined.select(
      abs(unix_micros(col("ts").cast("timestamp")) -
        round(col("_createAt") * 1e6).cast("long")).as("d"))
      .agg(max(col("d"))).first().getLong(0)
    assert(tsDrift === 0L, s"ts must be _createAt truncated to micros (drift $tsDrift)")
    // the loaded directory is a valid pipeline source: a real query runs
    val t = graft.sources.Tables(spark, out)
    assert(graft.operators.EventOps.extractTextQuery(t).count() > 0)
  }
}
