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
/** Hand-assembled two-page SQLite database bytes with a NON-ZERO
  * reserved region (80 bytes/page — SQLCipher v4's layout). The
  * committed python-made fixture has reserve 0, and stock SQLite
  * cannot create reserved space, so the encrypted-store round trip
  * needs a file whose pages leave room for the IV + HMAC; cells are
  * positioned off the END of the usable region, so a reserve cannot
  * be retrofitted onto an existing file. Page 1 = header +
  * sqlite_schema leaf (one table row); page 2 = the table leaf. */
object MiniSqliteDb {
  val pageSize = 4096
  /** Per-page reserved bytes — SQLCipher v4's 80 by default; the v3
    * round trip builds with 48 (16 IV + 20 HMAC-SHA1 rounded to the
    * AES block). */
  val reserve = 80

  private def varint(v: Long): Array[Byte] = {
    require(v >= 0 && v < (1L << 28), "mini builder emits short varints only")
    if (v < 128) Array(v.toByte)
    else if (v < (1 << 14))
      Array((0x80 | (v >>> 7)).toByte, (v & 0x7f).toByte)
    else Array((0x80 | (v >>> 14)).toByte,
      (0x80 | ((v >>> 7) & 0x7f)).toByte, (v & 0x7f).toByte)
  }

  private def beBytes(v: Long, len: Int): Array[Byte] =
    (0 until len).map(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte).toArray

  /** (serial type, body bytes) for one record value. */
  private def encodeValue(v: Any): (Long, Array[Byte]) = v match {
    case null => (0L, Array.empty[Byte])
    case x: Long =>
      val len =
        if (x >= -128 && x < 128) 1
        else if (x >= -32768 && x < 32768) 2
        else if (x >= -(1L << 23) && x < (1L << 23)) 3
        else if (x >= -(1L << 31) && x < (1L << 31)) 4
        else if (x >= -(1L << 47) && x < (1L << 47)) 6
        else 8
      val t = len match { case 6 => 5L; case 8 => 6L; case n => n.toLong }
      (t, beBytes(x, len))
    case x: Double =>
      (7L, beBytes(java.lang.Double.doubleToLongBits(x), 8))
    case x: String =>
      val b = x.getBytes("UTF-8"); (13L + 2L * b.length, b)
    case x: Array[Byte] => (12L + 2L * x.length, x)
  }

  private def record(values: Seq[Any]): Array[Byte] = {
    val enc = values.map(encodeValue)
    val typeBytes = enc.flatMap(e => varint(e._1)).toArray
    // header length includes its own varint; our headers are short so
    // one byte always suffices
    val hdrLen = typeBytes.length + 1
    require(hdrLen < 128)
    Array(hdrLen.toByte) ++ typeBytes ++ enc.flatMap(_._2)
  }

  private def cell(rowid: Long, payload: Array[Byte]): Array[Byte] =
    varint(payload.length.toLong) ++ varint(rowid) ++ payload

  private def leafPage(cells: Seq[Array[Byte]],
      page1Header: Option[Array[Byte]], rsv: Int): Array[Byte] = {
    val pg = new Array[Byte](pageSize)
    val h = page1Header.map { hdr =>
      System.arraycopy(hdr, 0, pg, 0, 100); 100
    }.getOrElse(0)
    pg(h) = 0x0d
    pg(h + 3) = ((cells.length >>> 8) & 0xff).toByte
    pg(h + 4) = (cells.length & 0xff).toByte
    var off = pageSize - rsv
    cells.zipWithIndex.foreach { case (c, i) =>
      off -= c.length
      System.arraycopy(c, 0, pg, off, c.length)
      val p = h + 8 + 2 * i
      pg(p) = ((off >>> 8) & 0xff).toByte
      pg(p + 1) = (off & 0xff).toByte
    }
    pg(h + 5) = ((off >>> 8) & 0xff).toByte
    pg(h + 6) = (off & 0xff).toByte
    pg
  }

  private def fileHeader(rsv: Int): Array[Byte] = {
    val b = new Array[Byte](100)
    System.arraycopy("SQLite format 3".getBytes("US-ASCII"), 0, b, 0, 15)
    b(16) = ((pageSize >>> 8) & 0xff).toByte; b(17) = (pageSize & 0xff).toByte
    b(18) = 1; b(19) = 1
    b(20) = rsv.toByte
    b(21) = 64; b(22) = 32; b(23) = 32
    b(27) = 1 // change counter
    b(31) = 2 // db size in pages
    b(43) = 1 // schema cookie
    b(47) = 4 // schema format
    b(59) = 1 // text encoding: UTF-8
    b(95) = 1 // version-valid-for
    System.arraycopy(beBytes(3040000L, 4), 0, b, 96, 4)
    b
  }

  def createSql(table: String = "msgs") =
    s"CREATE TABLE $table (sid INTEGER, _mid INTEGER PRIMARY KEY, c TEXT, " +
      "t INTEGER, _createAt REAL, u INTEGER)"

  /** (sid, rowid/_mid, c, t, _createAt, u) — NULLs, negative /
    * 6-byte / 8-byte ints, doubles and unicode all exercised. */
  val rows: Seq[(Any, Long, String, Any, Double, Any)] = Seq(
    (10L, 1L, "hello world", 1L, 1756000000.5, 100L),
    (null, 2L, "café ☕ 群聊", -7L, 1756000001.25, 70000L),
    (123456789012L, 3L, "third row payload", 281474976710655L, -2.5, null),
    (-1L, 4L, "", 9223372036854775807L, 0.0, 5L))

  /** The complete plaintext database file at a given per-page
    * reserve (the cipher generation's IV+HMAC footprint). */
  def plainFile(rsv: Int = reserve, table: String = "msgs"): Array[Byte] = {
    val schemaCell = cell(1L,
      record(Seq("table", table, table, 2L, createSql(table))))
    val msgCells = rows.map { case (sid, mid, c, t, at, u) =>
      // the INTEGER PRIMARY KEY slot is NULL in the record; its value
      // is the rowid
      cell(mid, record(Seq(sid, null, c, t, at, u)))
    }
    leafPage(Seq(schemaCell), Some(fileHeader(rsv)), rsv) ++
      leafPage(msgCells, None, rsv)
  }

  /** SQLCipher-encrypt the plaintext file (deterministic IVs) under
    * a cipher generation's parameters — v4 by default. */
  def encryptedFile(pass: String,
      cfg: graft.sources.SqliteSnapshot.SqlCipher.Config =
        graft.sources.SqliteSnapshot.SqlCipher.v4,
      table: String = "msgs"): Array[Byte] = {
    import graft.sources.SqliteSnapshot.SqlCipher
    val salt = (0 until 16).map(_.toByte).toArray
    val (k, hk) = SqlCipher.deriveKeys(cfg, pass, salt)
    val plain = plainFile(cfg.reserve, table)
    (0 until plain.length / pageSize).map { i =>
      val pg = java.util.Arrays.copyOfRange(plain, i * pageSize, (i + 1) * pageSize)
      val iv = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"graft-fixture-iv-${i + 1}".getBytes("UTF-8")).take(16)
      SqlCipher.encryptPage(cfg, k, hk, salt, pg, iv, i + 1, pageSize)
    }.reduce(_ ++ _)
  }
}

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

  test("WAL store with an uncheckpointed -wal sidecar: main file reads consistently, wal rows invisible") {
    // the documented stance (SqliteSnapshot scaladoc; reference
    // connection.py:124 copies ONLY the main DB file): WAL is not
    // implemented, the main file is read as the last CHECKPOINTED —
    // i.e. consistent — state. The fixture committed rows 1..60,
    // checkpointed, then committed 61..100 which live only in the
    // -wal sidecar sitting next to the main file.
    val got = SqliteSnapshot.readTable(spark, res("wal_main.sqlite"), "msgs")
      .select(col("_mid"), col("c")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (1L to 60L).map(i => (i, s"checkpointed $i")).toSet
    assert(got === want,
      "main-file read must be exactly the checkpointed state: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // and in particular no partial/half-applied wal content
    assert(!got.exists(_._2.startsWith("wal-only")),
      "rows living only in the -wal must be invisible to the reader")
  }

  private def expectedMiniRows =
    MiniSqliteDb.rows.map { case (sid, mid, c, t, at, u) =>
      (Option(sid).map(_.asInstanceOf[Long]), mid, c,
        Option(t).map(_.asInstanceOf[Long]), at,
        Option(u).map(_.asInstanceOf[Long]))
    }.toSet

  private def readMiniRows(path: String, key: Option[String]) =
    SqliteSnapshot.readTable(spark, path, "msgs", key = key).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1),
        r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSet

  test("hand-built reserved-region database reads as plaintext") {
    // the mini builder is the encrypted fixture's foundation — prove
    // its bytes parse through the SAME reader the python-made fixture
    // already validates, including the non-zero reserve the cells are
    // positioned against
    val dir = Files.createTempDirectory("graft-mini-sqlite")
    val p = dir.resolve("main_1.sqlite")
    Files.write(p, MiniSqliteDb.plainFile())
    assert(readMiniRows(p.toString, None) === expectedMiniRows)
  }

  test("SQLCipher v3 store round-trips through the config probe") {
    import graft.sources.SqliteSnapshot.SqlCipher
    // an OLDER store (PBKDF2-HMAC-SHA1 x 64k, HMAC-SHA1, reserve 48):
    // the reader must land on the v3 config by probe, not by being told
    val dir = Files.createTempDirectory("graft-enc-v3")
    val p = dir.resolve("main_4.sqlite")
    Files.write(p, MiniSqliteDb.encryptedFile("graft v3 key", SqlCipher.v3))
    assert(readMiniRows(p.toString, Some("graft v3 key")) === expectedMiniRows)
  }

  test("SQLCipher store round-trips: passphrase KDF, raw-key form, page-size probe") {
    val dir = Files.createTempDirectory("graft-enc-sqlite")
    val p = dir.resolve("main_2.sqlite")
    Files.write(p, MiniSqliteDb.encryptedFile("graft test key"))
    // the encrypted file must NOT look like plaintext SQLite
    val head = Files.readAllBytes(p).take(15)
    assert(new String(head, "US-ASCII") != "SQLite format 3")
    // passphrase path (PBKDF2-HMAC-SHA512, 256k iterations)
    assert(readMiniRows(p.toString, Some("graft test key")) === expectedMiniRows)
    // raw-key pragma form x'hex' skips the KDF and must land on the
    // same page keys (hex = the derived key, computed independently
    // by python hashlib.pbkdf2_hmac — also anchors the KDF itself)
    val knownKeyHex =
      "2f0609d246fa73ee26c4cc88f4d1cccbac76f787155410b989b7636a9789a4cc"
    assert(readMiniRows(p.toString, Some(s"x'$knownKeyHex'")) === expectedMiniRows)
  }

  test("SQLCipher: wrong key and missing key fail loudly; plaintext ignores the key") {
    val dir = Files.createTempDirectory("graft-enc-bad")
    val p = dir.resolve("main_3.sqlite")
    Files.write(p, MiniSqliteDb.encryptedFile("graft test key"))
    val wrong = intercept[RuntimeException](readMiniRows(p.toString, Some("nope")))
    assert(wrong.getMessage.contains("HMAC"),
      s"wrong-key failure must implicate the key check: ${wrong.getMessage}")
    val missing = intercept[RuntimeException](readMiniRows(p.toString, None))
    assert(missing.getMessage.toLowerCase.contains("encrypted"))
    // a key against the plaintext committed fixture is simply unused
    val got = SqliteSnapshot.readTable(spark, db, "kv", key = Some("irrelevant"))
    assert(got.count() === 3)
  }

  test("PBKDF2 matches an independent implementation (both HMACs)") {
    import graft.sources.SqliteSnapshot.SqlCipher
    // expected values computed with python hashlib.pbkdf2_hmac — an
    // implementation that shares no code with ours; covers the
    // 2-iteration short path AND multi-block derivations for both
    // cipher generations' HMACs
    val sha512 = SqlCipher.pbkdf2("HmacSHA512",
      "pw".getBytes("UTF-8"), "salt".getBytes("UTF-8"), 2, 40)
    assert(sha512.map("%02x".format(_)).mkString ===
      "8816cc3aaf71373639c3415049b2b6572f8d2bad8d7641ff6402939df50db47aefea61bf81b34afa")
    val sha1 = SqlCipher.pbkdf2("HmacSHA1",
      "pw".getBytes("UTF-8"), "salt".getBytes("UTF-8"), 2, 25)
    assert(sha1.map("%02x".format(_)).mkString ===
      "133a0b823b029801576d5a38793387e88064dd5faef257e16a")
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
