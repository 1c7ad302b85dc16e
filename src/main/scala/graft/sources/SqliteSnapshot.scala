package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bootstrap ingestion from the reference's actual store: a SQLite
  * database file, snapshot-copied before reading so a live writer is
  * never disturbed (reference: src/core/database/connection.py:56
  * `find_latest_database` — newest/largest `main_*.sqlite` wins, :78
  * `create_snapshot` — copy-on-read with snapshot reuse while the
  * source is unchanged, :128 `connect` — connect to the snapshot, and
  * processor.py:428's batched `chat_message` scan). The reference
  * decrypts with a key pragma (connection.py:146, key from
  * SEATALK_DB_KEY, :49) — SQLCipher v4 page decryption is implemented
  * below ([[SqlCipher]]), so an encrypted store reads through the
  * same B-tree path; a plaintext file (the committed fixture) skips
  * it entirely.
  *
  * There is no SQLite JDBC driver on the classpath (and zero egress to
  * fetch one), so this reads the SQLite FILE FORMAT directly — it is
  * public, stable since 2004, and fully specified at
  * sqlite.org/fileformat2.html. Only what a bootstrap needs is
  * implemented: table B-trees (interior + leaf pages), the record
  * serial-type encoding, overflow-page chains, and the
  * INTEGER-PRIMARY-KEY rowid alias. WAL reading is NOT implemented —
  * the snapshot copy is of a quiesced file, exactly like the
  * reference's (apsw opens the snapshot, never the live DB). A main
  * file with an uncheckpointed `-wal` sidecar still reads
  * CONSISTENTLY — as the last checkpointed state, wal-only commits
  * invisible (pinned by SqliteSnapshotSpec's WAL-sidecar case).
  *
  * Spark-first scale shape: the driver walks only the B-tree's
  * INTERIOR pages (a ~0.3% fraction at fanout ~300) to enumerate leaf
  * page numbers — index metadata, like IVF probe ids — then the leaf
  * pages decode IN PARALLEL via `mapPartitions` over the page-number
  * range (one file handle per partition; each leaf decodes
  * independently by construction of the format). A multi-GB store
  * therefore ingests at full cluster width; nothing row-shaped ever
  * passes through the driver. mapPartitions is justified here: this
  * is per-partition imperative byte parsing, not relational work.
  */
object SqliteSnapshot {

  // ---- reference orchestration: find latest + snapshot ------------------

  /** Newest (then largest) `main_*.sqlite` in `dir` — the reference's
    * `find_latest_database` (connection.py:56,71: sort key is
    * (mtime, size) descending). */
  def findLatestDatabase(dir: String): String = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("main_") &&
        f.getName.endsWith(".sqlite"))
    require(files.nonEmpty, s"No main_*.sqlite database files found in $dir")
    files.maxBy(f => (f.lastModified(), f.length())).getAbsolutePath
  }

  /** Copy-on-read snapshot with reuse (connection.py:78): an existing
    * `snapshot_*_<name>` is reused iff it is at least as new as the
    * source AND the same size (source unchanged since the copy);
    * otherwise a fresh timestamped copy is made. Reading a snapshot —
    * never the live file — is what makes a concurrently-writing owner
    * process safe to bootstrap from. */
  def createSnapshot(dbPath: String, snapshotsDir: String): String = {
    val src = Paths.get(dbPath)
    val srcMtime = Files.getLastModifiedTime(src).toMillis
    val srcSize = Files.size(src)
    val dir = Paths.get(snapshotsDir)
    Files.createDirectories(dir)
    val base = src.getFileName.toString
    val reusable = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("snapshot_") && f.getName.endsWith(s"_$base"))
      .find(f => f.lastModified() >= srcMtime && f.length() == srcSize)
    reusable.map(_.getAbsolutePath).getOrElse {
      // millisecond timestamp (the reference uses seconds,
      // connection.py:118), bumped past any existing name — two
      // snapshots of a source modified twice within one tick must
      // not silently overwrite each other
      var ts = System.currentTimeMillis()
      var snap = dir.resolve(s"snapshot_${ts}_$base")
      while (Files.exists(snap)) {
        ts += 1; snap = dir.resolve(s"snapshot_${ts}_$base")
      }
      Files.copy(src, snap, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.COPY_ATTRIBUTES)
      snap.toAbsolutePath.toString
    }
  }

  // ---- SQLCipher page encryption (v4 defaults) ---------------------------

  /** SQLCipher layers page-level encryption under the standard SQLite
    * format (the reference decrypts with `pragma key`,
    * connection.py:146-147; the key arrives via the SEATALK_DB_KEY
    * env var, connection.py:49). The container format is public
    * (SQLCipher design doc + source): the first 16 file bytes are the
    * KDF salt (they REPLACE the "SQLite format 3\0" magic); every
    * page's non-reserved region is AES-256-CBC; the per-page reserve
    * (header byte 20, = 80 under v4) holds the 16-byte IV followed by
    * HMAC-SHA512(ciphertext || iv || page# as little-endian u32).
    * Keys: key = PBKDF2(passphrase, salt, iterations, 32) — or the
    * raw-key pragma form x'<64 hex>' which skips the KDF — and
    * hmacKey = PBKDF2(key, salt ⊕ 0x3a, 2, 32); the KDF/HMAC
    * function and iteration count are the cipher GENERATION's
    * ([[Config]]: v4 = SHA-512 × 256k, v3 = SHA-1 × 64k), probed
    * jointly with the page size via the page-1 HMAC. Page 1 is
    * encrypted from byte 16 (the salt occupies 0-15); its decrypted
    * bytes start at the page-size field, and the magic is
    * reconstituted. Everything here is JDK crypto — no new
    * dependencies. */
  private[graft] object SqlCipher {
    val saltLen = 16
    val ivLen = 16

    /** One cipher generation's parameters. SQLCipher's major
      * versions changed the KDF/HMAC defaults; both share the salt
      * layout, AES-256-CBC pages and the reserve = IV + HMAC rounded
      * up to the AES block. */
    final case class Config(name: String, macAlgo: String, hmacLen: Int,
        kdfIterations: Int) {
      val reserve: Int = {
        val raw = ivLen + hmacLen
        (raw + 15) / 16 * 16
      }
    }
    /** v4 (2018+): PBKDF2-HMAC-SHA512 × 256k, HMAC-SHA512. */
    val v4 = Config("v4", "HmacSHA512", 64, 256000)
    /** v3 (2013-2018): PBKDF2-HMAC-SHA1 × 64k, HMAC-SHA1. */
    val v3 = Config("v3", "HmacSHA1", 20, 64000)
    /** Probe order: current default first. */
    val configs = Seq(v4, v3)

    val hmacKdfIterations = 2

    /** PBKDF2 over RAW password bytes with the config's HMAC.
      * Hand-rolled (RFC 2898 §5.2) because the JDK SecretKeyFactory
      * variant takes char[] and re-encodes as UTF-8 — wrong for the
      * second derivation, whose "password" is the 32 raw key
      * bytes. */
    private[graft] def pbkdf2(macAlgo: String, password: Array[Byte],
        salt: Array[Byte], iterations: Int, dkLen: Int): Array[Byte] = {
      val mac = javax.crypto.Mac.getInstance(macAlgo)
      mac.init(new javax.crypto.spec.SecretKeySpec(password, macAlgo))
      val out = new Array[Byte](dkLen)
      var block = 1
      var filled = 0
      while (filled < dkLen) {
        mac.update(salt)
        mac.update(Array[Byte]((block >>> 24).toByte, (block >>> 16).toByte,
          (block >>> 8).toByte, block.toByte))
        var u = mac.doFinal()
        val acc = u.clone()
        var i = 1
        while (i < iterations) {
          u = mac.doFinal(u)
          var j = 0
          while (j < acc.length) { acc(j) = (acc(j) ^ u(j)).toByte; j += 1 }
          i += 1
        }
        val take = math.min(acc.length, dkLen - filled)
        System.arraycopy(acc, 0, out, filled, take)
        filled += take
        block += 1
      }
      out
    }

    private val rawKeyRe = "(?i)^x'([0-9a-f]{64})'$".r

    /** (cipher key, hmac key) from a `pragma key` value and the file
      * salt — passphrase (KDF) or x'hex' raw form. */
    def deriveKeys(cfg: Config, keySpec: String,
        salt: Array[Byte]): (Array[Byte], Array[Byte]) = {
      val key = keySpec match {
        case rawKeyRe(hex) =>
          hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        case pass =>
          pbkdf2(cfg.macAlgo, pass.getBytes(StandardCharsets.UTF_8), salt,
            cfg.kdfIterations, 32)
      }
      val hmacSalt = salt.map(b => (b ^ 0x3a).toByte)
      (key, pbkdf2(cfg.macAlgo, key, hmacSalt, hmacKdfIterations, 32))
    }

    private def pageMac(cfg: Config, hmacKey: Array[Byte], raw: Array[Byte],
        pageNo: Int, pageSize: Int): Array[Byte] = {
      val end = pageSize - cfg.reserve
      val start = if (pageNo == 1) saltLen else 0
      val mac = javax.crypto.Mac.getInstance(cfg.macAlgo)
      mac.init(new javax.crypto.spec.SecretKeySpec(hmacKey, cfg.macAlgo))
      mac.update(raw, start, end - start) // ciphertext
      mac.update(raw, end, ivLen) // iv
      mac.update(Array[Byte](pageNo.toByte, (pageNo >>> 8).toByte,
        (pageNo >>> 16).toByte, (pageNo >>> 24).toByte)) // LE page number
      mac.doFinal()
    }

    /** Does the stored page HMAC verify? Doubles as the key check and
      * the config/page-size probe (a wrong page size or cipher
      * generation misplaces the reserve, so the MAC cannot match). */
    def hmacOk(cfg: Config, hmacKey: Array[Byte], raw: Array[Byte],
        pageNo: Int, pageSize: Int): Boolean =
      java.security.MessageDigest.isEqual(
        pageMac(cfg, hmacKey, raw, pageNo, pageSize),
        java.util.Arrays.copyOfRange(raw,
          pageSize - cfg.reserve + ivLen,
          pageSize - cfg.reserve + ivLen + cfg.hmacLen))

    private def aes(mode: Int, key: Array[Byte], iv: Array[Byte],
        data: Array[Byte], off: Int, len: Int): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data, off, len)
    }

    /** Decrypt one raw page; the result is a standard-format SQLite
      * page (page 1 gets its magic back; the reserve region rides
      * along unread — `usable` already excludes it). */
    def decryptPage(cfg: Config, key: Array[Byte], hmacKey: Array[Byte],
        raw: Array[Byte], pageNo: Int, pageSize: Int): Array[Byte] = {
      require(hmacOk(cfg, hmacKey, raw, pageNo, pageSize),
        s"SQLCipher HMAC mismatch on page $pageNo — wrong key or corrupt page")
      val end = pageSize - cfg.reserve
      val start = if (pageNo == 1) saltLen else 0
      val iv = java.util.Arrays.copyOfRange(raw, end, end + ivLen)
      val pt = aes(javax.crypto.Cipher.DECRYPT_MODE, key, iv, raw, start,
        end - start)
      val out = new Array[Byte](pageSize)
      if (pageNo == 1)
        System.arraycopy("SQLite format 3".getBytes(StandardCharsets.US_ASCII),
          0, out, 0, 15)
      System.arraycopy(pt, 0, out, start, pt.length)
      System.arraycopy(raw, end, out, end, cfg.reserve)
      out
    }

    /** Encrypt one standard-format page — the fixture-writer
      * counterpart of [[decryptPage]] (tests build an encrypted store
      * with it; a pipeline could use it to write one back). The IV is
      * caller-supplied so fixtures stay deterministic. */
    private[graft] def encryptPage(cfg: Config, key: Array[Byte],
        hmacKey: Array[Byte], salt: Array[Byte], plain: Array[Byte],
        iv: Array[Byte], pageNo: Int, pageSize: Int): Array[Byte] = {
      val end = pageSize - cfg.reserve
      val start = if (pageNo == 1) saltLen else 0
      val ct = aes(javax.crypto.Cipher.ENCRYPT_MODE, key, iv, plain, start,
        end - start)
      val out = new Array[Byte](pageSize)
      if (pageNo == 1) System.arraycopy(salt, 0, out, 0, saltLen)
      System.arraycopy(ct, 0, out, start, ct.length)
      System.arraycopy(iv, 0, out, end, ivLen)
      val mac = pageMac(cfg, hmacKey, out, pageNo, pageSize)
      System.arraycopy(mac, 0, out, end + ivLen, cfg.hmacLen)
      out
    }
  }

  // ---- SQLite file format (sqlite.org/fileformat2.html) -----------------

  /** One declared column: name, type affinity, and whether it is the
    * INTEGER PRIMARY KEY (stored as NULL in records; value = rowid). */
  private[sources] case class Col(name: String, affinity: String, isIpk: Boolean)

  private[sources] case class TableDef(name: String, rootPage: Int, cols: Seq[Col])

  /** Read-only pager over one SQLite file, plaintext or SQLCipher-
    * encrypted (v4 defaults; detected by the missing magic — the salt
    * sits where "SQLite format 3\0" would). Not thread-safe; open one
    * per partition/task. */
  private[sources] final class PageFile(path: String, key: Option[String])
      extends AutoCloseable {
    def this(path: String) = this(path, None)
    private val raf = new RandomAccessFile(path, "r")

    private def readAt(off: Long, len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      raf.seek(off)
      raf.readFully(b)
      b
    }

    private val head16 = readAt(0, 16)
    private val plain =
      new String(head16, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3" &&
        head16(15) == 0

    /** (config, cipher key, hmac key, page size) for an encrypted
      * file. Neither the cipher generation nor the page size is
      * readable before decryption (the header field is itself
      * encrypted), so both are probed jointly: the page-1 HMAC only
      * verifies under the true (config, size), because anything else
      * misplaces the reserve region the MAC lives in or derives the
      * wrong keys. v4 defaults probe first, then v3 — the two KDFs a
      * store in the wild actually uses. */
    private val crypt: Option[(SqlCipher.Config, Array[Byte], Array[Byte], Int)] =
      if (plain) None
      else {
        val pass = key.getOrElse(sys.error(
          s"$path has no SQLite 3 magic: either it is " +
            "SQLCipher-encrypted (supply the key — the reference's " +
            "pragma key, connection.py:146) or it is not a SQLite " +
            "database at all"))
        val fileSize = raf.length()
        val sizes = Seq(4096, 1024, 2048, 8192, 512, 16384, 32768, 65536)
          .filter(p => fileSize % p == 0 && fileSize >= p)
        Some(SqlCipher.configs.iterator.map { cfg =>
          val (k, hk) = SqlCipher.deriveKeys(cfg, pass, head16)
          sizes.find(p => SqlCipher.hmacOk(cfg, hk, readAt(0, p), 1, p))
            .map(p => (cfg, k, hk, p))
        }.collectFirst { case Some(hit) => hit }
          .getOrElse(sys.error(
            s"$path: SQLCipher page-1 HMAC failed for every (cipher " +
              "generation, page size) candidate — wrong key, a " +
              "non-default cipher configuration (probed v4: " +
              "PBKDF2/HMAC-SHA512 x 256k, and v3: PBKDF2/HMAC-SHA1 " +
              "x 64k), or not a SQLite database at all")))
      }

    private val hdr: Array[Byte] =
      crypt match {
        case None => readAt(0, 100)
        case Some(_) => java.util.Arrays.copyOf(page(1), 100)
      }

    /** File-header page size is u16 big-endian; the value 1 encodes
      * 65536. For an encrypted file the probed size is authoritative
      * and the decrypted header field must agree. */
    val pageSize: Int = {
      val raw = ((hdr(16) & 0xff) << 8) | (hdr(17) & 0xff)
      val fromHdr = if (raw == 1) 65536 else raw
      crypt.foreach { case (_, _, _, ps) =>
        require(fromHdr == ps,
          s"decrypted header page size $fromHdr != probed $ps") }
      fromHdr
    }
    /** Usable bytes per page = page size minus the per-page reserved
      * region (header byte 20 — under SQLCipher v4 it is 80: IV +
      * page HMAC). */
    val usable: Int = pageSize - (hdr(20) & 0xff)
    require((hdr(56) & 0xff) == 0 && (hdr(57) & 0xff) == 0 &&
      (hdr(58) & 0xff) == 0 && ((hdr(59) & 0xff) == 1),
      "only UTF-8 text encoding is supported")

    /** Whole page, 1-indexed page numbers; decrypted transparently. */
    def page(n: Int): Array[Byte] = crypt match {
      case None => readAt((n.toLong - 1) * pageSize, pageSize)
      case Some((cfg, k, hk, ps)) =>
        SqlCipher.decryptPage(cfg, k, hk, readAt((n.toLong - 1) * ps, ps), n, ps)
    }
    override def close(): Unit = raf.close()
  }

  /** SQLite varint: 1-9 bytes big-endian base-128; the 9th byte, when
    * present, contributes all 8 bits. Returns (value, bytesConsumed). */
  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xff), 9)
  }

  /** Sign-extended big-endian integer of `len` bytes (record values). */
  private def beInt(b: Array[Byte], off: Int, len: Int): Long = {
    var v: Long = b(off).toLong // sign-extends
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    v
  }

  /** Unsigned big-endian u32 (page pointers are unsigned). */
  private def beU32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24 | (b(off + 1) & 0xff) << 16 |
      (b(off + 2) & 0xff) << 8 | (b(off + 3) & 0xff))

  /** Decode one record (header of serial types + body) into values:
    * null / Long / Double / String / Array[Byte]. */
  private def decodeRecord(p: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = varint(p, 0)
    val types = ArrayBuffer.empty[Long]
    var o = n0
    while (o < hdrLen) {
      val (t, n) = varint(p, o)
      types += t
      o += n
    }
    var body = hdrLen.toInt
    types.map { t =>
      t match {
        case 0 => null
        case n if n >= 1 && n <= 4 =>
          val len = n.toInt; val v = beInt(p, body, len); body += len; v
        case 5 => val v = beInt(p, body, 6); body += 6; v
        case 6 => val v = beInt(p, body, 8); body += 8; v
        case 7 =>
          val v = java.lang.Double.longBitsToDouble(beInt(p, body, 8))
          body += 8; v
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val v = new String(p, body, len, StandardCharsets.UTF_8)
          body += len; v
        case n if n >= 12 =>
          val len = ((n - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(p, body, body + len)
          body += len; v
        case n => sys.error(s"reserved serial type $n")
      }
    }.toArray
  }

  /** Assemble a table-leaf cell's full payload, following the overflow
    * chain when the payload exceeds its local share. The local-size
    * split is the format's exact rule (X = U-35 max local for table
    * leaves; spilled cells keep K or M local bytes) — each overflow
    * page is a 4-byte next-pointer plus up to U-4 payload bytes. */
  private def cellPayload(pf: PageFile, page: Array[Byte], cellOff: Int): (Long, Array[Byte]) = {
    val (payloadLen, n1) = varint(page, cellOff)
    val (rowid, n2) = varint(page, cellOff + n1)
    val p = payloadLen.toInt
    val dataOff = cellOff + n1 + n2
    val u = pf.usable
    val x = u - 35
    if (p <= x) {
      (rowid, java.util.Arrays.copyOfRange(page, dataOff, dataOff + p))
    } else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + (p - m) % (u - 4)
      val local = if (k <= x) k else m
      val out = new Array[Byte](p)
      System.arraycopy(page, dataOff, out, 0, local)
      var next = beU32(page, dataOff + local)
      var filled = local
      while (next != 0 && filled < p) {
        val op = pf.page(next)
        next = beU32(op, 0)
        val take = math.min(u - 4, p - filled)
        System.arraycopy(op, 4, out, filled, take)
        filled += take
      }
      require(filled == p, s"truncated overflow chain (got $filled of $p bytes)")
      (rowid, out)
    }
  }

  private def pageHeaderOff(pageNo: Int): Int = if (pageNo == 1) 100 else 0

  private def cellCount(page: Array[Byte], h: Int): Int =
    ((page(h + 3) & 0xff) << 8) | (page(h + 4) & 0xff)

  private def cellPointer(page: Array[Byte], h: Int, headerLen: Int, i: Int): Int = {
    val o = h + headerLen + 2 * i
    ((page(o) & 0xff) << 8) | (page(o + 1) & 0xff)
  }

  /** Leaf page numbers under `root`, via interior pages only. The
    * driver touches one page per interior node plus one TYPE BYTE per
    * child to classify it — metadata-scale work (fanout ~U/5, so
    * interior pages are a fraction of a percent of the file). */
  private[sources] def leafPages(pf: PageFile, root: Int): Seq[Int] = {
    val out = ArrayBuffer.empty[Int]
    def walk(no: Int): Unit = {
      val pg = pf.page(no)
      val h = pageHeaderOff(no)
      (pg(h) & 0xff) match {
        case 0x0d => out += no
        case 0x05 =>
          val n = cellCount(pg, h)
          var i = 0
          while (i < n) {
            walk(beU32(pg, cellPointer(pg, h, 12, i)))
            i += 1
          }
          walk(beU32(pg, h + 8)) // rightmost child
        case t => sys.error(s"page $no: unexpected b-tree page type 0x${t.toHexString}")
      }
    }
    walk(root)
    out.toSeq
  }

  /** All (rowid, values) records on one table leaf page. */
  private[sources] def leafRecords(pf: PageFile, no: Int): Seq[(Long, Array[Any])] = {
    val pg = pf.page(no)
    val h = pageHeaderOff(no)
    require((pg(h) & 0xff) == 0x0d, s"page $no is not a table leaf")
    (0 until cellCount(pg, h)).map { i =>
      val (rowid, payload) = cellPayload(pf, pg, cellPointer(pg, h, 8, i))
      (rowid, decodeRecord(payload))
    }
  }

  // ---- schema ------------------------------------------------------------

  /** SQLite type affinity from a declared type (the documented
    * substring rules): INT→integer, CHAR/CLOB/TEXT→text, BLOB or
    * empty→blob, REAL/FLOA/DOUB→real, else numeric. */
  private def affinity(decl: String): String = {
    val d = decl.toUpperCase
    if (d.contains("INT")) "integer"
    else if (d.contains("CHAR") || d.contains("CLOB") || d.contains("TEXT")) "text"
    else if (d.isEmpty || d.contains("BLOB")) "blob"
    else if (d.contains("REAL") || d.contains("FLOA") || d.contains("DOUB")) "real"
    else "numeric"
  }

  private val constraintKeywords =
    Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")

  /** Parse column (name, affinity, isIPK) out of a CREATE TABLE
    * statement: the body between the outer parens, split on top-level
    * commas. Covers the shapes a bootstrap meets (no exotic quoting
    * inside type names). */
  private[sources] def parseCreateTable(sql: String): Seq[Col] = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    require(open >= 0 && close > open, s"unparseable CREATE TABLE: $sql")
    val body = sql.substring(open + 1, close)
    val parts = ArrayBuffer.empty[String]
    var depth = 0
    var quote: Char = 0
    val cur = new StringBuilder
    body.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' | '`' => quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    parts += cur.result()
    parts.map(_.trim).filter(_.nonEmpty).flatMap { defn =>
      val head = defn.split("\\s+", 2)
      val rawName = head(0)
      if (constraintKeywords.contains(rawName.toUpperCase)) None
      else {
        val name = rawName.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("`").stripSuffix("`")
          .stripPrefix("[").stripSuffix("]")
        val rest = if (head.length > 1) head(1) else ""
        val typeTokens = rest.split("\\s+")
          .takeWhile(t => !constraintKeywords.contains(t.toUpperCase) &&
            !t.toUpperCase.startsWith("NOT") && !t.toUpperCase.startsWith("DEFAULT"))
        val decl = typeTokens.mkString(" ")
        val isIpk = affinity(decl) == "integer" &&
          rest.toUpperCase.matches("(?s).*PRIMARY\\s+KEY.*")
        Some(Col(name, affinity(decl), isIpk))
      }
    }.toSeq
  }

  /** Table definition from the schema table (`sqlite_schema`, rooted
    * at page 1: rows are (type, name, tbl_name, rootpage, sql)). */
  private[sources] def tableDef(pf: PageFile, table: String): TableDef = {
    val rows = leafPages(pf, 1).flatMap(leafRecords(pf, _))
    rows.collectFirst {
      case (_, vals)
          if vals(0) == "table" && vals(1) == table =>
        TableDef(table, vals(3).asInstanceOf[Long].toInt,
          parseCreateTable(vals(4).asInstanceOf[String]))
    }.getOrElse(sys.error(s"table $table not found in the sqlite schema"))
  }

  // ---- Spark surface -------------------------------------------------------

  private def sparkType(aff: String): DataType = aff match {
    case "integer" => LongType
    case "real" | "numeric" => DoubleType
    case "text" => StringType
    case "blob" => BinaryType
  }

  /** Coerce a dynamically-typed SQLite value into the column's
    * affinity-derived Spark type (SQLite cells carry their own type
    * per row; parquet needs one). Lossless for the shapes a sane
    * store contains; a text value in an integer column reads null. */
  private def coerce(v: Any, aff: String): Any = (v, aff) match {
    case (null, _) => null
    case (x: Long, "integer") => x
    case (x: Long, "real" | "numeric") => x.toDouble
    case (x: Double, "real" | "numeric") => x
    case (x: Double, "integer") => x.toLong
    case (x: String, "text") => x
    case (x: Long, "text") => x.toString
    case (x: Double, "text") => x.toString
    case (x: Array[Byte], "text") => new String(x, StandardCharsets.UTF_8)
    case (x: Array[Byte], "blob") => x
    case (x: String, "blob") => x.getBytes(StandardCharsets.UTF_8)
    case _ => null
  }

  /** Read one table of a (snapshot) SQLite file as a DataFrame.
    * Driver work: schema + interior-page walk (metadata). Row work:
    * leaf pages decode in parallel, `slices` partitions. */
  def readTable(spark: SparkSession, dbPath: String, table: String,
      slices: Int = 0, key: Option[String] = None): DataFrame = {
    val (tdef, leaves) = {
      val pf = new PageFile(dbPath, key)
      try {
        val d = tableDef(pf, table)
        (d, leafPages(pf, d.rootPage))
      } finally pf.close()
    }
    val schema = StructType(tdef.cols.map(c =>
      StructField(c.name, sparkType(c.affinity), nullable = true)))
    val cols = tdef.cols
    val n = if (slices > 0) slices
      else math.min(leaves.size, spark.sparkContext.defaultParallelism).max(1)
    val rows = spark.sparkContext.parallelize(leaves, n).mapPartitions { it =>
      // each task re-derives the page keys from the serialized pragma
      // key string — the KDF costs ~0.1 s once per task, dwarfed by
      // any real partition's page work
      val pf = new PageFile(dbPath, key)
      // materialize the partition before closing the handle (pages per
      // partition are bounded by the slice, so this is partition-local
      // memory, not a collect)
      val out = it.flatMap { pg =>
        leafRecords(pf, pg).map { case (rowid, vals) =>
          Row.fromSeq(cols.zipWithIndex.map { case (c, i) =>
            // the INTEGER PRIMARY KEY column is the rowid alias: its
            // record slot is NULL and the value is the cell's rowid
            if (c.isIpk) rowid
            else if (i < vals.length) coerce(vals(i), c.affinity)
            else null
          })
        }
      }.toArray
      pf.close()
      out.iterator
    }
    spark.createDataFrame(rows, schema)
  }

  /** The full reference bootstrap (`connect`, connection.py:128):
    * find the newest store in `dbDir`, snapshot it, and read
    * `chat_message` from the snapshot. The decryption key defaults to
    * the reference's env var (SEATALK_DB_KEY, connection.py:49) and
    * is only consulted for an actually-encrypted snapshot. */
  def connectChatMessages(spark: SparkSession, dbDir: String,
      snapshotsDir: String,
      key: Option[String] = sys.env.get("SEATALK_DB_KEY")): DataFrame = {
    val snap = createSnapshot(findLatestDatabase(dbDir), snapshotsDir)
    readTable(spark, snap, "chat_message", key = key)
  }

  /** chat_message → the events-shaped parquet the pipeline starts
    * from. Column mapping (reference processor.py:428 SELECT):
    * event_id=_mid, ts=_createAt (float epoch seconds → microsecond
    * TIMESTAMP_NTZ, truncating like Tables' nanos path), user_id=u,
    * event_type=t (rendered as text — SQLite stores both message-type
    * codes and tags like 'c.g.c.i' in t), props=c (the raw content
    * JSON that extractText consumes), value=NULL (the store has no
    * numeric measure), plus session_id=sid as an extra column (the
    * conversation key C-family queries group on). */
  def loadEvents(spark: SparkSession, dbPath: String, outDir: String,
      key: Option[String] = None): Long = {
    val msgs = readTable(spark, dbPath, "chat_message", key = key)
    val events = msgs.select(
      col("_mid").as("event_id"),
      expr("timestampadd(MICROSECOND, CAST(round(_createAt * 1e6) AS BIGINT), " +
        "timestamp_ntz'1970-01-01 00:00:00')").as("ts"),
      col("u").as("user_id"),
      col("t").cast(StringType).as("event_type"),
      lit(null).cast(DoubleType).as("value"),
      col("c").as("props"),
      col("sid").as("session_id"))
    events.write.mode("overwrite").parquet(s"$outDir/events.parquet")
    spark.read.parquet(s"$outDir/events.parquet").count()
  }
}
