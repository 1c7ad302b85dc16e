package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Bootstrap, EmbeddingStore}
import graft.sources.Tables

/** The day-0 cold-start episode (reference initialize.py:59-127):
  * q_bootstrap's backlog-walk composition is oracle-checked by the
  * driver; these tests drive the FULL chain — including the SQLite
  * leg a DuckDB oracle cannot replay — and pin the read-back
  * discipline. */
class BootstrapSpec extends SparkTestBase {

  private val t = Tables(spark, sfDir)

  test("coldStart from the committed 2000-row SQLite fixture: every reported " +
    "number re-reads a persisted stage, the index probes") {
    val dbDir = new java.io.File(
      getClass.getResource("/seatalk/main_1756000000.sqlite").getPath).getParent
    val work = Files.createTempDirectory("graft-bootstrap").toString
    val rep = Bootstrap.coldStart(t, dbDir, work, key = None)
    assert(rep.nEvents === 2000)
    // the extraction count equals the C5 rule applied to the PERSISTED
    // events parquet — not to anything in-flight
    val events = spark.read.parquet(s"$work/events.parquet")
    val expected = events.select(TextFunctions.extractText(
        col("props"), col("event_type")).as("x"))
      .filter(col("x").isNotNull && length(trim(col("x"))) > 0).count()
    assert(rep.nExtracted === expected && rep.nExtracted > 0)
    // store and index carry every extracted doc; cells follow the rule
    assert(rep.nStored === rep.nExtracted)
    assert(rep.nIndexed === rep.nStored)
    // <= : the Lloyd reassignment may empty a seeded cell
    assert(rep.nCells >= 2 &&
      rep.nCells <= EmbeddingStore.numCellsFor(rep.nStored))
    // the built index actually serves a probe
    val anyDoc = graft.sources.IndexCatalog.read(spark, s"$work/ivf", "cells")
      .agg(min(col("doc_id"))).first().getLong(0)
    assert(EmbeddingStore.searchIvf(spark, s"$work/ivf", anyDoc, k = 5).count() > 0)
  }

  test("coldStart decrypts an SQLCipher store end-to-end (the SEATALK_DB_KEY path)") {
    val dbDir = Files.createTempDirectory("graft-bootstrap-enc")
    Files.write(dbDir.resolve("main_1.sqlite"),
      MiniSqliteDb.encryptedFile("graft test key", table = "chat_message"))
    val work = Files.createTempDirectory("graft-bootstrap-enc-work").toString
    val rep = Bootstrap.coldStart(t, dbDir.toString, work,
      key = Some("graft test key"))
    assert(rep.nEvents === MiniSqliteDb.rows.length)
    // rows with empty content drop at the extraction gate; the rest
    // flow through store and index
    val nonEmpty = MiniSqliteDb.rows.count(_._3.trim.nonEmpty)
    assert(rep.nExtracted === nonEmpty)
    assert(rep.nStored === nonEmpty && rep.nIndexed === nonEmpty)
    // the wrong key fails loudly, not with silently garbled rows
    intercept[Exception] {
      Bootstrap.coldStart(t, dbDir.toString,
        Files.createTempDirectory("graft-bootstrap-bad").toString,
        key = Some("wrong key"))
    }
  }

  test("bootstrapQuery: the walk's facts agree with the corpus and the store " +
    "builds the exact index") {
    val rows = Bootstrap.bootstrapQuery(t).collect()
    assert(rows.length === 1)
    val r = rows.head
    val n = t.embeddings.count()
    val batches = math.ceil(n.toDouble / Bootstrap.batchSize).toLong
    assert(r.getAs[Long]("n_updates") === batches)
    assert(r.getAs[Long]("total_processed") === n)
    assert(r.getAs[Long]("store_rows") === n)
    assert(r.getAs[Long]("n_vectors") === n)
    assert(r.getAs[Long]("final_watermark") ===
      t.embeddings.agg(max(col("vec_id"))).first().getLong(0))
    assert(r.getAs[Long]("n_cells") === EmbeddingStore.numCellsFor(n))
    assert(r.getAs[Double]("appended_frac") === 0.0)
  }
}
