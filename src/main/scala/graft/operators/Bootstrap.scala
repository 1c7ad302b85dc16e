package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{LayoutStore, Tables}

/** D20 — the COLD-START bootstrap episode: day-0 of the pipeline, the
  * counterpart of D13's steady-state daily loop (reference
  * `initialize.py:59-127` chains snapshot → extract → embed → store →
  * index as one first-run entry point; D13 checks what happens every
  * day AFTER this ran once).
  *
  * Two compositions share the stages:
  *
  *  - [[bootstrapQuery]] (`q_bootstrap`, the driver-checked row): from
  *    NOTHING persisted, walk the vector backlog with BOUNDED updates
  *    ([[EmbeddingStore.updateVectorsSince]], the initialize loop's
  *    `max_messages` batching — each call's memory/runtime fixed no
  *    matter how deep the backlog), then build the IVF index FROM THE
  *    STORE (not from the input frame — a half-written store fails
  *    the row), then read every reported number back from the
  *    persisted artifacts: update/processed/watermark facts from the
  *    walk, store_rows from a re-read of the store parquet, the
  *    six health columns from [[EmbeddingStore.indexStats]] over the
  *    built index. Every output is a pure function of the corpus, so
  *    DuckDB replays the whole episode (ceil(n/batch) updates, store
  *    = n rows, stats = the D9 fresh-build machinery).
  *
  *  - [[coldStart]] (spec-driven on the committed SQLite fixture —
  *    a SQLite file cannot be a DuckDB-oracle input): the FULL
  *    reference chain from an (optionally SQLCipher-encrypted)
  *    `main_*.sqlite` store — snapshot copy, chat_message B-tree
  *    read, events parquet, text extraction, embed, store, index —
  *    with the same read-back discipline.
  *
  * Scale shape: the walk is ceil(n/batch) bounded TakeOrdered+append
  * jobs (driver holds three counters); the index build is the
  * documented distributed build path; nothing corpus-shaped touches
  * the driver. Scratch lives under the cluster-shared layouts root
  * and deletes once the 1-row result pins. */
object Bootstrap {

  /** The backlog-walk bound per update call (the reference's
    * `max_messages` batching knob, engine.py:57 — 10000 by default
    * there; sized to the fixture corpora so the row exercises a
    * MULTI-batch walk at every SF). Shared with the oracle. */
  private[graft] val batchSize = 2000

  def bootstrapQuery(t: Tables): DataFrame = {
    val spark = t.spark
    // try/finally: the scratch lives under the DURABLE layouts root
    // (not OS-cleaned /tmp), so a mid-episode failure must not leak
    // a parquet store beside production data
    val base = LayoutStore.scratch(t.dir, "bootstrap")
    try bootstrapEpisode(t, spark, base.toString)
    finally LayoutStore.deleteRecursively(base)
  }

  private def bootstrapEpisode(t: Tables,
      spark: org.apache.spark.sql.SparkSession, base: String): DataFrame = {
    val storePath = s"$base/store"
    val indexPath = s"$base/ivf"
    val vectors = t.embeddings
      .select(col("vec_id").as("doc_id"), col("embedding"))
    // day-0 backlog walk: bounded updates from watermark -1 until a
    // call processes nothing (the reference's early-return drain)
    var watermark = -1L
    var nUpdates = 0L
    var processed = 0L
    var draining = true
    while (draining) {
      val u = EmbeddingStore.updateVectorsSince(
        vectors, storePath, watermark, Some(batchSize))
      if (u.processed > 0) {
        nUpdates += 1; processed += u.processed; watermark = u.newWatermark
      } else draining = false
    }
    // index FROM THE STORE: rows lost by a half-run walk are missing
    // from the build input, so the stats row would disagree with the
    // oracle's full-corpus replay
    val stored = spark.read.parquet(storePath)
      .select(col("doc_id"), col("embedding"))
    EmbeddingStore.buildIvfIndex(spark, stored, indexPath)
    val storeRows = spark.read.parquet(storePath).count()
    val out = EmbeddingStore.indexStats(spark, indexPath)
      .select(
        lit(nUpdates).as("n_updates"),
        lit(processed).as("total_processed"),
        lit(watermark).as("final_watermark"),
        lit(storeRows).as("store_rows"),
        col("n_vectors"), col("n_cells"), col("max_cell"),
        col("cell_skew"), col("appended_frac"), col("mean_intra_cosine"),
        col("pq_distortion"))
      // 1-row result: pin it so the caller's finally can delete the
      // per-invocation scratch immediately
      .localCheckpoint(true)
    out
  }

  /** Day-0 facts [[coldStart]] reports, every number read back from a
    * persisted artifact (never from in-flight frames). */
  case class ColdStartReport(
      snapshotPath: String,
      nEvents: Long,
      nExtracted: Long,
      nStored: Long,
      nIndexed: Long,
      nCells: Long)

  /** The full reference bootstrap chain from a SQLite store directory
    * (initialize.py:59-127): newest `main_*.sqlite` → snapshot copy →
    * `chat_message` B-tree read → events parquet → extract message
    * text (the C5 rule) → embed → shard-partitioned store → IVF
    * index. `key` decrypts a SQLCipher store (the reference's
    * SEATALK_DB_KEY path). Every reported number re-reads the
    * persisted stage output, so a half-run stage surfaces as a
    * mismatched report, not a silently smaller corpus. */
  def coldStart(t: Tables, dbDir: String, workDir: String,
      key: Option[String] = sys.env.get("SEATALK_DB_KEY"),
      encoder: Encoder = EmbeddingStore.defaultEncoder): ColdStartReport = {
    import graft.sources.SqliteSnapshot
    val spark = t.spark
    val snap = SqliteSnapshot.createSnapshot(
      SqliteSnapshot.findLatestDatabase(dbDir), s"$workDir/snapshots")
    SqliteSnapshot.loadEvents(spark, snap, workDir, key = key)
    val events = spark.read.parquet(s"$workDir/events.parquet")
    val nEvents = events.count()
    // extract → embeddable docs (the reference embeds the extracted
    // message text, processor.py:117); empty extractions drop like
    // the reference's content gate
    val docs = events.select(col("event_id").as("doc_id"),
      graft.functions.TextFunctions.extractText(
        col("props"), col("event_type")).as("text"))
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
    docs.write.mode("overwrite").parquet(s"$workDir/docs.parquet")
    val persisted = spark.read.parquet(s"$workDir/docs.parquet")
    val nExtracted = persisted.count()
    EmbeddingStore.store(
      EmbeddingStore.embedWith(encoder, persisted), s"$workDir/store")
    val stored = spark.read.parquet(s"$workDir/store")
    EmbeddingStore.buildIvfIndex(spark,
      stored.select(col("doc_id"), col("embedding")), s"$workDir/ivf")
    val stats = EmbeddingStore.indexStats(spark, s"$workDir/ivf").first()
    ColdStartReport(snap, nEvents, nExtracted, stored.count(),
      stats.getAs[Long]("n_vectors"), stats.getAs[Long]("n_cells"))
  }
}
