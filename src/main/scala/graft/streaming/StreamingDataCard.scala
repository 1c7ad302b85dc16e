package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.words
import graft.operators.TextAnalysis

/** LIVE data-card maintenance — the streaming sibling of F16's
  * per-source data card (`q_source_profile`): as document files land
  * in a drop directory, each micro-batch folds its per-source
  * partials (doc count, token volume, quality micro-sums) into a
  * persisted card table, so the "what is in this corpus" audit is
  * continuously current instead of a nightly batch job (the
  * reference's stats entry point, engine.py:228, served live).
  *
  * Spark-first, the poll loop disappears: `readStream` over the drop
  * dir IS the incremental scan, and the per-source partials are the
  * SAME additive integer sums batch uses — tokens = F3's whitespace
  * rule, quality = F2's [[TextAnalysis.qualityExpr]] in integer
  * micro-units (empty-text NULLs drop from sum AND count), so the
  * folded card equals a batch recompute over everything ingested,
  * exactly (StreamingRecoverySpec reconciles column-for-column
  * against F16's own data card, language mix included: the state is
  * keyed per (source, predicted language) — per-language counts ARE
  * additive, and the majority collapses at read time with F16's
  * exact tie rule. The one F16 column NOT here is the dup rate, by
  * design: exact-dup needs cross-batch text hashes, which is
  * StreamingDeduper's keyed-state job).
  *
  * Exactly-once: foreachBatch + the TABLE-FORMAT COMMIT CORE — the
  * card is a [[graft.sources.TableFormat]] versioned table (the
  * round-17 verdict's "one commit protocol should own every store":
  * this sink predated the core and carried its own pointer swap).
  * Batch b folds the current generation with its delta and commits
  * it as the next generation via [[graft.sources.TableFormat
  * .commitGen]], with the (appId, batchId) idempotent-writer record
  * landing ATOMICALLY inside the generation (the same `txn` lineage
  * the versioned sink uses — replay detection reads it back, so a
  * crash-replayed batch skips without any separate mutable marker).
  * A crash before the marker CAS leaves the OLD generation fully
  * live plus an unreferenced staged dir the retention sweep ages
  * out; the two-generation grace window the old pointer GC kept is
  * now [[graft.sources.TableFormat.vacuumGenerations]] with
  * keep = 2. States written by BOTH previous layouts still read and
  * upgrade in place: the `_CARD`-pointer lineage (including its
  * newest-`_SUCCESS`-complete-card damage recovery) and the
  * pre-pointer single `card/` dir, each consulted only when no
  * table-format generation exists, and retired with the same grace
  * rule once the new lineage is two generations deep. */
object StreamingDataCard {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def pointerPath(cardPath: String) =
    java.nio.file.Paths.get(cardPath, "_CARD")

  /** Newest COMPLETE versioned card on disk (its parquet `_SUCCESS`
    * marker present — a crash mid-write leaves none), for pointer
    * recovery. Dirs ahead of a lost pointer are only ever fully
    * written + uncommitted, so resolving to the newest complete one
    * is safe: its content is exactly pointed-card + that batch's
    * delta, and the replayed batch skips on the id guard. */
  private def newestCompleteCard(cardPath: String): Long =
    Option(new java.io.File(cardPath).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(d => d.getName.startsWith("card_") &&
        new java.io.File(d, "_SUCCESS").isFile)
      .flatMap(d => d.getName.stripPrefix("card_").toLongOption)
      .sorted.lastOption.getOrElse(-1L)

  /** The PRE-pointer layout's committed batch id (`_STREAM_BATCH`
    * marker beside a single mutable `card/` dir) — consulted only
    * when no versioned card exists, so a state written by the
    * previous release keeps its folded history across the upgrade
    * instead of silently restarting from one batch's delta (the
    * stream checkpoint would never re-deliver the old files). */
  private def legacyCommitted(cardPath: String): Long = {
    val f = java.nio.file.Paths.get(cardPath, "_STREAM_BATCH")
    if (!java.nio.file.Files.exists(f) ||
      !new java.io.File(cardPath, "card").isDirectory) -1L
    else
      java.nio.file.Files.readString(f).trim.toLongOption.getOrElse(-1L)
  }

  /** The committed batch id: the `_CARD` pointer's content, written
    * only by ATOMIC_MOVE so it can never be torn. A missing or
    * unparseable pointer (fresh state, manual damage) degrades to
    * the newest complete versioned card on disk, then to the legacy
    * single-dir layout — a fresh state has neither and reads -1 —
    * instead of reading folded history as empty or throwing
    * NumberFormatException on every subsequent micro-batch. */
  private def lastCommitted(cardPath: String): Long = {
    val scanned = versionedCommitted(cardPath)
    if (scanned >= 0) scanned else legacyCommitted(cardPath)
  }

  /** The committed id within the VERSIONED lineage only: the pointer
    * content, degrading to the newest complete card dir when the
    * pointer is missing or unparseable; -1 when no versioned card has
    * ever committed. The ONE place the pointer file is parsed —
    * [[lastCommitted]] (the batch-id guard) and [[currentCardDir]]
    * (the fold base) both resolve through it, so they can never
    * disagree on the lineage. */
  private def versionedCommitted(cardPath: String): Long = {
    val f = pointerPath(cardPath)
    if (!java.nio.file.Files.exists(f)) newestCompleteCard(cardPath)
    else
      java.nio.file.Files.readString(f).trim.toLongOption
        .getOrElse(newestCompleteCard(cardPath))
  }

  /** The directory of the committed card, if any batch has committed
    * and its table still exists: the versioned `card_<id>` dir, or
    * the legacy `card/` dir ONLY when the state predates the pointer
    * format entirely (the first post-upgrade commit folds it into a
    * versioned card and garbage-collects it). Provenance matters: an
    * id resolved from the VERSIONED lineage whose dir has gone
    * missing (manual damage) degrades to the newest complete
    * versioned card, never to a stale pre-upgrade `card/` left by a
    * crashed migration — that dir's history predates every versioned
    * commit, and serving it as the fold base would silently drop
    * everything folded since the upgrade. */
  private def currentCardDir(cardPath: String): Option[java.io.File] = {
    val versioned = versionedCommitted(cardPath)
    if (versioned >= 0)
      Some(new java.io.File(cardPath, s"card_$versioned"))
        .filter(_.isDirectory)
        .orElse(Some(newestCompleteCard(cardPath)).filter(_ >= 0)
          .map(b => new java.io.File(cardPath, s"card_$b"))
          .filter(_.isDirectory))
    else Some(new java.io.File(cardPath, "card")).filter(_.isDirectory)
  }

  /** The additive per-(source, predicted-language) partials of a
    * document frame — the ONE fold rule both the micro-batch side
    * and the spec's batch reconciliation use. Keyed one level finer
    * than the published card: per-language counts ARE additively
    * foldable where a majority is not, which is exactly why the
    * state carries them — the majority collapses at READ time
    * ([[readCard]]), not fold time. Language = F1's shared
    * [[TextAnalysis.langPredExpr]] rule, so the streaming card and
    * the batch data card (F16) can never disagree on a prediction. */
  private[graft] def partials(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      TextAnalysis.langPredExpr.as("lang"),
      size(words(col("text"))).cast(LongType).as("toks"),
      round(TextAnalysis.qualityExpr * 1e6, 0).cast(LongType).as("q_mu"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("q_mu")).as("q_sum"),
        count(col("q_mu")).as("q_n"))

  private val stateSchema =
    "source STRING, lang STRING, n_docs LONG, n_tokens LONG, q_sum LONG, q_n LONG"

  /** Read the current card (an empty frame with the right schema if
    * nothing has been ingested yet — a missing state dir must read
    * as "no sources", not throw): per source, docs, tokens, mean
    * tokens, the F16-exact mean quality, and the language mix —
    * n_langs + majority language with F16's exact tie rule (highest
    * count, then lexicographically first), collapsed from the
    * per-language state rows at read time. */
  def readCard(spark: SparkSession, cardPath: String): DataFrame = {
    val state = graft.sources.TableFormat.currentGenOption(cardPath)
      .map(g => graft.sources.TableFormat.readGen(spark, cardPath, g,
        StructType.fromDDL(stateSchema)))
      .orElse(currentCardDir(cardPath).map(d =>
        spark.read.schema(stateSchema).parquet(d.getPath)))
      .getOrElse(
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType.fromDDL(stateSchema)))
    state.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("q_sum")).as("q_sum"),
        sum(col("q_n")).as("q_n"),
        count(lit(1)).as("n_langs"),
        min(struct((-col("n_docs")).as("nc"), col("lang").as("lg"))).as("m"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 6).as("mean_tokens"),
        round(col("q_sum").cast("double") / col("q_n").cast("double") /
          lit(1e6), 6).as("mean_quality"),
        col("n_langs"), col("m.lg").as("top_lang"))
      .orderBy(col("source"))
  }

  /** The idempotent-writer identity this checkpoint implies — the
    * versioned sink's derivation rule (a fresh checkpoint location
    * is a fresh writer). */
  private def appIdFor(checkpointDir: String): String = {
    val c = new java.util.zip.CRC32C()
    c.update(java.nio.file.Paths.get(checkpointDir).toAbsolutePath
      .normalize.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f"dcard_${c.getValue}%08x"
  }

  /** The committed batch id across ALL lineages: this writer's
    * table-format txn record (the new layout); then — for a RESET
    * checkpoint whose derived appId finds no record against a table
    * other writers folded — the newest record of ANY writer, which
    * preserves the pointer era's appId-blind semantics (redelivered
    * batches SKIP rather than double-fold: a fresh checkpoint
    * re-delivers files whose partials the card already holds); then
    * the legacy pointer/marker resolution for pre-upgrade states. */
  private def lastCommittedAny(cardPath: String, appId: String): Long = {
    val txns = graft.sources.TableFormat.txnTable(cardPath)
    txns.get(appId)
      .orElse(if (txns.nonEmpty) Some(txns.values.max) else None)
      .getOrElse(lastCommitted(cardPath))
  }

  /** Start the card maintenance over a document drop directory.
    * Trigger semantics as in [[StreamingVectorIngest.run]]. */
  def run(spark: SparkSession, inputDir: String, cardPath: String,
      checkpointDir: String, availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cardPath))
    val appId = appIdFor(checkpointDir)
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val docs = reader.parquet(inputDir)
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.sources.TableFormat
        if (batchId > lastCommittedAny(cardPath, appId) && !batch.isEmpty) {
          val delta = partials(batch)
          // fold base: the current table-format generation, or a
          // pre-upgrade state (pointer layout, then single-dir) so an
          // upgraded deployment keeps its folded history
          val prevState = TableFormat.currentGenOption(cardPath)
            .map(g => TableFormat.readGen(spark, cardPath, g,
              StructType.fromDDL(stateSchema)))
            .orElse(currentCardDir(cardPath).map(d =>
              spark.read.schema(stateSchema).parquet(d.getPath)))
          val merged = prevState match {
            case Some(prev) =>
              prev.unionByName(delta)
                .groupBy(col("source"), col("lang"))
                .agg(sum(col("n_docs")).as("n_docs"),
                  sum(col("n_tokens")).as("n_tokens"),
                  sum(col("q_sum")).as("q_sum"),
                  sum(col("q_n")).as("q_n"))
            case None => delta
          }
          // COMMIT through the table-format core: the next generation
          // plus the (appId, batchId) txn record, atomic behind the
          // marker install — a crash-replayed batch re-folds and
          // overwrites the same UNCOMMITTED generation idempotently,
          // a replay of a committed batch skips on the txn guard
          val g = TableFormat.currentGenOption(cardPath)
            .map(_ + 1).getOrElse(0L)
          TableFormat.commitGen(merged, cardPath, g,
            txn = Some(appId -> batchId))
          // two-generation grace window (the snapshot-table
          // compromise the old pointer GC kept), now the format's own
          // retention sweep
          if (g >= 2) TableFormat.vacuumGenerations(cardPath, keep = 2)
          // LEGACY retirement with the same grace rule: once the new
          // lineage is two generations deep, every pre-upgrade
          // artifact is at least two generations stale
          if (g >= 1) {
            Option(new java.io.File(cardPath).listFiles())
              .getOrElse(Array.empty[java.io.File])
              .filter(d => d.isDirectory && (d.getName == "card" ||
                d.getName.startsWith("card_")))
              .foreach(graft.sources.LayoutStore.deleteRecursively)
            java.nio.file.Files.deleteIfExists(pointerPath(cardPath))
            java.nio.file.Files.deleteIfExists(
              java.nio.file.Paths.get(cardPath, "_STREAM_BATCH"))
          }
          ()
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
