package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.functions.TextFunctions.words

/** The table-format READ half of the H8–H11 mutation story: the
  * mutations write new GENERATIONS; these operators read them —
  * pinned to a past generation (H12 time travel), through a
  * delete-vector sidecar instead of a rewrite (H13 merge-on-read),
  * and as the per-key change set between two generations (H14 CDC).
  * Together they are the minimal from-scratch core of what Delta /
  * Iceberg / Hudi call snapshots, deletion vectors and change data
  * feeds — built on the same atomic-pointer commit machinery
  * StreamingDataCard's exactly-once sink uses (temp + ATOMIC_MOVE;
  * a reader never sees a missing or half-written table).
  *
  * (Reference posture: the reference mutates its embedding store in
  * place and keeps no history, engine.py:163 `update_embeddings`;
  * a 100 TB corpus under compliance rules cannot — every consumer
  * of H8's merged table needs "as of" reads, cheap deletes and an
  * incremental diff, which is exactly these three rows.)
  */
object TableFormat {

  // ---------------------------------------------------------------
  // Versioned-table core: gen_<g>/ dirs behind one atomic pointer
  // ---------------------------------------------------------------

  private def pointerPath(root: String) = Paths.get(root, "_GEN")

  private[graft] def genDir(root: String, gen: Long): String =
    s"$root/gen_$gen"

  /** Write `df` as generation `gen` and COMMIT it by atomically
    * replacing the `_GEN` pointer (temp file + ATOMIC_MOVE — the
    * StreamingDataCard commit discipline). Superseded generations
    * are NOT garbage-collected here: retaining them is the whole
    * point (time travel); a production deployment vacuums by
    * retention policy, exactly like a table format. */
  private[graft] def commitGen(df: DataFrame, root: String, gen: Long): Unit = {
    df.write.mode("overwrite").parquet(genDir(root, gen))
    val tmp = Files.createTempFile(Paths.get(root), "_GEN", ".tmp")
    Files.writeString(tmp, gen.toString)
    Files.move(tmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The committed generation id — the pointer's content. The
    * episode rows only read after a commit, so a missing pointer is
    * a defect here, not a recovery case (StreamingDataCard owns the
    * degraded-pointer story for crash-mid-commit streams). */
  private[graft] def currentGen(root: String): Long =
    Files.readString(pointerPath(root)).trim.toLong

  /** OPTIMISTIC-CONCURRENCY commit: install `df` as generation
    * `expected + 1` only if the table is still at generation
    * `expected` — the transaction-log conflict check every real
    * table format runs (Delta's protocol: reread the log, fail the
    * loser). Returns false (and writes nothing durable) when
    * another writer committed first; the caller re-derives its
    * change against the new current generation and retries — the
    * data work is the retry cost, never a corrupted table.
    *
    * The critical section is a `_LOCK` file created atomically
    * (O_EXCL semantics: exactly one creator wins); the check and
    * the pointer move happen inside it. A crash inside the section
    * leaves a stale lock — [[healLock]] reaps one older than its
    * staleness bound, the standard lease compromise (a table-format
    * service holds leases in its catalog instead; same shape). */
  private[graft] def tryCommitGen(df: DataFrame, root: String,
      expected: Long): Boolean = {
    val lock = Paths.get(root, "_LOCK")
    val acquired =
      try { Files.createFile(lock); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!acquired) false
    else
      try {
        if (currentGen(root) != expected) false
        else { commitGen(df, root, expected + 1); true }
      } finally Files.deleteIfExists(lock)
  }

  /** Reap a `_LOCK` left by a writer that died inside its critical
    * section, once it is older than `staleMillis`. Returns true if
    * a stale lock was removed. */
  private[graft] def healLock(root: String, staleMillis: Long): Boolean = {
    val lock = Paths.get(root, "_LOCK")
    Files.exists(lock) && {
      val age = System.currentTimeMillis() -
        Files.getLastModifiedTime(lock).toMillis
      age > staleMillis && Files.deleteIfExists(lock)
    }
  }

  /** Generation-pinned read with an EXPLICIT schema (the purge
    * read-back rule: inference must never re-type a column, and an
    * empty generation must read as an empty frame). */
  private[graft] def readGen(spark: SparkSession, root: String, gen: Long,
      schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(genDir(root, gen))

  /** H12 — `q_time_travel`: GENERATION-PINNED reads over a mutating
    * table — "the orders table AS OF generation 0" after the H8
    * merge has already committed generation 1 (Delta `VERSION AS
    * OF` / Iceberg snapshot reads). The episode: generation 0 =
    * yesterday's state (the shared H8/H9 episode rule), generation
    * 1 = the merged table, BOTH committed through the atomic
    * pointer; the manifest aggregates BOTH generations read back
    * AFTER the generation-1 commit — the gen-0 leg equals the
    * pre-merge state only if committing gen 1 never touched gen 0's
    * files, so the row itself proves non-destructive versioning.
    * `current_gen` pins the pointer's post-episode value.
    *
    * Scale shape: a generation is a plain immutable parquet dir, so
    * a pinned read costs exactly a current read (same pruning, same
    * pushdown — no log replay, no reconstruction); the commit is
    * one atomic filesystem op regardless of table size; what grows
    * with history is only retained bytes, which a retention-policy
    * vacuum bounds (the standard table-format trade). Both manifest
    * legs are map-side-combining aggregates. */
  def timeTravel(t: Tables): DataFrame = {
    val spark = t.spark
    val dir = LayoutStore.scratch(t.dir, "ttravel").toPath
    try {
      val root = dir.toString
      val (state, updates, inserts) = Export.mutationEpisode(t)
      commitGen(state, root, 0L)
      val schema = state.schema
      val merged = Export.mergeLatest(
        readGen(spark, root, 0L, schema),
        updates.unionByName(inserts), "o_orderkey")
      commitGen(merged, root, 1L)
      val pinnedGen = currentGen(root)
      def leg(gen: Long) =
        readGen(spark, root, gen, schema)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            graft.functions.Exact.dsum(col("o_totalprice")).as("total"),
            expr("bit_xor(o_orderkey)").as("key_xor"))
          .select(lit(gen).as("gen"), col("o_orderstatus"),
            col("n_orders"), col("total"), col("key_xor"))
      leg(0L).unionByName(leg(1L))
        .withColumn("current_gen", lit(pinnedGen))
        .orderBy(col("gen"), col("o_orderstatus"))
        .localCheckpoint(true)
    } finally LayoutStore.deleteRecursively(dir.toFile)
  }

  /** The RETENTION sweep over a versioned table: reap every
    * generation at or below `current − keep`, i.e. retain the
    * newest `keep` committed generations. Never touches generations
    * NEWER than the pointer (an in-flight uncommitted write) or the
    * pointer itself. Returns the reaped ids. Driver-side directory
    * ops, O(generations) regardless of table size. */
  private[graft] def vacuumGenerations(root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "retention must keep at least the current generation")
    val cur = currentGen(root)
    val reap = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen_"))
      .flatMap(f => f.getName.stripPrefix("gen_").toLongOption.map(_ -> f))
      .filter { case (g, _) => g <= cur - keep }
    reap.foreach { case (_, f) => LayoutStore.deleteRecursively(f) }
    reap.map(_._1).sorted.toSeq
  }

  /** H15 — `q_vacuum`: the RETENTION sweep that bounds what H12's
    * time travel lets grow (Delta VACUUM / Iceberg expire_snapshots)
    * — the lifecycle's last verb: commit (H8-H11), read pinned
    * (H12), diff (H14), then EXPIRE history by policy. Episode:
    * three committed generations (the mutation-episode state, the
    * H8 merge, the merge minus H14's takedown slice); retention
    * keeps 2 → generation 0 reaps. The manifest aggregates BOTH
    * retained generations READ BACK AFTER the sweep — the proof the
    * vacuum deleted ONLY what the policy named (a sweep that
    * touched a retained generation's files changes a corpus-derived
    * number); `n_reaped` pins the sweep's own report against the
    * oracle's literal 1, and the gen-0-is-gone half lives in the
    * spec (absence is a filesystem fact no SQL oracle can see).
    *
    * Scale shape: the sweep is driver-side directory removal,
    * O(generations) and data-size independent; the manifest legs
    * are map-side-combining aggregates. At 100 TB the policy is the
    * same two numbers (retain N, or retain by age) — what grows is
    * reclaimed bytes, not sweep cost. */
  def vacuum(t: Tables): DataFrame = {
    val spark = t.spark
    val dir = LayoutStore.scratch(t.dir, "vacuum").toPath
    try {
      val root = dir.toString
      val (state, updates, inserts) = Export.mutationEpisode(t)
      commitGen(state, root, 0L)
      val schema = state.schema
      val gen0 = readGen(spark, root, 0L, schema)
      val merged = Export.mergeLatest(gen0,
        updates.unionByName(inserts), "o_orderkey")
      commitGen(merged, root, 1L)
      val takedown = gen0
        .filter(pmod(col("o_orderkey"), lit(10L)) === 5L)
        .select(col("o_orderkey").as("__tk"))
      commitGen(readGen(spark, root, 1L, schema).join(takedown,
        col("o_orderkey") === col("__tk"), "left_anti"), root, 2L)
      val reaped = vacuumGenerations(root, keep = 2)
      val pinnedGen = currentGen(root)
      def leg(gen: Long) =
        readGen(spark, root, gen, schema)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            graft.functions.Exact.dsum(col("o_totalprice")).as("total"),
            expr("bit_xor(o_orderkey)").as("key_xor"))
          .select(lit(gen).as("gen"), col("o_orderstatus"),
            col("n_orders"), col("total"), col("key_xor"))
      leg(1L).unionByName(leg(2L))
        .withColumn("current_gen", lit(pinnedGen))
        .withColumn("n_reaped", lit(reaped.length.toLong))
        .orderBy(col("gen"), col("o_orderstatus"))
        .localCheckpoint(true)
    } finally LayoutStore.deleteRecursively(dir.toFile)
  }

  // ---------------------------------------------------------------
  // H13: merge-on-read delete vectors
  // ---------------------------------------------------------------

  /** The merge-on-read core: serve `store` MINUS the ids in the
    * delete-vector sidecar — one broadcast anti-join applied at
    * READ time (takedown lists are human-scale; at billions of
    * deleted positions a format switches to partition-local bitmap
    * sidecars, a representation change on the same read shape).
    * Shared by [[purgeDv]] and its spec's rewrite-equivalence
    * proof. */
  private[graft] def applyDv(store: DataFrame, dv: DataFrame): DataFrame =
    store.join(broadcast(dv.select(col("doc_id").as("__dv"))),
      col("doc_id") === col("__dv"), "left_anti")
      .drop("__dv")

  /** H13 — `q_purge_dv`: the takedown purge H10 executes by REWRITE,
    * executed the way production table formats actually commit it —
    * a DELETE-VECTOR sidecar (Delta deletion vectors / Iceberg
    * position deletes) applied at read time: the store's data files
    * are untouched; the commit is one small sidecar write; every
    * read anti-joins the sidecar. Same episode as H10 (takedown =
    * doc_id ≡ 0 mod 97), same manifest, same oracle — and the
    * `residual` audit runs THROUGH the DV read path, so a read path
    * that misses one listed row fails the gate from inside the row.
    *
    * Scale shape: the write side is O(|list|) regardless of store
    * size — that is the entire point versus H10's full rewrite (the
    * format pays a per-read anti-join until a compaction folds the
    * DV in; H7's rewriteStores is exactly that fold). The read is
    * one broadcast anti-join: no shuffle of the store, pruning and
    * pushdown on the data files unchanged. */
  def purgeDv(t: Tables): DataFrame = {
    val spark = t.spark
    val dir = LayoutStore.scratch(t.dir, "purgedv").toPath
    try {
      val store = s"$dir/store"
      t.documents.write.partitionBy("source").parquet(store)
      val docSchema = StructType.fromDDL(
        "doc_id LONG, text STRING, lang STRING, n_chars LONG, source STRING")
      def readBack(p: String) = spark.read.schema(docSchema).parquet(p)
      val listed = col("doc_id") % 97 === 0
      // the DV commit: ONLY the listed ids, persisted as the sidecar
      val dvPath = s"$dir/dv"
      readBack(store).filter(listed).select(col("doc_id")).write.parquet(dvPath)
      val dv = spark.read.schema(StructType.fromDDL("doc_id LONG")).parquet(dvPath)
      val nPurged = dv.count()
      // every read goes through the sidecar — including the audit
      def mor = applyDv(readBack(store), dv)
      val residual = mor.filter(listed).count()
      mor
        .select(col("source"), col("doc_id"),
          size(words(col("text"))).cast(LongType).as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          expr("bit_xor(doc_id)").as("id_xor"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("id_xor"),
          lit(nPurged).as("n_purged"), lit(residual).as("residual"))
        .orderBy(col("source"))
        .localCheckpoint(true)
    } finally LayoutStore.deleteRecursively(dir.toFile)
  }

  // ---------------------------------------------------------------
  // H14: CDC changefeed between two generations
  // ---------------------------------------------------------------

  /** The CDC core — the per-key change set that turns generation
    * `prev` into generation `next`: `insert` (key only in next),
    * `delete` (key only in prev), `update_pre`/`update_post` (key in
    * both, row CHANGED — identical rows emit nothing, the no-op
    * suppression a changefeed consumer relies on). Null-safe
    * struct comparison; ONE full-outer shuffle join on the key,
    * nothing pairwise, output bounded by |prev Δ next|. */
  private[graft] def cdcDiff(prev: DataFrame, next: DataFrame,
      key: String): DataFrame = {
    val cols = prev.columns
    val p = prev.select(col(key).as("__k"),
      struct(cols.map(col).toIndexedSeq: _*).as("__pre"))
    val n = next.select(col(key).as("__k2"),
      struct(cols.map(col).toIndexedSeq: _*).as("__post"))
    def tagged(tag: String, row: org.apache.spark.sql.Column) =
      struct(lit(tag).as("change_type"), row.as("row"))
    p.join(n, col("__k") === col("__k2"), "full_outer")
      .select(explode(
        when(col("__k").isNull, array(tagged("insert", col("__post"))))
          .when(col("__k2").isNull, array(tagged("delete", col("__pre"))))
          .when(!(col("__pre") <=> col("__post")),
            array(tagged("update_pre", col("__pre")),
              tagged("update_post", col("__post"))))
          // identical rows: NULL, which explode drops — the no-op
          // suppression (an empty typed array would need a DDL cast)
          .otherwise(lit(null)))
        .as("c"))
      .select(col("c.change_type").as("change_type"), col("c.row.*"))
  }

  /** Replay a [[cdcDiff]] change set onto its base generation:
    * drop the keys the feed closes (deletes + update_pre), append
    * the rows it opens (inserts + update_post). The spec proves
    * apply(gen N, diff) ≡ gen N+1 row-for-row — the contract that
    * makes a changefeed a substitute for re-reading the table. */
  private[graft] def applyChanges(prev: DataFrame, changes: DataFrame,
      key: String): DataFrame = {
    val closed = changes
      .filter(col("change_type").isin("delete", "update_pre"))
      .select(col(key).as("__ck"))
    val opened = changes
      .filter(col("change_type").isin("insert", "update_post"))
      .drop("change_type")
    prev.join(closed, col(key) === col("__ck"), "left_anti")
      .unionByName(opened)
  }

  /** H14 — `q_cdc`: the CHANGE DATA FEED between two committed
    * generations (Delta CDF / Iceberg changelog scan) — the
    * artifact every incremental downstream consumer (E11's dedup
    * state, the IVF append path, any materialized aggregate)
    * subscribes to instead of re-diffing full generations. Episode:
    * generation 0 = the shared mutation-episode state; generation 1
    * = H8's merge PLUS a takedown slice (lower-half keys ≡ 5 mod 10
    * — disjoint from the update slice ≡ 0 mod 10, so every change
    * type appears); the feed is computed by diffing the two
    * READ-BACK generations, so it reports what the table actually
    * did, not what the writer intended. Output = the change rows
    * themselves (change_type + the full row), the consumer-facing
    * shape.
    *
    * Scale shape: one full-outer shuffle join on the key between
    * two generations (a format with a commit log scopes this to the
    * files the commit touched — composition, same diff); no-op
    * suppression bounds the feed by the true change mass; applying
    * the feed (see [[applyChanges]]) is H8's own anti-join + union
    * shape. */
  def cdc(t: Tables): DataFrame = {
    val spark = t.spark
    val dir = LayoutStore.scratch(t.dir, "cdc").toPath
    try {
      val root = dir.toString
      val (state, updates, inserts) = Export.mutationEpisode(t)
      commitGen(state, root, 0L)
      val schema = state.schema
      val gen0 = readGen(spark, root, 0L, schema)
      val merged = Export.mergeLatest(gen0,
        updates.unionByName(inserts), "o_orderkey")
      // the takedown slice: state keys ≡ 5 mod 10 (disjoint from the
      // update slice ≡ 0 mod 10, so all four change types appear);
      // keyed off gen 0 so upper-half INSERTS sharing the residue
      // survive — an anti join on the same key the merge shuffled on
      val takedown = gen0
        .filter(pmod(col("o_orderkey"), lit(10L)) === 5L)
        .select(col("o_orderkey").as("__tk"))
      commitGen(merged.join(takedown,
        col("o_orderkey") === col("__tk"), "left_anti"), root, 1L)
      cdcDiff(gen0, readGen(spark, root, 1L, schema), "o_orderkey")
        .orderBy(col("change_type"), col("o_orderkey"))
        .localCheckpoint(true)
    } finally LayoutStore.deleteRecursively(dir.toFile)
  }
}
