package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** E-family: document deduplication — the headline operators of a
  * training-data pipeline. Five escalating strategies over
  * `documents` (plus one over `embeddings`):
  *
  *  - E1 exact:     hash-groupBy on normalized text
  *  - E2 MinHash:   LSH banding — candidates shuffle on band bucket,
  *                  O(candidate pairs) not O(n²)
  *  - E3 SimHash:   32-bit md5 bit-vote fingerprint, Hamming ≤ 3 via
  *                  8-bit band pigeonhole (a pair within distance 3
  *                  MUST agree on one of 4 bands — banding is exact)
  *  - E4 Jaccard:   exact set-similarity via exploded-shingle
  *                  equi-join (only pairs sharing a shingle are ever
  *                  materialized — still no all-pairs)
  *  - E5 embedding: cosine near-dup pairs blocked by label cell
  *
  * Nothing here self-joins the raw corpus: every pair generator is an
  * equi-join on a derived key (bucket / band / shingle / cell), which
  * is the property that survives 100 TB. All hashing is md5-derived
  * so DuckDB replays it bit-for-bit (SURVEY.md §4).
  */
object Dedup {

  private val numHashes = 12
  private val numBands = 4 // 4 bands × 3 rows

  /** Documents with their distinct shingle sets. */
  private def shingled(t: Tables): DataFrame =
    t.documents.select(col("doc_id"), shingles3(words(col("text"))).as("s"))

  /** E1 — exact dedup: md5 of whitespace-normalized lowercase text,
    * keep the smallest doc_id per group. One hash-shuffle, map-side
    * partial agg; the scale-canonical first pass. */
  def dedupExact(t: Tables): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    t.documents
      .select(col("doc_id"), md5(norm).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("text_hash"))
      .orderBy(col("keep_id"))
  }

  /** E2 — MinHash + LSH banding. Per-row signature (12 string-min
    * md5 hashes — no shuffle to build), 4 band buckets per doc,
    * candidate pairs from an equi-join on bucket, exact-Jaccard
    * verification of candidates only. The only shuffles are the
    * bucket join and the final small joins back to shingle sets. */
  def dedupMinhash(t: Tables): DataFrame = {
    val base = shingled(t)
    val sigCols = (0 until numHashes).map { k =>
      array_min(transform(col("s"), sh => md5(concat(lit(s"$k:"), sh)))).as(s"h$k")
    }
    val sig = base.select(col("doc_id") +: sigCols: _*)
    val buckets = (0 until numBands).map { b =>
      sig.select(col("doc_id"),
        md5(concat(lit(s"$b|"),
          col(s"h${3 * b}"), col(s"h${3 * b + 1}"), col(s"h${3 * b + 2}"))).as("bucket"))
    }.reduce(_ unionByName _)
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** E3 — SimHash: 32-bit fingerprint by per-bit weighted vote over
    * all tokens (bit k votes +1 when md5("k:"+token) starts 0-7, the
    * MSB of the first nibble), then near-pairs at Hamming ≤ 3 found
    * through 4×8-bit band blocking (pigeonhole-exact for ≤ 3). */
  def dedupSimhash(t: Tables): DataFrame = {
    val ex = t.documents.select(col("doc_id"), explode(words(col("text"))).as("w"))
    val bitSums = (0 until 32).map { k =>
      sum(when(substring(md5(concat(lit(s"$k:"), col("w"))), 1, 1) <= "7", 1)
        .otherwise(-1)).as(s"s$k")
    }
    val sums = ex.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fpCol = (0 until 32).map { k =>
      when(col(s"s$k") >= 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    val fps = sums.select(col("doc_id"), fpCol.as("fp"))
    val bands = (0 until 4).map { b =>
      fps.select(col("doc_id"), col("fp"), lit(b).as("band"),
        shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L)).as("bv"))
    }.reduce(_ unionByName _)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fa"), col("b.fp").as("fb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(fa ^ fb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** E4 — exact n-gram Jaccard via the set-similarity equi-join:
    * explode shingles, join on shingle (only co-shingled pairs
    * exist), count common per pair, reconstruct |A∪B| from the two
    * set sizes. Exact, and never all-pairs. */
  def ngramJaccard(t: Tables): DataFrame = {
    val base = shingled(t)
    val sizes = base.select(col("doc_id"), size(col("s")).as("n"))
    val ex = base.select(col("doc_id"), explode(col("s")).as("sh"))
    val common = ex.as("a")
      .join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id"))
      .agg(count(lit(1)).as("common"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** E5 — embedding-cosine near-dup pairs, blocked by the `label`
    * cell (at scale: the IVF cell assignment) so the self-join is an
    * equi-join per cell, not a cross product. */
  def dedupEmbedding(t: Tables): DataFrame = {
    val e = t.embeddings.select(col("vec_id"), col("label"), col("embedding"))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        round(cosineSim(col("a.embedding"), col("b.embedding")), 6).as("score"))
      .filter(col("score") >= 0.35)
      .orderBy(col("score").desc, col("vec_a"), col("vec_b"))
  }
}
