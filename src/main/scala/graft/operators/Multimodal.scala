package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** G1 — multimodal payload plumbing. Image/audio/video assets ride
  * through the pipeline as opaque `binary` columns plus typed
  * metadata; all Spark-side mechanics (binary casts, byte lengths,
  * content hashing, per-row decode, grouped rollups) are real and
  * oracle-checked, while the decode itself is a clearly-marked
  * deterministic STUB (`stubDecode`) — no media libraries exist in
  * this container. In production the stub body is the only thing that
  * changes: swap the arithmetic for an image decoder inside the same
  * per-row column contract (or a `mapPartitions` batch decoder for
  * vectorized codecs) and every downstream plan is unchanged.
  */
object Multimodal {

  /** STUB decoder: derives fake "decoded dimensions" from the payload
    * byte length. Deterministic + engine-portable, so the oracle can
    * replay it; replace with a real codec at the same signature. */
  def stubDecode(nBytes: Column): (Column, Column) =
    ((nBytes % 640).cast(LongType), ((nBytes * 7) % 480).cast(LongType))

  /** G2 — `q_media_chunks`: fixed-size chunking of each binary
    * payload — THE batch shape a vectorized decoder / feature
    * extractor consumes (a real pipeline feeds these chunk rows to a
    * `mapPartitions` batch codec; here the per-chunk "feature" is the
    * md5 identity, deterministic on both engines). One explode over a
    * computed chunk-index sequence, then per-row binary slicing — no
    * shuffle, scan-speed at 100 TB. Chunk rows stay in their reading
    * task's partition, so a pathologically large payload keeps its
    * chunks local — when payloads reach GBs, add a
    * repartition(doc_id, chunk_idx) below the decoder (and cap the
    * sequence size) to spread one payload's work; no output ordering,
    * as the driver compare canonicalizes row order (same contract as
    * q_filter_project). */
  def mediaChunks(t: Tables): DataFrame = {
    val chunk = 64
    // substr offsets are Int: cap the chunk count so chunk_idx*chunk
    // stays below Int.MaxValue — without it a payload near the 2 GB
    // binary limit overflows the int cast, which THROWS under ANSI
    // mode instead of wrapping. The cap is the promised contract for
    // GB payloads (the oracle carries the same LEAST).
    val maxChunks = Int.MaxValue.toLong / chunk - 1
    val payload = col("text").cast("binary")
    val nb = length(payload).cast(LongType)
    val nChunks = least(ceil(nb / lit(chunk.toDouble)).cast(LongType),
      lit(maxChunks))
    t.documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), payload.as("p"), nb.as("nb"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunk.toLong), col("nb") - col("chunk_idx") * chunk)
          .as("chunk_bytes"),
        md5(col("p").substr(
          (col("chunk_idx") * chunk + 1).cast("int"), lit(chunk)))
          .as("chunk_md5"))
  }

  /** G3 — `q_frame_sample`: fixed-stride frame sampling over the
    * payload (the video-pipeline shape: 16-byte stub "frames", every
    * 4th sampled). The sampled-offset sequence is computed per row
    * and exploded; each sampled frame is sliced and identity-hashed,
    * then rolled up per doc. Swap the md5 for a real frame decoder at
    * the same slice contract and the plan is unchanged. */
  def frameSample(t: Tables): DataFrame = {
    val frameB = 16
    val stride = 4
    // same int-offset cap as mediaChunks: sampled frame offsets must
    // stay below Int.MaxValue for the substr cast (n_frames itself
    // stays uncapped — it is payload metadata, not an offset)
    val maxFrames = Int.MaxValue.toLong / frameB - 1
    val payload = col("text").cast("binary")
    val nFrames = floor(length(payload) / lit(frameB.toDouble)).cast(LongType)
    t.documents
      .filter(length(col("text")) >= frameB)
      .select(col("doc_id"), payload.as("p"), nFrames.as("n_frames"),
        explode(sequence(lit(0L), least(nFrames, lit(maxFrames)) - 1,
          lit(stride.toLong))).as("fi"))
      .select(col("doc_id"), col("n_frames"),
        md5(col("p").substr((col("fi") * frameB + 1).cast("int"), lit(frameB)))
          .as("fmd5"))
      .groupBy(col("doc_id"), col("n_frames"))
      .agg(count(lit(1)).as("n_sampled"), min(col("fmd5")).as("min_frame_md5"))
  }

  /** Per-payload typed metadata, then a per-source rollup — the shape
    * of a media-corpus inventory pass: bytes, distinct-content counts
    * (md5 identity), and stub-decoded dimensions. Everything before
    * the single groupBy is per-row at scan speed. */
  def multimodalMeta(t: Tables): DataFrame = {
    val payload = col("text").cast("binary")
    val nBytes = length(payload).cast(LongType)
    val (w, h) = stubDecode(nBytes)
    val meta = t.documents.select(
      col("doc_id"), col("source"),
      payload.as("payload"),
      nBytes.as("n_bytes"),
      md5(payload).as("payload_md5"),
      w.as("stub_width"), h.as("stub_height"))
    meta
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("payload_md5")).as("n_uniq_payloads"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        sum(col("stub_width") * col("stub_height")).as("stub_pixels"))
      .orderBy(col("source"))
  }

  /** G4 — `q_media_embedding`: the feature-extract leg of the
    * multimodal pipeline, end to end — binary payload → fixed-size
    * chunks → per-chunk STUB feature (md5-derived ±1 vote into one of
    * `mediaDim` buckets — deterministic and engine-portable, standing
    * in for a CLIP-style chunk encoder at the same signature) → dense
    * `array<float>` media vector → cosine top-k against a query
    * payload through the SAME codegen'd `cosine_sim` expression the
    * text store uses. A production system swaps the vote arithmetic
    * for a real encoder inside the chunk contract and every
    * downstream plan (store, IVF index, search) is unchanged.
    *
    * Scale shape: chunk rows stay in their reader's partition (G2's
    * locality contract), votes combine map-side per (doc, bucket),
    * the dense fold is one map_from_entries per doc, and the query
    * vector broadcasts into the scan — one shuffle on doc_id, then
    * TakeOrderedAndProject. Parity: vote sums and the resulting
    * vector components are small INTEGERS, exact in float and double
    * alike, so cosine accumulation (double on both engines) matches
    * DuckDB bit-for-bit at 6 dp; ties break on doc_id. */
  def mediaEmbedding(t: Tables): DataFrame = {
    val dim = 32
    val chunk = 64
    val maxChunks = Int.MaxValue.toLong / chunk - 1
    val payload = col("text").cast("binary")
    val nb = length(payload).cast(LongType)
    val nChunks = least(ceil(nb / lit(chunk.toDouble)).cast(LongType),
      lit(maxChunks))
    val h = md5(col("p").substr((col("ci") * chunk + 1).cast("int"), lit(chunk)))
    val votes = t.documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), payload.as("p"),
        explode(sequence(lit(0L), nChunks - 1)).as("ci"))
      .select(col("doc_id"),
        // 2 hex chars → 0..255, folded to the bucket; 3rd char picks
        // the sign (the oracle parses the same chars positionally)
        (conv(substring(h, 1, 2), 16, 10).cast("int") % dim).as("bucket"),
        when(substring(h, 3, 1) <= "7", 1.0).otherwise(-1.0).as("sign"))
    // eager checkpoint: the query-vector lookup and the corpus scan
    // are two independent consumers of the dense vectors (lazy would
    // re-run the chunk explode + both aggregations per consumer)
    val dense = votes
      .groupBy(col("doc_id"), col("bucket")).agg(sum(col("sign")).as("v"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0)))
          .cast("array<float>").as("media_vec"))
      .localCheckpoint()
    val qv = dense.filter(col("doc_id") === 0)
      .select(col("media_vec").as("qv"))
    dense.filter(col("doc_id") =!= 0)
      .join(broadcast(qv))
      .select(col("doc_id"),
        round(graft.functions.VectorFunctions.cosineSim(
          col("media_vec"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** G5 — `q_media_resize`: the resize leg of the multimodal
    * preprocessor (vision models consume a fixed max edge — 224 here,
    * the ImageNet convention). The STUB "resize" keeps every
    * `stride`-th 16-byte block of the payload, where
    * `stride = ⌈max(w,h)/224⌉` from the stub-decoded dimensions —
    * deterministic block subsampling standing in for a real
    * interpolating scaler at the same contract (payload in → smaller
    * payload + new dims out). Swap the block arithmetic for a codec
    * resize and the plan is unchanged.
    *
    * Scale shape: ZERO shuffle — dims, stride, the kept-block fold
    * (a binary `aggregate` over a bounded index sequence) and the
    * output hash are all per-row inside one narrow stage; cost is one
    * scan regardless of corpus size. The kept-block count is capped
    * so byte offsets stay Int-addressable (same GB payload contract
    * as mediaChunks; the oracle replays the cap). The ENGINE is byte
    * arithmetic on the binary payload end to end — dims, block
    * slicing, output length and hash hold on any byte content, not
    * just ASCII (MultimodalSpec property-checks non-ASCII). The
    * DuckDB ORACLE, though, must slice VARCHAR (DuckDB 1.0 has no
    * BLOB substr/md5), which is character-indexed — so CROSS-ENGINE
    * parity additionally assumes an ASCII corpus, true of every
    * shipped testdata corpus and noted at the oracle. */
  def mediaResize(t: Tables): DataFrame = {
    val blk = 16
    val target = 224.0
    // last addressable block index (in block units): offsets
    // i*stride*blk+1 must stay below Int.MaxValue for substr
    val maxOffBlocks = Int.MaxValue.toLong / blk - 2
    val p = col("text").cast("binary")
    val nb = length(p).cast(LongType)
    val (w, h) = stubDecode(nb)
    val stride =
      greatest(lit(1L), ceil(greatest(w, h) / lit(target)).cast(LongType))
    val nBlocks = ceil(nb / lit(blk.toDouble)).cast(LongType)
    val kept = least(
      floor((nBlocks - 1) / stride) + 1,
      floor(lit(maxOffBlocks) / stride) + 1)
    t.documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), p.as("p"),
        w.as("stub_width"), h.as("stub_height"),
        stride.as("stride"), kept.as("kept"))
      .select(col("doc_id"), col("stub_width"), col("stub_height"),
        col("stride"),
        ceil(col("stub_width") / col("stride")).as("new_w"),
        ceil(col("stub_height") / col("stride")).as("new_h"),
        aggregate(sequence(lit(0L), col("kept") - 1),
          lit(Array.emptyByteArray),
          (acc, i) => concat(acc, col("p").substr(
            (i * col("stride") * blk + 1).cast("int"), lit(blk))))
          .as("rp"))
      .select(col("doc_id"), col("stub_width"), col("stub_height"),
        col("stride"), col("new_w"), col("new_h"),
        length(col("rp")).cast(LongType).as("resized_bytes"),
        md5(col("rp")).as("resized_md5"))
  }

  /** G6's thumbnail width: 64 strided sample points → a 64-bit
    * average hash, E3's band geometry. `private[graft]` so the
    * oracle derives the sample positions, the mean test and the
    * eligibility floor from the same constant. */
  private[graft] val phashSamples = 64

  /** G6 — `q_media_phash`: the average-hash (aHash) perceptual
    * fingerprint INDEX over binary payloads, with its per-payload
    * dedup audit — the stage an image/video pipeline persists where
    * E1's md5 only catches byte-identical files (same picture,
    * different encode). The published aHash recipe (the pHash
    * family's baseline): downscale to a tiny thumbnail, then bit b =
    * sample b brighter than the thumbnail mean. Here the downscale
    * is G5's stride contract at the payload level — 64 equally-
    * strided sample bytes (an 8×8-thumbnail analog over the byte
    * stream; swap in a real decoder + pixel grid at the same
    * 64-sample signature and nothing downstream changes) — and the
    * mean test is the exact integer cross-multiply 64·s_b > Σs (no
    * floats anywhere, so the 64-bit fingerprint is engine-exact by
    * construction).
    *
    * Output per eligible payload: the fingerprint, n_candidates =
    * its fan-out through the E3-shared [[Dedup.hammingCandidates]]
    * band blocking (the quantity the occupancy cap bounds at scale —
    * the number every banded-dedup deployment monitors), and
    * n_dupes = band mates verified at Hamming ≤ 3 (pigeonhole-exact
    * through 4×16 bands). On this corpus n_dupes is honestly 0 —
    * shuffled-word payloads have no re-encode analog — so the
    * pairing semantics are additionally proven in spec on planted
    * near-identical payloads through the same shared scaffold.
    *
    * Scale shape: the fingerprint is ONE per-row projection (64
    * bound sample columns, one reduce — no explode, no HOF lambda,
    * scan-speed); everything pairwise lives behind the capped band
    * join; the audit counts are one symmetrized map-side-combining
    * agg over the candidate pairs LEFT-joined back (absent → 0).
    * Payloads under 64 bytes are excluded (no meaningful thumbnail;
    * the oracle replays the same floor). */
  def mediaPhash(t: Tables): DataFrame = mediaPhashDocs(t.documents)

  /** G6 over an arbitrary (doc_id, text) frame — the spec drives the
    * planted near-dup pairing proof through this. */
  private[graft] def mediaPhashDocs(documents: DataFrame): DataFrame = {
    val nS = phashSamples
    val n = length(col("text")).cast(LongType)
    // sample positions floor(b·n/64)+1 — exact in double (the
    // product stays far under 2^53 and /64 is a power-of-two divide)
    val sampleCols = (0 until nS).map { b =>
      ascii(col("text").substr(
        (floor(n.cast("double") * b / nS) + 1).cast("int"), lit(1)))
        .as(s"v$b")
    }
    val eligible = documents
      .filter(length(col("text")) >= nS)
      .select(col("doc_id") +: sampleCols: _*)
    val tot = (0 until nS).map(b => col(s"v$b")).reduce(_ + _)
    val fpCol = (0 until nS).map { b =>
      // bit 63's weight wraps to Long.MinValue — E3's two's-
      // complement contract, partials never overflow
      when(col(s"v$b") * nS > col("tot"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    // eager checkpoint: the band self-join and the output left join
    // both consume the fingerprint table
    val fps = eligible
      .withColumn("tot", tot)
      .select(col("doc_id"), fpCol.as("fp"))
      .localCheckpoint()
    val cands = Dedup.hammingCandidates(fps)
    val sym = cands.select(col("doc_a").as("doc_id"), col("hamming"))
      .unionByName(cands.select(col("doc_b").as("doc_id"), col("hamming")))
    val audit = sym.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("hamming") <= 3, 1L).otherwise(0L)).as("n_dupes"))
    fps.join(audit, Seq("doc_id"), "left")
      .select(col("doc_id"), col("fp"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_dupes"), lit(0L)).as("n_dupes"))
      .orderBy(col("doc_id"))
  }

  /** G7's geometry: G3's 16-byte frames at byte stride 64 (frame
    * stride 4), audited over the first [[frameDupWindow]] sampled
    * frames per payload (pair work per row is C(8,2) = 28, a
    * CONSTANT — the per-payload bound that keeps the audit zero-
    * shuffle at any corpus size); frames within byte-Hamming
    * [[frameDupHamming]] are near-dups. */
  private[graft] val frameDupWindow = 8
  private[graft] val frameDupHamming = 3

  /** G7 — `q_frame_dedup`: WITHIN-payload frame near-dup audit — the
    * static-scene / duplicate-frame pruning pass a video pipeline
    * runs before paying decode/embed per frame (consecutive frames
    * of a still scene are near-identical; dropping them is the
    * cheapest token-budget win in video curation). Composes the
    * family's existing rules: G3's sampled-frame geometry, byte-level
    * Hamming like G6's fingerprint test, and an any-earlier-frame
    * dup rule. Per eligible payload: sampled-frame count
    * (≤ [[frameDupWindow]]), near-dup PAIR count, and the dup count
    * under the rule "frame j is a dup iff ANY earlier sampled frame
    * sits within Hamming [[frameDupHamming]]" — deliberately NOT
    * E10's survivor-chain rule (under a transitive chain A~B, B~C,
    * A!~C the survivor rule would keep C; this audit counts C as a
    * dup because B precedes it). The any-earlier rule is the
    * conservative pruning bound a video pipeline wants (a frame near
    * anything already seen carries no new signal), and it is what
    * both the engine and the oracle compute.
    * On this corpus dup counts are honestly ~0 (shuffled words have
    * no still scenes); the pairing semantics are proven in spec on
    * planted repeated-frame payloads.
    *
    * Scale shape: everything is per-row — two bounded explodes (≤8
    * frames → ≤64 ordered pairs per payload), a 16-position
    * per-pair compare, one map-side-combining per-doc aggregate; no
    * join, no shuffle beyond the final rollup. Byte slicing uses the
    * G-family VARCHAR/ASCII contract (DuckDB 1.0 has no BLOB
    * substr). */
  def frameDedup(t: Tables): DataFrame = frameDedupDocs(t.documents)

  /** G7 over an arbitrary (doc_id, text) frame — the spec drives the
    * planted repeated-frame proofs through this. */
  private[graft] def frameDedupDocs(documents: DataFrame): DataFrame = {
    val frameB = 16
    val byteStride = 64 // frame stride 4 × 16-byte frames (G3's rule)
    val nFrames = floor(length(col("text")) / lit(frameB.toDouble))
      .cast(LongType)
    // Spark `/` on longs returns DOUBLE — cast back for the sequence
    val nSampled =
      least(((nFrames + 3) / 4).cast(LongType), lit(frameDupWindow.toLong))
    val base = documents
      .filter(length(col("text")) >= frameB)
      .select(col("doc_id"), col("text"), nSampled.as("n_sampled"))
      .select(col("doc_id"), col("n_sampled"),
        transform(sequence(lit(0L), col("n_sampled") - 1), i =>
          col("text").substr((i * byteStride + 1).cast("int"), lit(frameB)))
          .as("fr"))
    // ordered frame pairs (j > i), ≤ C(8,2) rows per payload; fa/fb
    // are plain attributes by the time the Hamming HOF touches them
    val ham = base
      .select(col("doc_id"), col("fr"),
        posexplode(col("fr")).as(Seq("i", "fa")))
      .select(col("doc_id"), col("i"), col("fa"),
        posexplode(col("fr")).as(Seq("j", "fb")))
      .filter(col("j") > col("i"))
      .select(col("doc_id"), col("i"), col("j"),
        aggregate(sequence(lit(1), lit(frameB)), lit(0),
          (acc, p) => acc + when(
            col("fa").substr(p, lit(1)) =!= col("fb").substr(p, lit(1)),
            lit(1)).otherwise(lit(0))).as("ham"))
    val audit = ham.groupBy(col("doc_id"))
      .agg(sum(when(col("ham") <= frameDupHamming, 1L).otherwise(0L))
        .as("n_dup_pairs"),
        countDistinct(when(col("ham") <= frameDupHamming, col("j")))
          .as("n_dup_frames"))
    base.select(col("doc_id"), col("n_sampled"))
      .join(audit, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sampled"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        (col("n_sampled") - coalesce(col("n_dup_frames"), lit(0L)))
          .as("n_unique"))
      .orderBy(col("doc_id"))
  }
}
