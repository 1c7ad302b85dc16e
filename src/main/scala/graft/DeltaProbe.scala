package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EmbeddingStore}
import graft.sources.Tables

/** Round-10 scaling probes for the three new claims (SCALING.md §9):
  *
  *  1. INCREMENTAL DELTA DEDUP — `q_dedup_incremental`'s cost tracks
  *     the DELTA, not the corpus: at each corpus multiple, time the
  *     full E2 recompute vs the incremental delta run (state
  *     pre-built, as in production where it is yesterday's ETL
  *     output). Both scale linearly in their own input — the claim
  *     is the constant: incremental ≈ the delta fraction of full.
  *  2. BOUNDED LSH-RECALL EVALUATOR — with truth and candidates
  *     restricted to the K=100 lowest-id sample, the evaluator's
  *     cost curve over corpus multiples flattens toward the
  *     sample × corpus stages (the unsampled §5 curve's slope was
  *     the corpus-pair truth join).
  *  3. REBUILD-ON-DRIFT — the D9 stats row before and after
  *     `rebuildIfDrifted` on an index whose appends dominate
  *     (built from 20% of vectors, 80% appended): appended_frac
  *     resets, mean_intra_cosine recovers.
  *
  * Emits one JSON line per measurement; min over `SPARK_GRAFT_PASSES`
  * passes (ambient-noise defense, like Bench).
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = sys.env.getOrElse("SPARK_GRAFT_MULTS", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 3).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      (0 until passes).foreach { _ =>
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    // warm-up on the smallest corpus absorbs codegen/classloading
    val dirs = mults.map(m =>
      m -> CorpusScaling.ensureReplicatedDir(spark, sfDir, m)).toMap
    Dedup.dedupIncremental(Tables(spark, dirs(mults.head))).count()

    mults.foreach { m =>
      val t = Tables(spark, dirs(m))
      Dedup.ensureDedupState(t) // ETL-time cost, untimed like the bench
      val (incSec, incPairs) = timed(Dedup.dedupIncremental(t).count())
      val (fullSec, fullPairs) = timed(Dedup.dedupMinhashDocs(t.documents).count())
      val (lshSec, _) = timed(Dedup.lshRecall(t).count())
      println(s"""{"metric":"delta_dedup","mult":$m,"full_sec":$fullSec,"incremental_sec":$incSec,"full_pairs":$fullPairs,"delta_pairs":$incPairs,"lsh_recall_sec":$lshSec}""")
    }

    // rebuild-on-drift: 20% build + 80% append, D9 row before/after
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-probe")
    val path = s"$dir/ivf"
    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val cut = emb.agg(max(col("doc_id"))).first().getLong(0) / 5
    EmbeddingStore.buildIvfIndex(spark, emb.filter(col("doc_id") <= cut), path)
    EmbeddingStore.appendToIvfIndex(spark, path, emb.filter(col("doc_id") > cut))
    def stats(tag: String): Unit = {
      val r = EmbeddingStore.indexStats(spark, path).first()
      println(s"""{"metric":"ivf_drift","phase":"$tag","n_vectors":${r.getLong(0)},"n_cells":${r.getLong(1)},"max_cell":${r.getLong(2)},"cell_skew":${r.getDouble(3)},"appended_frac":${r.getDouble(4)},"mean_intra_cosine":${r.getDouble(5)}}""")
    }
    stats("drifted")
    val t0 = System.nanoTime()
    val ran = EmbeddingStore.rebuildIfDrifted(spark, path, threshold = 0.3)
    println(s"""{"metric":"ivf_rebuild","ran":$ran,"sec":${(System.nanoTime() - t0) / 1e9}}""")
    stats("rebuilt")
    spark.stop()
  }
}
