package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Core-count scaling probe for a COMPUTE-BOUND pipeline.
  *
  * The full 48-query bench at sf0.1 is overhead-bound — each query
  * carries a fixed planning/scheduling floor and the data work is
  * milliseconds, so core count barely moves the total (SCALING.md).
  * This probe isolates the parallel-work curve instead: the minhash
  * dedup pipeline (the suite's heaviest — corpus-wide shingle window,
  * 12 min-hash aggregates, LSH bucket self-join) over the sf corpus
  * replicated `mult` times with disjoint doc_id ranges. Replication
  * multiplies the DATA while keeping one plan, so the elapsed time is
  * dominated by distributable work — what a 1000-executor cluster
  * actually scales.
  *
  * Usage: SPARK_GRAFT_CPUS=8 SPARK_GRAFT_MULT=8
  *        sbt "runMain graft.ScalingProbe" → one JSON line.
  *
  * `SPARK_GRAFT_MASTER` overrides the master URL — the executor-count
  * experiment (SCALING.md §4) submits this same probe to a local
  * STANDALONE cluster (spark://...), where each executor is a
  * separate JVM with its own block manager and shuffle server, so the
  * shuffle path is the real cross-JVM one rather than local[n]'s
  * in-process block transfers. The executor SHAPE (2×16, 4×8) is the
  * submit's --executor-cores / --total-executor-cores. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "8").toInt
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // default 3x cores per SURVEY §8: with partitions == cores, one
    // straggler task stalls the whole stage; oversizing + AQE
    // coalescing smooths contention at no cost
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS",
      (cpus.toInt * 3).toString)
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // every WORD is suffixed with the replica index — a bijective
    // word mapping, so each replica's shingle statistics are identical
    // to the base corpus while cross-replica similarity is exactly
    // zero. Pair work therefore grows linearly with mult (plain
    // copies would near-match each other and the verification stage
    // would grow quadratically by construction, poisoning the read).
    // replica id ranges derived from the corpus' own max id — a
    // hardcoded offset would silently collide on a corpus with large
    // doc_ids and conflate distinct docs in the pair generation
    val base = docs0.agg(max(col("doc_id"))).first().getLong(0) + 1L
    val docs = (0 until mult)
      .map(i => docs0.select(
        (col("doc_id") + lit(i.toLong * base)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1r$i").as("text")))
      .reduce(_ unionByName _)
    // untimed warm-up at 1x absorbs codegen/classloading
    operators.Dedup.dedupMinhashDocs(docs0).count()
    val t0 = System.nanoTime()
    val n = operators.Dedup.dedupMinhashDocs(docs).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val execCores = spark.conf.getOption("spark.executor.cores").getOrElse("")
    println(s"""{"metric":"minhash_scaled","cpus":$cpus,"mult":$mult,"pairs":$n,"value":$sec,"unit":"sec","master":"$master","exec_cores":"$execCores"}""")
    spark.stop()
  }
}
