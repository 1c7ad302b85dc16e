package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.EmbeddingStore
import graft.sources.Tables

/** Vector-width cost probe: the synthetic corpora ship 64-dim
  * vectors, but the reference embeds at 384 (all-MiniLM-L6-v2,
  * processor.py:174). Every operator downstream of `embed` is
  * width-agnostic — this main PROVES the claim holds at the
  * reference's real width and measures what the width costs: for
  * dim ∈ {64, 384} it times, over the sf0.1 documents corpus,
  *
  *  - embed+store (feature-hash → normalize → shard-partitioned
  *    parquet),
  *  - the persisted IVF index build (seed → assign → Lloyd →
  *    cell-partitioned write), and
  *  - a batch of 20 partition-pruned index probes (searchIvf),
  *
  * per-(dim, stage) minima across passes, one JSON line (also
  * written to dim_bench.json). Expected shape: embed grows
  * sub-linearly in dim (the token scan and the two keyed
  * aggregations dominate; only the dense-vector assembly is
  * O(dim)), index build and probe roughly linearly in dim (cosine
  * is O(dim) per pair) — the ratios recorded in BENCH_BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.DimBench"
  */
object DimBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val dims = Seq(64, 384)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getPlatformMXBean(
      classOf[com.sun.management.OperatingSystemMXBean])
    val t = Tables(spark, sfDir)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm-up absorbs codegen/classloading
    EmbeddingStore.embed(t.documents, 64).count()

    val best = collection.mutable.Map[(Int, String), Double]()
      .withDefaultValue(Double.MaxValue)
    val loads = (0 until passes).map { _ =>
      val load = osBean.getSystemLoadAverage
      for (d <- dims) {
        val base = java.nio.file.Files.createTempDirectory(s"graft-dim$d").toFile
        base.deleteOnExit()
        val store = base.getAbsolutePath + "/store"
        val index = base.getAbsolutePath + "/index"
        best((d, "embed_store")) = math.min(best((d, "embed_store")),
          timed(EmbeddingStore.store(EmbeddingStore.embed(t.documents, d), store)))
        val vectors = spark.read.parquet(store).drop("shard")
        best((d, "index_build")) = math.min(best((d, "index_build")),
          timed(EmbeddingStore.buildIvfIndex(spark, vectors, index)))
        best((d, "probe20")) = math.min(best((d, "probe20")),
          timed((0L until 20L).foreach(q =>
            EmbeddingStore.searchIvf(spark, index, q, k = 10).count())))
        // the compressed-domain probe over the same index: ADC over
        // the PQ code sidecar instead of full-width cosine
        best((d, "probe20_pq")) = math.min(best((d, "probe20_pq")),
          timed((0L until 20L).foreach(q =>
            graft.operators.ProductQuantizer.searchIvfPq(spark, index, q, k = 10)
              .count())))
        // the scan-bytes claim, measured: on-disk bytes a probe's cell
        // scan draws from (vector cells vs code sidecar). A constant
        // across passes — min() just records it once per dim.
        def dirBytes(p: String): Double = {
          def walk(f: java.io.File): Long =
            if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
            else f.length()
          walk(new java.io.File(p)).toDouble
        }
        best((d, "cells_bytes")) = math.min(best((d, "cells_bytes")),
          dirBytes(s"$index/cells"))
        best((d, "pq_codes_bytes")) = math.min(best((d, "pq_codes_bytes")),
          dirBytes(s"$index/pq_codes"))
      }
      load
    }
    val dimsJson = dims.map { d =>
      val stages = Seq("embed_store", "index_build", "probe20", "probe20_pq",
        "cells_bytes", "pq_codes_bytes")
        .map(s => "\"" + s + f"\":${best((d, s))}%.3f").mkString("{", ",", "}")
      s""""$d":$stages"""
    }.mkString("{", ",", "}")
    val loadStr = loads.map(l => f"$l%.2f").mkString("[", ",", "]")
    val json =
      s"""{"metric":"dim_bench","sf":"$sfDir","passes":$passes,"load_avg":$loadStr,"dims":$dimsJson}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("dim_bench.json"), json + "\n")
    spark.stop()
  }
}
