package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TableFormat

/** A/B probe for H24's headline claim: a POINT LOOKUP on a key the
  * file layout does NOT cluster by cannot be pruned by range
  * statistics at all — on a hash-clustered table every file's
  * [min, max] spans the probed key, so the range-pruned read IS the
  * full read, growing with the corpus file count — while the
  * manifest's per-file Bloom sketch plans the lookup FLAT (the one
  * true file plus rare false positives) at any corpus size.
  *
  * Setup per corpus multiple mirrors ReadProbe: the replicated
  * lineitem commits as ONE manifested generation HASH-clustered on
  * l_partkey at constant file width (~5k rows/file, so file count
  * grows with the corpus), with range stats AND a Bloom sketch on
  * l_orderkey; the query is one mid-domain orderkey that exists in
  * the data.
  *
  *  - A (range): the files the [min, max] test admits — on this
  *    layout, effectively all of them — read + residual filter.
  *  - B (bloom): [[TableFormat.prunedFilesIn]] — range AND sketch.
  *
  * Both sides consume through the noop sink and MUST agree on the
  * aggregate (asserted) — pruning is invisible to the answer. Emits
  * ONE JSON line (redirect to bloom_probe_r18.json); min over
  * SPARK_GRAFT_PASSES passes per side. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = sys.env.getOrElse("SPARK_GRAFT_MULTS", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 3).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = mults.map(m =>
      m -> CorpusScaling.ensureReplicatedDir(spark, sfDir, m)).toMap

    final case class Point(rows: Long, files: Long, filesRange: Long,
      filesBloom: Long, hitRows: Long, rangeS: Double, bloomS: Double)

    val points = mults.map { m =>
      val li = spark.read.parquet(s"${dirs(m)}/lineitem.parquet")
      val rows = li.count()
      val nFiles = math.max(8, (rows / 5000L).toInt)
      val schema = li.schema
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-bloomprobe-x$m").toString
      // hash-cluster on the part key: orderkeys scatter across every
      // file — the layout real tables have for every non-clustering
      // key they are ever probed on
      TableFormat.commitGenManifested(
        li.repartition(nFiles, col("l_partkey")),
        root, 0L, Seq("l_orderkey"), bloomKeys = Seq("l_orderkey"))
      val filesTotal = TableFormat.readManifest(spark, root, 0L).count()
      // one EXISTING mid-domain key (orderkeys are sparse — derive
      // from the data, same absolute position at every multiple)
      val maxKey = li.agg(max(col("l_orderkey"))).first().getLong(0)
      val probeKey = li.filter(col("l_orderkey") >= maxKey / 2)
        .agg(min(col("l_orderkey"))).first().getLong(0)

      // A: range-admitted files (the best a statistics-only manifest
      // can do on this layout) + residual filter through the sink
      def rangeFiles: Seq[String] = TableFormat
        .readManifest(spark, root, 0L)
        .filter(lit(probeKey).between(
          col("min_l_orderkey"), col("max_l_orderkey")))
        .select(col("file")).collect().map(_.getString(0)).toSeq
      var rangeS = Double.MaxValue
      var filesRange = 0L
      (0 until passes).foreach { _ =>
        val t0 = System.nanoTime()
        val fs = rangeFiles
        filesRange = fs.length.toLong
        Bench.consume(spark.read.schema(schema).parquet(fs: _*)
          .filter(col("l_orderkey") === probeKey))
        rangeS = math.min(rangeS, (System.nanoTime() - t0) / 1e9)
      }
      // B: sketch-pruned files + the same residual
      var bloomS = Double.MaxValue
      var filesBloom = 0L
      (0 until passes).foreach { _ =>
        val t0 = System.nanoTime()
        val fs = TableFormat.prunedFilesIn(spark, root, 0L,
          "l_orderkey", Seq(probeKey))
        filesBloom = fs.length.toLong
        Bench.consume(spark.read.schema(schema).parquet(fs: _*)
          .filter(col("l_orderkey") === probeKey))
        bloomS = math.min(bloomS, (System.nanoTime() - t0) / 1e9)
      }
      // pruning must be invisible to the answer (checked untimed)
      val hitRange = spark.read.schema(schema).parquet(rangeFiles: _*)
        .filter(col("l_orderkey") === probeKey).count()
      val hitBloom = TableFormat.readPrunedIn(spark, root, 0L, schema,
          "l_orderkey", Seq(probeKey))
        .filter(col("l_orderkey") === probeKey).count()
      require(hitRange == hitBloom && hitBloom > 0L,
        s"pruned lookup diverged: range=$hitRange bloom=$hitBloom")
      graft.sources.LayoutStore.deleteRecursively(new java.io.File(root))
      m -> Point(rows, filesTotal, filesRange, filesBloom, hitBloom,
        rangeS, bloomS)
    }.toMap

    def fmt(sel: Point => Any): String =
      mults.map(m => s""""$m":${sel(points(m))}""").mkString("{", ",", "}")
    println(s"""{"metric":"bloom_probe","sf":"$sfDir","mults":[${mults.mkString(",")}],""" +
      s""""passes":$passes,""" +
      s""""rows":${fmt(_.rows)},"files":${fmt(_.files)},""" +
      s""""files_range":${fmt(_.filesRange)},"files_bloom":${fmt(_.filesBloom)},""" +
      s""""hit_rows":${fmt(_.hitRows)},""" +
      s""""range_lookup_s":${fmt(p => f"${p.rangeS}%.3f")},""" +
      s""""bloom_lookup_s":${fmt(p => f"${p.bloomS}%.3f")}}""")
    spark.stop()
  }
}
