package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TableFormat

/** A/B probe for H18's headline claim: with a BOUNDED range predicate
  * — the realistic dashboard/debug case: a WHERE clause names a
  * handful of keys regardless of corpus size — a full manifested read
  * grows with the corpus FILE COUNT (every file is listed, its footer
  * opened and its scan task scheduled, even when parquet row-group
  * stats then skip the data), while [[TableFormat.readScoped]] prunes
  * the file list against the commit-time manifest BEFORE the scan
  * plans, touching only the files whose range can satisfy the
  * predicate — flat in the corpus.
  *
  * Setup per corpus multiple mirrors SkipProbe: the replicated
  * lineitem commits as a manifested generation range-clustered on
  * l_orderkey at CONSTANT file width (~50k rows/file, so file count
  * grows with the corpus like a real table's), and the query is a
  * fixed ~2-file orderkey range.
  *
  *  - A (full): readViaManifest + the predicate as a normal pushed
  *    filter — parquet footer stats still skip row groups, but every
  *    file participates in planning and scheduling.
  *  - B (scoped): readScoped — the manifest filter names the
  *    surviving files; only they are listed, opened, or scheduled.
  *
  * Both sides consume through the noop sink and MUST agree on the
  * aggregate (asserted) — pruning is invisible to the answer. Emits
  * ONE JSON line (redirect to read_probe_r17.json); min over
  * SPARK_GRAFT_PASSES passes per side. */
object ReadProbe {
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

    final case class Point(rows: Long, files: Long, filesRead: Long,
      hitRows: Long, fullS: Double, scopedS: Double)

    val points = mults.map { m =>
      val li = spark.read.parquet(s"${dirs(m)}/lineitem.parquet")
      val rows = li.count()
      // 5k-row files: the read-path claim is about FILE COUNT (every
      // file pays listing + footer + task scheduling on the full
      // read), and file count is the axis that explodes at 100 TB —
      // hundreds of files here model thousands there
      val nFiles = math.max(8, (rows / 5000L).toInt)
      val schema = li.schema
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-readprobe-x$m").toString
      TableFormat.commitGenManifested(
        li.repartitionByRange(nFiles, col("l_orderkey")),
        root, 0L, "l_orderkey")
      val filesTotal = TableFormat.readManifest(spark, root, 0L).count()
      // a fixed ~2-file range in the middle of the key domain: lo/hi
      // derived from the BASE corpus width so the slice is the same
      // absolute size at every multiple (the corpus grows around it)
      val maxKey = li.agg(max(col("l_orderkey"))).first().getLong(0)
      val width = math.max(1L, maxKey / filesTotal)
      val lo = maxKey / 2
      val hi = lo + 2 * width

      // A: full manifested read, predicate as a pushed filter
      // (timed through the noop sink — a bare count would collapse
      // to footer statistics and time nothing)
      def fullDf = TableFormat.readViaManifest(spark, root, 0L, schema)
        .filter(col("l_orderkey").between(lo, hi))
      var fullS = Double.MaxValue
      (0 until passes).foreach { _ =>
        val t0 = System.nanoTime()
        Bench.consume(fullDf)
        fullS = math.min(fullS, (System.nanoTime() - t0) / 1e9)
      }
      // B: manifest-pruned read
      var scopedS = Double.MaxValue
      var filesRead = 0L
      (0 until passes).foreach { _ =>
        val t0 = System.nanoTime()
        val (df, rep) = TableFormat.readScoped(spark, root, 0L, schema,
          Seq(("l_orderkey", lo, hi)))
        Bench.consume(df)
        filesRead = rep.filesTouched
        scopedS = math.min(scopedS, (System.nanoTime() - t0) / 1e9)
      }
      // pruning must be invisible to the answer (checked untimed)
      val hitFull = fullDf.count()
      val hitScoped = TableFormat.readScoped(spark, root, 0L, schema,
        Seq(("l_orderkey", lo, hi)))._1.count()
      require(hitFull == hitScoped,
        s"pruned read diverged: full=$hitFull scoped=$hitScoped")
      val hitRows = hitScoped
      graft.sources.LayoutStore.deleteRecursively(new java.io.File(root))
      m -> Point(rows, filesTotal, filesRead, hitRows, fullS, scopedS)
    }.toMap

    def fmt(sel: Point => Any): String =
      mults.map(m => s""""$m":${sel(points(m))}""").mkString("{", ",", "}")
    println(s"""{"metric":"read_probe","sf":"$sfDir","mults":[${mults.mkString(",")}],""" +
      s""""passes":$passes,""" +
      s""""rows":${fmt(_.rows)},"files":${fmt(_.files)},""" +
      s""""files_read":${fmt(_.filesRead)},"hit_rows":${fmt(_.hitRows)},""" +
      s""""full_read_s":${fmt(p => f"${p.fullS}%.3f")},""" +
      s""""scoped_read_s":${fmt(p => f"${p.scopedS}%.3f")}}""")
    spark.stop()
  }
}
