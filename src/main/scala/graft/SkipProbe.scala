package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TableFormat

/** A/B probe for H16's headline claim: with a BOUNDED (human-scale)
  * takedown list — the realistic compliance case: claims arrive as
  * short id lists regardless of corpus size — a FULL purge rewrite is
  * corpus-linear while the stats-SCOPED rewrite is O(touched files),
  * i.e. flat in the corpus once the list's file fan-out saturates.
  * (The H16 row itself shares H10's mod-97 list, which is corpus-
  * PROPORTIONAL by construction so its oracle stays SF-invariant;
  * this probe supplies the bounded-list evidence the row can't.)
  *
  * Setup per corpus multiple: the replicated lineitem (the largest
  * table) commits as a manifested generation range-clustered on
  * l_orderkey at CONSTANT file width (~50k rows/file — file count
  * grows with the corpus, like a real table's); the takedown is 20
  * orderkeys spread across the id domain.
  *
  *  - A (full): read the whole generation through its manifest,
  *    broadcast anti-join the list, rewrite every surviving row.
  *  - B (scoped): [[TableFormat.purgeScoped]] — rewrite only the
  *    ≤20 files whose min/max range can contain a listed key, carry
  *    the rest by reference.
  *
  * Emits ONE JSON line (also suitable for redirecting to
  * skip_probe_r16.json); min over SPARK_GRAFT_PASSES passes per
  * side, pass-major, like Bench. */
object SkipProbe {
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

    final case class Point(rows: Long, files: Long, touched: Long,
      carried: Long, fullS: Double, scopedS: Double)

    val points = mults.map { m =>
      val li = spark.read.parquet(s"${dirs(m)}/lineitem.parquet")
      val rows = li.count()
      // constant file width: the corpus grows by ADDING files, not by
      // widening them — a real table's growth axis
      val nFiles = math.max(8, (rows / 50000L).toInt)
      val schema = li.schema
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-skipprobe-x$m").toString
      TableFormat.commitGenManifested(
        li.repartitionByRange(nFiles, col("l_orderkey")),
        root, 0L, "l_orderkey")
      val filesTotal = TableFormat.readManifest(spark, root, 0L).count()
      // 20 takedown keys spread across the domain (deterministic)
      val maxKey = li.agg(max(col("l_orderkey"))).first().getLong(0)
      val keyList = (1 to 20).map(i => i.toLong * maxKey / 21)
      import spark.implicits._
      val keys = keyList.toDF("l_orderkey")

      // A: the FULL rewrite — whole table read, anti-join, full write
      var fullS = Double.MaxValue
      (0 until passes).foreach { p =>
        val out = s"$root/full_$p"
        val t0 = System.nanoTime()
        TableFormat.readViaManifest(spark, root, 0L, schema)
          .join(broadcast(keys.select(col("l_orderkey").as("__td"))),
            col("l_orderkey") === col("__td"), "left_anti")
          .write.mode("overwrite").parquet(out)
        fullS = math.min(fullS, (System.nanoTime() - t0) / 1e9)
        graft.sources.LayoutStore.deleteRecursively(new java.io.File(out))
      }
      // B: the SCOPED rewrite — touched files only, rest by reference
      var scopedS = Double.MaxValue
      var report: TableFormat.SkipReport = null
      (0 until passes).foreach { _ =>
        val t0 = System.nanoTime()
        report = TableFormat.purgeScoped(spark, root, keys, schema,
          "l_orderkey")
        scopedS = math.min(scopedS, (System.nanoTime() - t0) / 1e9)
      }
      graft.sources.LayoutStore.deleteRecursively(new java.io.File(root))
      m -> Point(rows, filesTotal, report.filesTouched,
        report.filesCarried, fullS, scopedS)
    }.toMap

    def fmt(sel: Point => Any): String =
      mults.map(m => s""""$m":${sel(points(m))}""").mkString("{", ",", "}")
    println(s"""{"metric":"skip_probe","sf":"$sfDir","mults":[${mults.mkString(",")}],""" +
      s""""passes":$passes,"list_size":20,""" +
      s""""rows":${fmt(_.rows)},"files":${fmt(_.files)},""" +
      s""""files_touched":${fmt(_.touched)},"files_carried":${fmt(_.carried)},""" +
      s""""full_rewrite_s":${fmt(p => f"${p.fullS}%.3f")},""" +
      s""""scoped_rewrite_s":${fmt(p => f"${p.scopedS}%.3f")}}""")
    spark.stop()
  }
}
