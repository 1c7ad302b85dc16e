package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingStore, IndexMaintenance}
import graft.sources.{LayoutStore, Tables}

class IndexMaintenanceSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  private def vectors = t.embeddings
    .select(col("vec_id").as("doc_id"), col("embedding"))

  /** Replays the episode's accretion into a private dir: base build
    * from the lower id half + [[IndexMaintenance.maintainBatches]]
    * appends of the upper half. */
  private def accretedIndex(): String = {
    val dir = Files.createTempDirectory("graft-maint").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/ivf"
    val maxVec = vectors.agg(max(col("doc_id"))).first().getLong(0)
    EmbeddingStore.buildIvfIndex(spark,
      vectors.filter(col("doc_id") <= maxVec / 2), path)
    val delta = vectors.filter(col("doc_id") > maxVec / 2)
    val b = IndexMaintenance.maintainBatches
    (0 until b).foreach { i =>
      EmbeddingStore.appendToIvfIndex(spark, path,
        delta.filter(pmod(col("doc_id"), lit(b.toLong)) === i))
    }
    path
  }

  test("compaction collapses the per-cell file accretion to one file " +
    "per cell in every store, losslessly, with the probe bit-identical") {
    val path = accretedIndex()
    val stores = Seq("cells", "pq_codes", "sq8_codes")
    def cellCount(sub: String): Long =
      Option(new File(s"$path/$sub").listFiles()).getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("cell=")).toLong

    val probePre = EmbeddingStore.searchIvf(spark, path, 0L, 10, 2).collect()
    val contentPre = stores.map(s => spark.read.parquet(s"$path/$s")
      .collect().map(_.toString).sorted.toSeq)

    val reports = IndexMaintenance.compactIndex(spark, path)
    assert(reports.map(_.store) === stores)
    reports.foreach { r =>
      val nCells = cellCount(r.store)
      // accretion is real: appends landed extra files beyond one/cell
      assert(r.filesBefore > nCells,
        s"${r.store}: ${r.filesBefore} files before vs $nCells cells")
      // and maintenance pays it down to exactly one per cell
      assert(r.filesAfter === nCells,
        s"${r.store}: ${r.filesAfter} files after vs $nCells cells")
      assert(IndexMaintenance.dataFiles(new File(s"$path/${r.store}"))
        .length.toLong === r.filesAfter)
    }

    // lossless: full content of every store survives bit-identical
    val contentPost = stores.map(s => spark.read.parquet(s"$path/$s")
      .collect().map(_.toString).sorted.toSeq)
    assert(contentPost === contentPre)
    // and the probe through the compacted index is the SAME rows
    val probePost = EmbeddingStore.searchIvf(spark, path, 0L, 10, 2).collect()
    assert(probePost.toSeq === probePre.toSeq)
  }

  test("purgeIndex: listed vectors leave cells AND both sidecars, " +
    "probes stop seeing them, survivors are untouched") {
    val path = accretedIndex()
    val all = spark.read.parquet(s"$path/cells")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    // victims include three ids the probe CURRENTLY returns — the
    // takedown must visibly change a served result, not just row
    // counts
    val preProbe = EmbeddingStore.searchIvf(spark, path, 0L, 10, 2)
      .collect().map(_.getLong(0)).toSet
    val victims =
      (preProbe.take(3) ++ all.filter(_ % 7 == 3).take(17)).toSeq.distinct
    assert(victims.nonEmpty)

    val reports = IndexMaintenance.purgeIndex(spark, path, victims)
    assert(reports.map(_.store) === Seq("cells", "pq_codes", "sq8_codes"))
    val vset = victims.toSet
    Seq("cells", "pq_codes", "sq8_codes").foreach { sub =>
      val ids = spark.read.parquet(s"$path/$sub")
        .select(col("doc_id")).collect().map(_.getLong(0))
      assert(!ids.exists(vset), s"$sub still holds a purged id")
      // survivors intact: purged store = original minus victims
      assert(ids.sorted.toSeq === all.filterNot(vset).toSeq,
        s"$sub lost a survivor")
    }
    val postProbe = EmbeddingStore.searchIvf(spark, path, 0L, 10, 2)
      .collect().map(_.getLong(0)).toSet
    assert(postProbe.intersect(vset).isEmpty,
      "a probe returned a purged id")
    // non-vacuous by construction: three victims were pre-probe hits
    assert(preProbe.intersect(vset).size >= 3)
    assert(spark.read.parquet(s"$path/cells").count() ===
      all.length - victims.size)
  }

  test("purgeIndex that empties the store leaves a READABLE empty " +
    "store, and the next maintenance pass still runs") {
    val path = accretedIndex()
    val all = spark.read.parquet(s"$path/cells")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    IndexMaintenance.purgeIndex(spark, path, all)
    // schema-inferred reads must SUCCEED and see zero rows — the
    // partitioned write of an empty frame would otherwise leave a
    // dir with no data files that fails inference forever
    Seq("cells", "pq_codes", "sq8_codes").foreach { sub =>
      assert(spark.read.parquet(s"$path/$sub").count() === 0L,
        s"$sub should be empty but readable")
    }
    // the emptied store is not a wedge: another full pass succeeds
    val again = IndexMaintenance.compactIndex(spark, path)
    assert(again.map(_.store) === Seq("cells", "pq_codes", "sq8_codes"))
    assert(spark.read.parquet(s"$path/cells").count() === 0L)
  }

  test("purge-everything-then-APPEND: the emptied store stays " +
    "partition-layout compatible, the partitioned append lands, and " +
    "probes serve the re-appended vectors") {
    val path = accretedIndex()
    val vectors = spark.read.parquet(s"$path/cells")
      .select(col("doc_id"), col("embedding")).localCheckpoint(true)
    val all = vectors.select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    IndexMaintenance.purgeIndex(spark, path, all)
    assert(spark.read.parquet(s"$path/cells").count() === 0L)
    // the realistic changefeed-driven sequence: a purge that empties
    // the store followed by a partitioned append — partition
    // discovery must not see conflicting directory structures
    val stats = graft.operators.EmbeddingStore
      .appendToIvfIndex(spark, path, vectors)
    assert(stats.processed === all.length.toLong)
    Seq("cells", "pq_codes", "sq8_codes").foreach { sub =>
      assert(spark.read.parquet(s"$path/$sub").count() === all.length.toLong,
        s"$sub did not recover the appended rows")
    }
    // and the probe path serves the re-appended vectors
    val hits = EmbeddingStore.searchIvf(spark, path, all.head, 5, 4)
      .collect()
    assert(hits.nonEmpty)
    // a follow-up maintenance pass compacts the mixed sentinel +
    // appended layout without wedging
    val reports = IndexMaintenance.compactIndex(spark, path)
    assert(reports.map(_.store) === Seq("cells", "pq_codes", "sq8_codes"))
    assert(spark.read.parquet(s"$path/cells").count() === all.length.toLong)
  }

  test("compactIndex heals crash leftovers: a store stranded as " +
    "_precompact is restored, stale _compact dirs do not wedge a retry") {
    val path = accretedIndex()
    val cells = new File(s"$path/cells")
    val content = spark.read.parquet(cells.getAbsolutePath)
      .collect().map(_.toString).sorted.toSeq

    // crash between the two renames: live store missing, old
    // generation stranded as _precompact, a fully-written _compact
    // twin beside it
    assert(cells.renameTo(new File(s"$path/cells_precompact")))
    new File(s"$path/cells_compact").mkdirs()
    Files.writeString(
      new File(s"$path/cells_compact/part-orphan.parquet").toPath, "junk")
    val reports = IndexMaintenance.compactIndex(spark, path)
    assert(reports.map(_.store) === Seq("cells", "pq_codes", "sq8_codes"))
    // healed AND compacted: same rows, leftovers gone
    assert(spark.read.parquet(cells.getAbsolutePath)
      .collect().map(_.toString).sorted.toSeq === content)
    assert(!new File(s"$path/cells_precompact").exists())
    assert(!new File(s"$path/cells_compact").exists())
    // and a retry right after is a no-op-shaped success, not a wedge
    val again = IndexMaintenance.compactIndex(spark, path)
    assert(again.forall(r => r.filesBefore === r.filesAfter))
  }

  test("the maintenance sweep composes with vacuum: stale generations " +
    "and crash-left scratch reaped, the live compacted index kept") {
    val data = Files.createTempDirectory("graft-maint-vac").toFile
    data.deleteOnExit()
    Files.writeString(new File(data, "d.parquet").toPath, "payload")
    val dd = data.getAbsolutePath

    // the live generation: an ensured (attributed) index layout
    val live = LayoutStore.ensure(dd, "ivf", "v2") { p =>
      new File(p).mkdirs()
      Files.writeString(new File(p, "cells").toPath, "live")
    }
    // a STALE generation this data dir owns (an old rule version)
    val stale = new File(new File(dd, "_graft_layouts"), "ivf_deadbeef0000")
    stale.mkdirs()
    Files.writeString(new File(stale, "_OWNER").toPath, dd + "\n")
    // a crash-left scratch from a maintenance run that died mid-swap
    val scr = LayoutStore.scratch(dd, "maintain")
    Files.writeString(new File(scr, "cells_compact").toPath, "orphan")
    scr.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000)

    val r = LayoutStore.vacuum(dd, Seq("ivf" -> "v2"))
    assert(r.deleted.contains("ivf_deadbeef0000"))
    assert(r.deleted.exists(_.startsWith("maintain")))
    assert(r.kept.contains(new File(live).getName))
    assert(new File(live).isDirectory && !stale.exists() && !scr.exists())
  }
}
