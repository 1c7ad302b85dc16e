package graft

import java.io.File
import java.nio.file.Files

import graft.sources.LayoutStore

/** The three episode/sink rows stage short-lived parquet stores that
  * executors write AND read. On local[*] any path works (one shared
  * filesystem); on a real cluster the scratch must resolve on every
  * node, i.e. live under the cluster-shared layouts root. This spec
  * forces a NON-default root (the `spark.graft.storage.dir` override)
  * and proves (a) all three rows still run green, (b) their scratch
  * landed under the forced root — not `java.io.tmpdir` — and (c) each
  * per-invocation dir was deleted once the row's small result pinned.
  */
class ScratchRoutingSpec extends SparkTestBase {

  test("episode/sink scratch routes through a forced non-default layouts root and cleans up") {
    val root = Files.createTempDirectory("graft-forced-root").toFile
    sys.props("spark.graft.storage.dir") = root.getAbsolutePath
    try {
      assert(LayoutStore.root(sfDir).getAbsolutePath === root.getAbsolutePath,
        "the system-property override must outrank every other root rule")
      Seq("q_export_manifest", "q_export_shards", "q_search_refresh",
          "q_advance_day", "q_bootstrap").foreach { n =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        assert(df.count() > 0, s"$n under a forced storage root")
      }
      val scratchHome = new File(root, "_scratch")
      assert(scratchHome.isDirectory,
        "scratch must be allocated under the forced root")
      assert(Option(scratchHome.listFiles()).getOrElse(Array.empty).isEmpty,
        "every per-invocation scratch dir must be deleted after its row pins")
    } finally {
      sys.props -= "spark.graft.storage.dir"
      LayoutStore.deleteRecursively(root)
    }
  }
}
