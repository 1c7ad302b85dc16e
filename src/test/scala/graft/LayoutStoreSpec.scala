package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LayoutStore

class LayoutStoreSpec extends AnyFunSuite {

  private def touch(dir: File, name: String, content: String): Unit =
    Files.writeString(new File(dir, name).toPath, content)

  test("ensure builds once, lands beside writable data, rekeys on data or rule change") {
    val data = Files.createTempDirectory("graft-ls-data").toFile
    data.deleteOnExit()
    touch(data, "t.parquet", "aaaa")

    var builds = 0
    def build(p: String): Unit = { builds += 1; new File(p).mkdirs() }

    val p1 = LayoutStore.ensure(data.getAbsolutePath, "probe", "v1")(build)
    val p2 = LayoutStore.ensure(data.getAbsolutePath, "probe", "v1")(build)
    assert(builds === 1, "second ensure must hit the _BUILT marker")
    assert(p1 === p2)
    // writable data dir => the layout lives BESIDE the data
    assert(p1.startsWith(new File(data, "_graft_layouts").getAbsolutePath))

    // replacing the data at the SAME path changes the fingerprint =>
    // a NEW layout key; the stale layout is never probed again
    touch(data, "t.parquet", "aaaabbbb")
    val p3 = LayoutStore.ensure(data.getAbsolutePath, "probe", "v1")(build)
    assert(builds === 2, "changed data must rebuild")
    assert(p3 !== p1)

    // a rule-version bump rekeys too
    val p4 = LayoutStore.ensure(data.getAbsolutePath, "probe", "v2")(build)
    assert(builds === 3)
    assert(p4 !== p3)

    // the layouts root never feeds back into the fingerprint: another
    // ensure after layouts landed beside the data is still a cache hit
    val p5 = LayoutStore.ensure(data.getAbsolutePath, "probe", "v2")(build)
    assert(builds === 3)
    assert(p5 === p4)
  }

  test("read-only data dir falls back to the user-suffixed tmp root") {
    val data = Files.createTempDirectory("graft-ls-ro").toFile
    data.deleteOnExit()
    touch(data, "t.parquet", "x")
    data.setWritable(false)
    try {
      val r = LayoutStore.root(data.getAbsolutePath)
      assert(!r.getAbsolutePath.startsWith(data.getAbsolutePath))
      assert(r.getName.startsWith("graft_layouts_"))
    } finally data.setWritable(true)
  }

  test("vacuum reaps THIS data dir's stale generations and crash-left " +
    "scratch, and never touches other owners, live layouts or " +
    "unattributed dirs") {
    // a shared root (the tmp-fallback situation, forced explicitly)
    val shared = Files.createTempDirectory("graft-ls-vacroot").toFile
    shared.deleteOnExit()
    sys.props("spark.graft.storage.dir") = shared.getAbsolutePath
    try {
      val data = Files.createTempDirectory("graft-ls-vacdata").toFile
      val other = Files.createTempDirectory("graft-ls-vacother").toFile
      Seq(data, other).foreach { d =>
        d.deleteOnExit(); touch(d, "t.parquet", "payload")
      }
      def build(p: String): Unit = {
        new File(p).mkdirs(); touch(new File(p), "blob", "x" * 1000)
      }
      // generation 1 (will go stale), generation 2 (current), another
      // owner's layout, and a legacy dir with no attribution
      val stale = LayoutStore.ensure(data.getAbsolutePath, "probe", "v1")(build)
      val live = LayoutStore.ensure(data.getAbsolutePath, "probe", "v2")(build)
      val foreign = LayoutStore.ensure(other.getAbsolutePath, "probe", "v1")(build)
      val legacy = new File(shared, "probe_deadbeef0000")
      build(legacy.getAbsolutePath)
      // scratch: one crash-left orphan (aged), one live
      val oldScratch = LayoutStore.scratch(data.getAbsolutePath, "orphan")
      touch(oldScratch, "tmp", "y" * 500)
      oldScratch.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000)
      val freshScratch = LayoutStore.scratch(data.getAbsolutePath, "live")

      val r = LayoutStore.vacuum(data.getAbsolutePath, Seq("probe" -> "v2"))

      assert(r.deleted.contains(new File(stale).getName))
      assert(r.deleted.contains(oldScratch.getName))
      assert(r.deleted.length === 2)
      assert(r.bytesFreed >= 1500)
      assert(!new File(stale).exists() && !oldScratch.exists())
      assert(new File(live).exists(), "the current generation must survive")
      assert(new File(foreign).exists(), "another owner's layout must survive")
      assert(legacy.exists(), "an unattributed dir must survive")
      assert(freshScratch.exists(), "young scratch must survive")
      assert(r.kept.contains(new File(live).getName))
    } finally sys.props.remove("spark.graft.storage.dir")
  }
}
