package graft
import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/** Benchmark main: one untimed warm-up pass at sf0.001 (absorbs JVM
  * classloading, Catalyst init and whole-stage-codegen compilation —
  * generated classes are cached by plan shape, so the warm-up carries
  * over to the timed passes on the real SF), then N timed passes
  * (default 3, `SPARK_GRAFT_PASSES`) in sorted key order.
  *
  * CONTENTION-PROOFING: this box is co-tenanted, and a single timed
  * pass is hostage to whatever else runs in its window (two rounds of
  * driver artifacts were pure noise: a 14× inflation on unchanged
  * code). Three defenses, so the emitted JSON is a usable signal
  * without an idle re-run:
  *
  *  1. per-query MINIMUM across the passes — noise is strictly
  *     additive (a co-tenant can only slow a query down), so the min
  *     is the best contention-free estimate a finite sample gives;
  *     pass-major order spaces the N runs of each query minutes
  *     apart, so one noisy window cannot poison all N.
  *  2. per-query process-CPU seconds (`queries_cpu`, min across
  *     passes, from OperatingSystemMXBean.getProcessCpuTime) — CPU
  *     charged to THIS process is contention-independent up to cache
  *     pollution, so wall/cpu disagreement localizes noise: wall 14×
  *     baseline with cpu at baseline reads "noisy box", both high
  *     reads "real regression".
  *  3. machine-load evidence: system load average sampled before
  *     each pass (`load_avg`), so the artifact itself records whether
  *     the box was busy.
  */
object Bench {

  /** The timing sink every bench tool shares: execute through the
    * built-in `noop` datasource, NOT `count()` — count() lets
    * Catalyst prune a pure-projection query body down to a parquet
    * row count, so the per-row F/G-family rows would time the scan
    * instead of the operator (discovered round 11; BENCH_BASELINE.md
    * bars re-based). noop forces full evaluation of every output
    * column with zero write cost. */
  private[graft] def consume(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val t0Main = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    // WALL BUDGET (seconds, from main() entry): the driver runs this
    // under an external `timeout`, and round 17's artifact was rc=124 /
    // parsed-null — suite growth finally overran the cap on a hot
    // window, leaving NO perf signal for the round. The budget makes
    // that structurally impossible: pass k+1 runs only if the elapsed
    // wall plus a conservative estimate of the next pass still fits.
    // Pass 1 ALWAYS runs (one pass is a complete, accurate artifact).
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET", "1200").toDouble
    def elapsedSec = (System.nanoTime() - t0Main) / 1e9
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver keeps only a bounded tail of output
    // and parses the LAST JSON line in it — WARN chatter (WindowExec,
    // large-task-binary) after the final emission can push the JSON
    // out of the tail when an external timeout strikes mid-pass
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = ManagementFactory.getPlatformMXBean(
      classOf[com.sun.management.OperatingSystemMXBean])
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try consume(SparkEntry.queries(n)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    // the bucketed layout is STORAGE — paid once at write/ETL time,
    // exactly like the pre-generated parquet every other query reads.
    // Materialize it for the bench SF before timing (tables only, no
    // query execution) so q_join_bucketed measures the join, not the
    // one-time table write. A failure here is LOUD: the timed query
    // would then include the write and the number must be explainable.
    try graft.sources.Bucketing.ensureLayout(spark, sfDir)
    catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] bucketed-layout setup failed (q_join_bucketed will " +
            s"include the table write): ${e.getMessage}")
    }
    // same storage argument for the z-ordered events layout probed
    // by q_zorder_scan: clustered once at write time
    try graft.sources.Zorder.ensureZorderLayout(spark, sfDir)
    catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] z-order layout setup failed (q_zorder_scan will " +
            s"include the clustered write): ${e.getMessage}")
    }
    // same storage argument for the persisted IVF index: built once at
    // ETL time, probed by q_search_ivf — materialize untimed
    try graft.operators.EmbeddingStore.ensureIndex(
      graft.sources.Tables(spark, sfDir))
    catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] IVF index setup failed (q_search_ivf will include " +
            s"the build): ${e.getMessage}")
    }
    // same storage argument for the half-corpus DAY BASE (dedup state
    // + IVF index) that q_advance_day / q_index_maintain /
    // q_index_history copy-then-mutate: it is the PREVIOUS day's
    // output in production — built once untimed, so those rows time
    // the advance, not the base build
    try graft.operators.AdvanceDay.ensureDayBase(
      graft.sources.Tables(spark, sfDir))
    catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] day-base setup failed (the day-episode rows will " +
            s"include the base build): ${e.getMessage}")
    }
    // same again for the persisted dedup signature state joined by
    // q_dedup_incremental: built once at ETL time, so the bench times
    // the delta run, not the base-corpus signature build
    try graft.operators.Dedup.ensureDedupState(
      graft.sources.Tables(spark, sfDir))
    catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] dedup state setup failed (q_dedup_incremental will " +
            s"include the base build): ${e.getMessage}")
    }
    // and the date-partitioned events layout probed by
    // q_incremental_pruned
    try graft.sources.Bucketing.ensureEventsByDate(spark, sfDir)
    catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] date-partitioned events setup failed " +
            s"(q_incremental_pruned will include the rewrite): ${e.getMessage}")
    }
    // wall[q] / cpu[q] = minimum across passes; -1 marks a query that
    // failed in ANY pass (a regression must read as a failure, never
    // as a suspiciously fast timing)
    val wall = collection.mutable.Map(names.map(_ -> Double.MaxValue): _*)
    val cpu = collection.mutable.Map(names.map(_ -> Double.MaxValue): _*)
    val failed = collection.mutable.Set[String]()
    val loads = collection.mutable.ArrayBuffer[Double]()
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")

    def fmt(m: collection.Map[String, Double], done: Set[String]): String =
      names.filter(done).map(n =>
        "\"" + n + "\":" + (if (failed(n)) -1.0 else m(n)))
        .mkString("{", ",", "}")
    // any failure makes the headline total -1: a broken query must never
    // shrink the total into looking like a speedup
    def totalOf(m: collection.Map[String, Double], done: Set[String]): Double =
      if (done.exists(failed)) -1.0 else names.filter(done).map(m).sum
    // the driver keeps only a bounded tail of output (~2,000 chars), so
    // the LAST line must be the one it parses: print the ~4 KB full
    // per-query line FIRST (humans / logs), write it to a file (the
    // durable artifact), and end with a short self-contained headline
    // JSON (<250 chars — always survives any tail). EMITTED AFTER
    // EVERY PASS (and periodically inside pass 1), not once at the
    // end: an external timeout mid-pass must leave the newest COMPLETE
    // line parseable, never rc=124 with nothing (the round-17 failure)
    def emit(passesDone: Int, done: Set[String]): Unit = {
      val total = totalOf(wall, done)
      val loadStr = loads.map(l => f"$l%.2f").mkString("[", ",", "]")
      val headline = s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":${totalOf(cpu, done)},"passes":$passesDone,"load_avg":$loadStr,"nqueries":${done.size},"sf":"$sfDir"}"""
      val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(wall, done)},"queries_cpu":${fmt(cpu, done)},"cpu_total":${totalOf(cpu, done)},"passes":$passesDone,"load_avg":$loadStr,"sf":"$sfDir"}"""
      println(full)
      println(headline)
      System.out.flush()
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile), full + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
      }
    }

    var pass = 0
    var lastPassSec = 0.0
    var continue = true
    while (continue && pass < passes) {
      val tPass = System.nanoTime()
      loads += osBean.getSystemLoadAverage
      val done = collection.mutable.Set[String]()
      names.foreach { name =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        try {
          consume(SparkEntry.queries(name)(spark, sfDir))
          wall(name) = math.min(wall(name), (System.nanoTime() - t0) / 1e9)
          cpu(name) = math.min(cpu(name), (osBean.getProcessCpuTime - c0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += name
        }
        done += name
        // pass 1 has no complete line yet — the only window where a
        // timeout could still leave nothing. Emit a partial cumulative
        // line periodically ("passes":0 + the shrunken nqueries mark
        // it as partial, values are real per-query minima so far)
        if (pass == 0 && done.size % 40 == 0 && done.size < names.size)
          emit(0, done.toSet)
      }
      pass += 1
      lastPassSec = (System.nanoTime() - tPass) / 1e9
      emit(pass, names.toSet)
      // adaptive pass count: stop early when the budget cannot fit
      // another pass (1.15 = headroom for ambient repricing mid-pass)
      continue = elapsedSec + 1.15 * lastPassSec <= budgetSec
      if (!continue && pass < passes)
        System.err.println(
          f"[bench] budget stop after pass $pass: elapsed $elapsedSec%.0f s" +
            f" + est ${1.15 * lastPassSec}%.0f s > budget $budgetSec%.0f s")
    }
    spark.stop()
  }
}
