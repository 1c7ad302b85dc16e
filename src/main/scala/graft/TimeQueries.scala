package graft

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/** Dev utility: time a named subset of SparkEntry queries — the
  * per-query slice of [[Bench]] for A/B probes (e.g. chasing one
  * row's CPU drift across two commits without paying the full 80+
  * query sweep). Same session conf, warm-up discipline and
  * min-of-N-passes / process-CPU contention-proofing as Bench so the
  * numbers are comparable with bench_out.json rows.
  * Usage: runMain graft.TimeQueries <sfDir> <name> [<name> ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    require(names.nonEmpty, "usage: TimeQueries <sfDir> <name> [<name>...]")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = ManagementFactory.getPlatformMXBean(
      classOf[com.sun.management.OperatingSystemMXBean])
    names.foreach(n => Bench.consume(SparkEntry.queries(n)(spark, warmDir)))
    val wall = collection.mutable.Map(names.map(_ -> Double.MaxValue): _*)
    val cpu = collection.mutable.Map(names.map(_ -> Double.MaxValue): _*)
    (0 until passes).foreach { _ =>
      names.foreach { name =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        Bench.consume(SparkEntry.queries(name)(spark, sfDir))
        wall(name) = math.min(wall(name), (System.nanoTime() - t0) / 1e9)
        cpu(name) = math.min(cpu(name), (osBean.getProcessCpuTime - c0) / 1e9)
      }
    }
    names.foreach { n =>
      println(f"TIMEQ $n%-24s wall=${wall(n)}%.2f cpu=${cpu(n)}%.2f")
    }
    spark.stop()
  }
}
