package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE named SparkEntry query against a data dir and
  * dump its result to parquet — the per-query slice of [[Verify]], for
  * iterating on a single operator/oracle pair without paying the full
  * SparkEntry.queries dump. Same session conf as Verify so results are
  * comparable. Usage: runMain graft.RunOne <name> <sfDir> <outDir> */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach(sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.sql"), sql))
    spark.stop()
  }
}
