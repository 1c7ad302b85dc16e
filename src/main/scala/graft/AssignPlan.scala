package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Plan-audit tool for the ASSIGNMENT path specifically: every
  * registry row that uses `EmbeddingStore.assignCells` pins its
  * output with a localCheckpoint (the episode rows' shared trade), so
  * `graft.Plans`' dumps show only a `Scan ExistingRDD` stub where the
  * two-level quantizer ran. This main dumps the PRE-checkpoint
  * executed plan of the assignment itself — the artifact that shows
  * the r19 kernel path (zero corpus exchanges) against the round-18
  * fan-out/aggregate shape.
  *
  * Usage: `sbt "runMain graft.AssignPlan [sfDir] [outFile]"`.
  */
object AssignPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("assigncells_plan.txt")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.sources.Tables(spark, sfDir)
    val emb = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding"))
    val cent = graft.operators.EmbeddingStore.seedCentroids(emb)
    val df = graft.operators.EmbeddingStore.assignCells(emb, cent)
    df.collect() // finalize AQE
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
    println(s"wrote $outFile")
  }
}
