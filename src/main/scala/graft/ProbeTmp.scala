package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q_search_ivfpq")(spark, "/root/testdata/sf0.01")
    df.collect()
    println("PLANSTART")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
