package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming reader for an events directory that normalizes `ts` to
  * TimestampType regardless of the on-disk representation:
  * micros/NTZ parquet casts directly, and raw TIMESTAMP(NANOS) files
  * (which Spark's reader otherwise rejects) are read as nanos longs
  * and truncated to micros — the same convention as
  * `Tables.events`, so batch and stream agree on event time. */
private[streaming] object EventStream {

  def read(spark: SparkSession, inputDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(inputDir).schema
    val raw = spark.readStream.schema(schema).parquet(inputDir)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
