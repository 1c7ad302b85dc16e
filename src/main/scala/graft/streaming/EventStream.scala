package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming reader for an events directory that normalizes `ts` to
  * an event-time TIMESTAMP whose epoch micros EQUAL the naive
  * wall-clock micros of `Tables.events`' TIMESTAMP_NTZ (naive-as-UTC).
  *
  * Why not NTZ directly: Spark watermarks hard-require TimestampType
  * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise). So the stream
  * keeps an internal TIMESTAMP, but every conversion here is
  * SESSION-TZ-INDEPENDENT epoch arithmetic (`timestamp_micros` /
  * `timestampdiff` on an NTZ epoch base, never an LTZ<->NTZ cast):
  * nanos longs truncate to micros, and NTZ sources diff against the
  * NTZ epoch. Watermarks/windows are epoch arithmetic, so window
  * bounds land identically in any session timezone; downstream
  * outputs convert back to NTZ with `ntzFromEpochMicros`
  * (IncrementalPipeline) or emit epoch-micros longs
  * (StatefulSessionizer) — batch and stream therefore agree on hour
  * windows and session bounds everywhere, not just under UTC. The
  * `nanosAsLong` conf is session-wide (Spark has no per-read option);
  * see the Tables.events scaladoc for the library-wide convention. */
private[streaming] object EventStream {

  /** `maxFilesPerTrigger` bounds each micro-batch (production
    * backfill pacing; the recovery spec uses it to force a
    * multi-batch run it can kill mid-stream). */
  def read(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(inputDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    val raw = reader.parquet(inputDir)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "timestamp_ntz'1970-01-01 00:00:00', ts))"))
      case _ => // already TIMESTAMP: epoch micros are what they are
        raw
    }
  }

  /** Epoch-micros TIMESTAMP (naive-as-UTC) → TIMESTAMP_NTZ, the
    * inverse of the conversions above: NTZ epoch base + exact-decimal
    * micro interval, session-tz-independent (an `ltz.cast(ntz)` would
    * render in the session zone instead). */
  def ntzFromEpochMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr("timestamp_ntz'1970-01-01 00:00:00'") +
      make_dt_interval(lit(0), lit(0), lit(0),
        unix_micros(c).cast(org.apache.spark.sql.types.DecimalType(20, 0)) /
          lit(1000000))
}
