package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** H6 — `q_zorder_scan`: the MULTI-DIMENSIONAL clustering layout —
  * Z-ORDER (Morton-interleave) the events store on (user_id, day) so
  * that ONE physical order serves range predicates on BOTH columns.
  * A single-column sort answers its own column's predicates and
  * nothing else (a time-sorted 100-TB event store makes every
  * user-scoped query a full scan); interleaving the two keys makes
  * every contiguous key range a near-rectangle in (user, day) space,
  * so parquet row-group min/max stats stay TIGHT on both columns and
  * the reader's pushed filters skip most of the store for a box query
  * on either or both. This is the Delta `OPTIMIZE ... ZORDER BY` /
  * Iceberg sort-order operation — like H5's compaction, a write-once
  * layout cost amortized over every subsequent query (the
  * [[Bucketing]] argument, aimed at range scans instead of joins).
  *
  * Two constructions matter, both write-side only:
  *
  *  - NORMALIZE BEFORE INTERLEAVING. Raw values interleave garbage
  *    when the dimensions' domains are unbalanced (a 4-bit user id
  *    against a 5-bit day puts every meaningful user bit below every
  *    meaningful day bit — the curve degenerates to a day sort;
  *    measured exactly that before this fix). Each dimension min-max
  *    rescales to [[zBuckets]] integer buckets first (one 1-row agg
  *    at write time — Delta's implementation normalizes by
  *    range-partition id for the same reason), so the two dimensions'
  *    bits alternate at equal significance.
  *  - FILE-COUNT GRANULARITY IS PER-DIMENSION √F. F z-range files
  *    give each dimension ~√F prunable stripes (the interleave
  *    alternates which dimension a bit refines), so a predicate of
  *    selectivity f on EITHER dimension scans ~max(f, 1/√F) of the
  *    store — versus 1.0 for the dimension a single sort doesn't
  *    cover. [[zFiles]] = 64 ⇒ 8 stripes per dimension here; at
  *    100 TB, F = ceil(bytes/target) within each date partition
  *    (H5's sizing rule) and √F grows with the data.
  *
  * The query row runs a fixed box query (user_id 3-7 × days 8-14)
  * THROUGH the z-ordered store; the oracle runs the same predicate
  * over the raw events table, so the layout round trip is proven
  * lossless-and-exact on the rows it returns. What no SQL oracle can
  * see — that the layout actually PRUNES — ZorderSpec pins instead,
  * via the scan node's own row metrics on both single-dimension boxes
  * and the 2-d box, against a time-sorted control layout.
  *
  * Scale shape: the layout build is one 1-row stats agg + one
  * range-repartition on the z-value + in-partition sort (the standard
  * cluster-write), 16 interleave terms of shift/mask arithmetic,
  * codegen'd, write-once; the query is scan → pushed filters →
  * projection with NO shuffle and no stateful operator at all. */
object Zorder {

  /** Per-dimension normalized domain: 256 buckets = 8 interleaved
    * bits each. Finer buckets only matter once file counts pass
    * ~2^16; the stripe math above is file-count-bound, not
    * bucket-bound. */
  private[graft] val zBuckets = 256L

  private[graft] val zBits = 8

  /** Layout geometry: file count of the clustered write — each
    * dimension gets ~√zFiles prunable stripes. At 100 TB:
    * ceil(bytes/target) within each date partition, H5's rule. */
  private[graft] val zFiles = 64

  /** The Morton key: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Both inputs must be non-negative and < 2^[[zBits]]
    * (i.e. already bucketed). */
  private[graft] def zValue(a: Column, b: Column): Column =
    (0 until zBits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Min-max rescale to [0, [[zBuckets]]): exact integer arithmetic,
    * monotone, write-side only (queries filter the raw columns). */
  private[graft] def bucketed(c: Column, lo: Long, hi: Long): Column =
    ((c - lit(lo)) * lit(zBuckets) / lit(math.max(1L, hi - lo + 1)))
      .cast("long")

  /** Day-zero for the day dimension (the fixture's first event day;
    * a production layout derives it from the table's min date once). */
  private[graft] val epochDay = "2024-01-01"

  /** The persisted time key: `days(ts)` as an INT64 — Iceberg's day
    * partition transform, stored BESIDE ts. Measured necessity, not
    * style: Spark 4.1.2 pushes TIMESTAMP_NTZ predicates to parquet
    * but row-group stats pruning never fires for them (a perfectly
    * ts-sorted layout still scans 100% — probed directly), while
    * BIGINT stats prune exactly. Every time predicate on the store
    * therefore also constrains `day` (a superset predicate derived
    * from the same rule — the standard partition-pruning predicate
    * duplication), and the exact ts bounds still apply row-level. */
  private[graft] def dayCol: Column =
    greatest(datediff(to_date(col("ts")), lit(epochDay)), lit(0))
      .cast("long")

  private val zorderVersion = "r13-z8x8-minmax-u-day64-64f"

  /** Write `events` z-ordered by (user_id, day) as [[zFiles]]
    * z-range-partitioned, z-sorted parquet files at `out`, with the
    * INT64 `day` key persisted. */
  private[graft] def writeZordered(events: DataFrame, out: String): Unit = {
    val dims = events.withColumn("day", dayCol)
    val r = dims.agg(min(col("user_id")), max(col("user_id")),
      min(col("day")), max(col("day"))).first()
    val (u0, u1, d0, d1) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    dims
      .withColumn("_z", zValue(
        bucketed(col("user_id"), u0, u1), bucketed(col("day"), d0, d1)))
      .repartitionByRange(zFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.parquet(out)
  }

  /** The z-ordered events store for a data dir — built once per
    * (dir, data fingerprint, rule version) under the cluster-shared
    * layouts root, like the bucketed tables and the IVF index. */
  def ensureZorderLayout(spark: SparkSession, dir: String): String =
    LayoutStore.ensure(dir, "zorder_events", zorderVersion) { path =>
      writeZordered(Tables(spark, dir).events, path)
    }

  /** The box's bounds — one definition for the store row, the raw
    * oracle equivalent and the spec so they can never drift. Days
    * 2024-01-08 .. 01-14 are offsets 7..13 from [[epochDay]]. */
  private[graft] val boxUserLo = 3L
  private[graft] val boxUserHi = 7L
  private[graft] val boxTsLo = "2024-01-08"
  private[graft] val boxTsHi = "2024-01-15"
  private[graft] val boxDayLo = 7L
  private[graft] val boxDayHi = 13L

  /** The box predicate over the STORE (user + pruning day key +
    * exact ts bounds). */
  private[graft] def boxFilter(df: DataFrame): DataFrame =
    df.filter(col("user_id").between(boxUserLo, boxUserHi) &&
      col("day").between(boxDayLo, boxDayHi) &&
      col("ts") >= lit(boxTsLo).cast("timestamp_ntz") &&
      col("ts") < lit(boxTsHi).cast("timestamp_ntz"))

  /** The same box over the RAW events table (no day column). */
  private[graft] def boxFilterRaw(df: DataFrame): DataFrame =
    df.filter(col("user_id").between(boxUserLo, boxUserHi) &&
      col("ts") >= lit(boxTsLo).cast("timestamp_ntz") &&
      col("ts") < lit(boxTsHi).cast("timestamp_ntz"))

  private val eventsSchema =
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, " +
      "event_type STRING, value DOUBLE, props STRING, day LONG"

  /** H6 — the box query through the persisted z-ordered store. */
  def zorderScan(t: Tables): DataFrame = {
    val store = ensureZorderLayout(t.spark, t.dir)
    boxFilter(t.spark.read.schema(eventsSchema).parquet(store))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
  }
}
