package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.sources.Tables

/** A-family: relational core. General query capabilities the engine
  * needs under every higher-level operator (the reference's SQL layer —
  * reference: src/core/database/processor.py:349 runs plain SQL
  * aggregates/scans over chat_message; here they are declarative Spark
  * plans so Catalyst pushes filters/prunes columns/broadcasts dims).
  *
  * Oracle-parity convention (SURVEY.md §4): monetary doubles are cast
  * to DECIMAL(18,2) before SUM (exact, order-independent) and the sum
  * cast back to DOUBLE, making Spark-vs-DuckDB comparison bit-exact.
  */
object Relational {

  /** Exact, order-independent sum of a money-like double column —
    * the shared [[graft.functions.Exact.dsum]] convention. */
  private def dsum(c: Column): Column = graft.functions.Exact.dsum(c)

  private val dec = DecimalType(18, 2)

  /** A1 — grouped aggregation, TPC-H Q1 shape (map-side partial agg). */
  def aggPricing(t: Tables): DataFrame = {
    val li = t.lineitem
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A2 — filter + projection; both must reach the parquet scan
    * (PushedFilters + pruned ReadSchema in the physical plan). No
    * output order: the result is a full scan product and the driver's
    * compare canonicalizes row order, so a global sort here would be
    * pure presentation cost at scale. */
  def filterProject(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  /** A3 — fact ⋈ dim with an explicit broadcast of the dim side:
    * no shuffle of `orders` on the join key at any scale. */
  def joinBroadcast(t: Tables): DataFrame =
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment"))

  /** A4 — 5-way star join: genuinely-small dims (nation/region, fixed
    * cardinality at any scale) carry explicit broadcast hints; customer
    * GROWS with the data, so its join is left to the planner — at this
    * SF the threshold broadcasts it, at 100 TB AQE picks a shuffle
    * join instead of OOMing the driver. Only the fact side
    * (lineitem⋈orders) ever shuffles, keyed on the join key once. */
  def joinMulti(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))

  /** A5 — global top-k: planned as TakeOrderedAndProject (per-partition
    * top-k then k-way merge on the driver — no global sort shuffle). */
  def topK(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** A6 — window ranking within partitions (top-3 per nation), in two
    * stages so parallelism is not capped at the 25 distinct nations:
    * stage 1 takes top-3 within (nation, salt) — 25×16 partitions, each
    * sorting 1/16 of a nation — which provably contains the global
    * per-nation top-3; stage 2 ranks the ≤25×16×3 survivors. At 100×
    * scale the heavy sort stays at width 400, not 25. */
  def windowRank(t: Tables): DataFrame = {
    val salts = 16
    val w1 = Window
      .partitionBy(col("c_nationkey"), pmod(col("c_custkey"), lit(salts)))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val candidates = t.customer
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("srnk", row_number().over(w1))
      .filter(col("srnk") <= 3)
      .drop("srnk")
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    candidates
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        row_number().over(w).cast(LongType).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("c_nationkey"), col("rnk"))
  }

  /** A7 — distinct aggregation (expand + two-phase agg under the hood). */
  def distinctAgg(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  /** A7b — `q_distinct_approx`: the SKETCH form of A7 for true 100-TB
    * key cardinalities. Exact `countDistinct` expands each group's
    * value set through the shuffle (Expand + two-phase agg — state
    * and shuffled bytes grow with the number of DISTINCT keys per
    * group); `approx_count_distinct` (HyperLogLog++) carries a
    * fixed-size register sketch per group — one ordinary map-side-
    * combining pass, state independent of cardinality — at a
    * documented relative standard error (rsd 0.01 here, so ±~1-3%
    * in practice at 2σ).
    *
    * Contract: HLL++ register hashing is engine-specific, so the
    * approx VALUE can never hash-match a cross-engine oracle. The
    * row therefore carries the sketch's real guarantee as data: it
    * computes the sketch AND the exact count and emits
    * `within_bound` = |approx − exact| ≤ max(5, 5·rsd·exact) — the
    * oracle pins the exact leg and the literal 1, so a sketch
    * drifting past its documented error fails the DRIVER gate, not
    * just the ScalaTest one (round-15 verdict item 7; at 100 TB the
    * exact leg is dropped and the bound is the spec'd trust).
    * The two legs run as SEPARATE aggregates joined on the group key
    * (group-cardinality-sized): mixing countDistinct with an
    * imperative-buffer aggregate in ONE agg routes everything
    * through an Expand + ObjectHashAggregate pass — measured ~10×
    * the split form's cost at sf0.1 — whereas split, each leg keeps
    * its own optimal plan (two scans, both map-side combining).
    * RelationalSpec independently replays the bound against A7. */
  def distinctAggApprox(t: Tables): DataFrame = {
    val exact = t.orders
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
    val sketch = t.orders
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("__approx"))
    exact.join(sketch, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n_cust"), col("n_orders"),
        when(abs(col("__approx") - col("n_cust")) <=
          greatest(lit(5.0), col("n_cust") * 0.05), 1L).otherwise(0L)
          .as("within_bound"))
      .orderBy(col("o_orderstatus"))
  }

  /** A8 — EXISTS as a left-semi join. The probe side only answers
    * "does this custkey appear", so it is pre-aggregated to distinct
    * keys BEFORE the join: at scale this cuts the shuffled bytes by
    * the fact table's duplication factor (orders is 6× customer here,
    * far more in production). */
  def semiJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders.select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))

  /** A9 — NOT EXISTS as a left-anti join (orders with no lineitems);
    * probe side reduced to distinct keys for the same reason as A8. */
  def antiJoin(t: Tables): DataFrame =
    t.orders
      .join(t.lineitem.select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"))

  /** A10 — scalar subquery: rows above the global mean. The 1-row agg is
    * cross-broadcast, so the fact side streams without a shuffle. */
  def scalarSubquery(t: Tables): DataFrame = {
    val p = t.part
    val avgPrice = p.agg(
      (dsum(col("p_retailprice")) / count(lit(1))).as("avg_price"))
    p.join(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .select(col("p_partkey"), col("p_retailprice"))
  }

  /** A11 — hierarchical aggregation via ROLLUP; grouping nulls are
    * coalesced to 'ALL' so null-ordering never differs across engines. */
  def rollupAgg(t: Tables): DataFrame =
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))

  /** A13 — full CUBE over two dimensions (every grouping-set
    * combination in one pass — Expand feeds a single aggregate, so
    * the input scans once, not once per grouping set); same
    * coalesced-'ALL' convention as A11. */
  def cubeAgg(t: Tables): DataFrame =
    t.lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))

  /** A14 — pivot: per-priority order counts spread across status
    * columns. The pivot values are EXPLICIT — with them the plan is a
    * single pass of conditional aggregates over a static schema;
    * omitting them adds a distinct-values collect job and makes the
    * schema data-dependent, both wrong at scale. Missing cells
    * coalesce to 0 (Spark pivots them to null; the oracle's
    * CASE-sums produce 0). */
  def pivotAgg(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** A12 — union + aggregation (unionByName keeps schemas aligned). */
  def unionAgg(t: Tables): DataFrame = {
    val c = t.customer.select(col("c_nationkey").as("nationkey"))
    val s = t.supplier.select(col("s_nationkey").as("nationkey"))
    c.unionByName(s)
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))
  }

  /** A16 — `q_grouping_sets`: explicit GROUPING SETS — here the two
    * NON-hierarchical sets (priority), (status), i.e. two independent
    * GROUP BYs answered in ONE pass. Rollup/cube (A11/A13) only
    * express prefix/powerset lattices; arbitrary sets are the general
    * form, and the scale win is the same Expand-into-one-aggregate
    * plan: the fact table scans ONCE where the naive union of two
    * aggregates scans twice (at 100 TB, reading the corpus once per
    * dashboard axis is the difference between one job and N). The
    * null-marker cells coalesce to 'ALL' (the A11 convention — both
    * group columns are non-null in the schema, so the marker is
    * unambiguous). */
  def groupingSetsAgg(t: Tables): DataFrame =
    t.orders
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy(col("prio"), col("status"))

  /** A15's salting geometry: a fact key is HOT above this many fact
    * rows (so the hot SET is bounded at |fact|/threshold keys — tiny
    * by construction, safe to broadcast at any scale), and each hot
    * key's fact rows spread over this many salt sub-partitions (its
    * dim row replicates that many times). Constants so the oracle and
    * the spec replay the same split. */
  private[graft] val skewHotThreshold = 15L
  private[graft] val skewSaltFactor = 8

  /** The hot-key split-and-salt join core (testable on planted-skew
    * frames): result ≡ `fact ⋈ dim ON factKey = dimKey`, but no
    * reducer ever sees more than ~1/[[skewSaltFactor]] of a hot key's
    * fact rows.
    *
    * Pass 1 is the hot-key census (one map-side-combining agg over
    * the fact keys; a production pipeline caches it across runs).
    * The fact then splits by broadcast semi/anti against that set:
    * the COLD half joins plainly — its per-key row counts are ≤ the
    * threshold, so no post-shuffle partition can be key-dominated —
    * and the HOT half salts: fact rows get a row-position salt
    * (monotonically_increasing_id mod S — a content hash would
    * co-locate a hot key's duplicate rows), the dim rows for hot keys
    * replicate once per salt value, and
    * the join keys on (key, salt). Replication cost is |hot keys| × S
    * dim rows — bounded by the census, never |dim| × S (the naive
    * full-replication salting this row exists to avoid).
    *
    * When to reach for this instead of AQE: AQE's skew rule splits
    * oversized SORT-MERGE partitions at runtime, which covers most
    * cases; the manual rewrite is for skew AQE can't see or can't act
    * on — a hot key known a priori, hash joins / bucketed no-exchange
    * plans, or engines mid-migration where the plan must be portable.
    * Both halves here carry an explicit shuffle-hash hint so the row
    * exercises (and the spec pins) the salted SHUFFLE path — with the
    * dim left broadcastable the demo would silently degenerate to two
    * broadcast joins and prove nothing. */
  private[graft] def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      threshold: Long = skewHotThreshold,
      salts: Int = skewSaltFactor): DataFrame = {
    // the census is materialized ONCE (eager localCheckpoint of a
    // frame bounded by the hot-key count) — it feeds three joins
    // (hot semi, cold anti, dim semi) and an unpinned broadcast(hot)
    // would re-run the full-fact aggregate for each of them
    val hot = fact.groupBy(col(factKey)).agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .select(col(factKey).as("hk"))
      .localCheckpoint(true)
    // salt = a row-POSITION spread, deliberately not a content hash:
    // identical fact rows must still land on different salts (a
    // content hash would co-locate a hot key's duplicate rows on one
    // reducer — the exact pathology this exists to fix). Any salt
    // value in [0, S) yields the same join result (the dim replicates
    // for every salt), so non-determinism across retries is harmless.
    val factHot = fact
      .join(broadcast(hot), col(factKey) === col("hk"), "left_semi")
      .withColumn("fsalt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val factCold = fact
      .join(broadcast(hot), col(factKey) === col("hk"), "left_anti")
    val dimHot = dim
      .join(broadcast(hot), col(dimKey) === col("hk"), "left_semi")
      .withColumn("dsalt",
        explode(typedLit((0 until salts).map(_.toLong))))
    // the shuffle-hash hint sits on the DIM side: a one-sided hint
    // makes THAT side the hash-map build side, and the build side
    // must be the bounded one (the replicated hot dim / the dim) —
    // hinting the fact would hash-build whole fact partitions,
    // inverting the memory bound the salting exists to provide
    val hotJoined = factHot
      .join(dimHot.hint("shuffle_hash"), col(factKey) === col(dimKey) &&
        col("fsalt") === col("dsalt"))
      .drop("fsalt", "dsalt")
    val coldJoined = factCold
      .join(dim.hint("shuffle_hash"), col(factKey) === col(dimKey))
    hotJoined.unionByName(coldJoined)
  }

  /** A17 — `q_join_outer`: the LEFT-OUTER fact join + null-group
    * aggregate (TPC-H Q13 — the orders-per-customer distribution
    * INCLUDING the zero bucket, the single most common warehouse
    * join form; customers whose only orders are urgent land in the
    * zero bucket through the outer join's null side). The oracle is
    * DuckDB's native LEFT JOIN over the raw tables.
    *
    * Scale shape: the literal Q13 plan left-joins the RAW fact and
    * then groups by custkey — shuffling every order row. Catalyst
    * does NOT push a partial aggregate below an outer join, so the
    * engine applies the standard Q13 rewrite by hand: pre-aggregate
    * orders to (o_custkey, n) FIRST (map-side combine; only key+count
    * pairs shuffle, and the join's right side shrinks to ≤ |custkeys|
    * rows), then LEFT JOIN customer to the aggregate — null-group
    * semantics intact, coalesce(n, 0) IS the zero bucket. Both sides
    * shuffle on the one join key; the final distribution aggregate is
    * ≤ max-orders-per-customer rows. Equivalence to the literal plan
    * holds because the join key is the full grouping key. */
  def joinOuter(t: Tables): DataFrame = joinOuterOn(t.customer, t.orders)

  /** A17 over arbitrary (customer, orders) frames — the spec drives
    * planted zero-order customers through this. */
  private[graft] def joinOuterOn(customer: DataFrame,
      orders: DataFrame): DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** A18 — `q_correlated_subquery`: the CORRELATED scalar aggregate
    * subquery (TPC-H Q17: lineitem rows under 20 % of their part's
    * average quantity, for one brand's parts — the small-order
    * revenue-loss probe). The oracle keeps the LITERAL correlated
    * form (`l_quantity < (SELECT 0.2*AVG(l_quantity) … WHERE
    * l2.l_partkey = p_partkey)`); the engine applies the standard
    * decorrelation a warehouse optimizer performs, taken one step
    * further to its single-shuffle form: the brand's parts BROADCAST
    * semi-prune the fact scan, then ONE window average over
    * l_partkey computes every part's threshold in the same pass that
    * filters against it — no per-part re-aggregation join, no second
    * fact scan, one exchange on the correlation key total.
    *
    * Parity: l_quantity is integral, so the partial sums behind AVG
    * are exact and the average is ONE correctly-rounded division in
    * both engines; `0.2 * avg` is the same IEEE product, making the
    * filter boundary engine-exact. The revenue sum uses the A-family
    * decimal discipline, divided by 7.0 once and rounded 2 dp. */
  def correlatedSubquery(t: Tables): DataFrame = {
    val parts = t.part.filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    t.lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        round(sum(col("l_extendedprice").cast(dec)).cast(DoubleType) / 7.0, 2)
          .as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  /** A19 — `q_multi_exists`: MULTIPLE correlated existential
    * subqueries against the same fact (the TPC-H Q21 shape): orders
    * whose lineitems came from at least TWO distinct suppliers AND
    * with no returned line — one EXISTS (a self-join inside it) and
    * one NOT EXISTS, both correlated to the outer row. The oracle
    * keeps the literal two-subquery form.
    *
    * The engine decorrelates BOTH subqueries into ONE map-side-
    * combining aggregate over the fact: per orderkey,
    * `count(distinct l_suppkey)` answers the pairwise-different-
    * supplier EXISTS (∃ two rows with different suppliers ⇔ distinct
    * count ≥ 2 — the self-join inside the EXISTS never runs) and
    * `max(returnflag = 'R')` answers the NOT EXISTS; the qualifying
    * keys then semi-join orders. One fact pass, one shuffle on the
    * correlation key, instead of three correlated probes per outer
    * row — at 100 TB the literal form is two extra fact joins, one
    * of them a fact×fact self-join. */
  def multiExists(t: Tables): DataFrame = multiExistsOn(t.orders, t.lineitem)

  /** A19 over arbitrary (orders, lineitem) frames — the spec drives
    * planted qualification edge cases through this. */
  private[graft] def multiExistsOn(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val flags = lineitem
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
      .filter(col("n_supp") >= 2 && col("has_r") === 0)
      .select(col("l_orderkey"))
    orders
      .join(flags, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** A20 — `q_set_ops`: the explicit SET OPERATORS (INTERSECT /
    * EXCEPT — the last piece of the relational-algebra surface beside
    * A12's UNION): customers with open AND fulfilled orders vs
    * customers with open but NO fulfilled orders, as one two-row
    * audit (per op: distinct-customer count + key checksum). The
    * oracle uses the literal INTERSECT/EXCEPT keywords.
    *
    * Scale shape: the engine DECLARES `intersect`/`except` and lets
    * Catalyst apply its rewrite (distinct + left-semi / left-anti on
    * the one key — A8/A9's machinery, chosen by the optimizer rather
    * than hand-assembled), so the shuffled bytes are bounded by the
    * distinct key sets, never the fact; the two legs share the two
    * filtered scans and the final union is two 1-row aggregates. */
  def setOps(t: Tables): DataFrame = {
    val open = t.orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val fulfilled = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    def leg(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_cust"),
        expr("bit_xor(o_custkey)").as("key_xor"))
        .select(lit(name).as("op"), col("n_cust"), col("key_xor"))
    leg("except", open.except(fulfilled))
      .unionByName(leg("intersect", open.intersect(fulfilled)))
      .orderBy(col("op"))
  }

  /** A15 — `q_join_skew`: the skew-salted fact ⋈ dim join, proven
    * equal to the plain join by the oracle (which just joins). Orders
    * ⋈ customer on custkey — the pair where the dim GROWS with the
    * data (unlike nation/region), so at 100 TB broadcast stops being
    * an option and per-key fact skew lands on single reducers unless
    * split. Post-join aggregate keeps the output bounded. */
  def joinSkew(t: Tables): DataFrame =
    saltedJoin(t.orders, t.customer, "o_custkey", "c_custkey")
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
}
