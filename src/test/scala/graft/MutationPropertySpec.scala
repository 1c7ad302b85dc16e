package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.sources.Export

/** Property-based invariants for the H8/H9 mutation cores —
  * ScalaCheck-generated (state, delta) key sets with overlaps,
  * disjoint inserts and empty edges, each checked against a
  * plain-Scala model of the mutation semantics (the planted-case
  * specs in ExportSpec pin exact outputs; these pin the ALGEBRA on
  * adversarial shapes). */
class MutationPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Key-unique (key, value) maps with controlled overlap: state from
    * [0, 40), delta straddling the boundary so some keys match and
    * some insert; either side may be empty. */
  private val scenario: Gen[(Map[Long, String], Map[Long, String])] = for {
    stateKeys <- Gen.someOf(0L until 40L)
    deltaKeys <- Gen.someOf(20L until 60L)
  } yield (stateKeys.map(k => k -> s"s$k").toMap,
    deltaKeys.map(k => k -> s"d$k").toMap)

  private def df(m: Map[Long, String]) = {
    // explicit schema survives the empty case (toDF on Nil is fine
    // with an explicit type ascription)
    val rows: Seq[(Long, String)] = m.toSeq
    rows.toDF("k", "v")
  }

  test("mergeLatest: result IS the map union with delta winning, " +
    "key-unique, idempotent — over generated overlap shapes") {
    Gen.listOfN(25, scenario).sample.get.foreach { case (state, delta) =>
      val merged = Export.mergeLatest(df(state), df(delta), "k")
      val got = merged.collect().map(r => r.getLong(0) -> r.getString(1))
      val model = state ++ delta // the spec: latest (delta) wins
      assert(got.toMap === model)
      assert(got.length === model.size, "merge duplicated a key")
      val again = Export.mergeLatest(merged, df(delta), "k").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(again.toMap === model && again.length === model.size,
        "re-merge was not a no-op")
    }
  }

  test("scd2Apply: closed = matched, survivors untouched, arrivals " +
    "current, row count conserves, exactly one current per key") {
    Gen.listOfN(25, scenario).sample.get.foreach { case (state, delta) =>
      val stateDf = df(state)
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast("long"))
      val deltaDf = df(delta)
        .withColumn("valid_from", lit(7L))
        .withColumn("valid_to", lit(null).cast("long"))
      val hist = Export.scd2Apply(stateDf, deltaDf, "k", closeAt = 7L)
      val rows = hist.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      // APPEND-ONLY: every input row is still there, once
      assert(rows.length === state.size + delta.size)
      val (closed, current) = rows.partition(_._4.isDefined)
      // closed = exactly the matched state versions, at closeAt,
      // with their ORIGINAL values
      val matched = state.filter { case (k, _) => delta.contains(k) }
      assert(closed.map(r => r._1 -> r._2).toMap === matched)
      assert(closed.forall(_._4.contains(7L)))
      // current = survivors (original values) + every delta row
      val model = (state -- delta.keySet) ++ delta
      assert(current.map(r => r._1 -> r._2).toMap === model)
      // exactly one current version per key
      assert(current.map(_._1).distinct.length === current.length)
    }
  }
}
