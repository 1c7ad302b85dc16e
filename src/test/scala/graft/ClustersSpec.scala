package graft

import org.apache.spark.sql.functions._

import graft.operators.Clusters
import graft.sources.Tables

class ClustersSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  test("connectedComponents resolves a transitive chain to one cluster") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4: needs multiple rounds), separate
    // pair 10-11, triangle 20-21-22 with a redundant edge
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = Clusters.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert(got(10L) == 10L && got(11L) == 10L)
    assert((20L to 22L).forall(got(_) == 20L))
    assert(got.size === 10)
  }

  test("a 200-node path graph converges within the logarithmic round cap") {
    import spark.implicits._
    // worst case for plain label propagation (needs 199 rounds);
    // pointer jumping must close it inside the default cap
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Clusters.connectedComponents(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 200)
    assert(got.forall(_._2 == 0L))
  }

  test("an empty pair set yields an empty labeling, not a crash") {
    import spark.implicits._
    // a corpus with no near-dup pairs feeds an empty frame here; the
    // aggregate-based convergence probe must read sum-over-zero-rows
    // as zero (it is SQL null) and converge immediately
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Clusters.connectedComponents(none, "a", "b").count() === 0)
  }

  test("dedupClusters covers exactly the docs in minhash pairs") {
    val pairs = graft.operators.Dedup.dedupMinhash(t)
    val inPairs = pairs.select(col("doc_a").as("d"))
      .unionByName(pairs.select(col("doc_b").as("d")))
      .distinct().count()
    val clusters = Clusters.dedupClusters(t)
    assert(clusters.count() === inPairs)
    // every cluster id is a member of its own cluster (the canonical
    // survivor exists), and is the minimum member
    val bad = clusters.groupBy("cluster_id")
      .agg(min(col("doc_id")).as("min_doc"))
      .filter(col("cluster_id") =!= col("min_doc")).count()
    assert(bad === 0)
  }

  test("dedupCanonical keeps the max-quality member of every cluster") {
    val clusters = Clusters.dedupClusters(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = graft.operators.TextAnalysis.qualityScore(t)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = clusters.groupBy(_._2).map { case (cid, members) =>
      val ids = members.map(_._1)
      val keep = ids.minBy(id => (-quality(id), id))
      cid -> (keep, quality(keep), ids.length.toLong)
    }
    val got = Clusters.dedupCanonical(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (cid, (keep, q, n)) =>
      val (gk, gq, gn) = got(cid)
      assert(gk === keep, s"cluster $cid survivor")
      assert(gq === q, s"cluster $cid quality")
      assert(gn === n, s"cluster $cid member count")
    }
    // keep-best genuinely differs from min-id survivorship somewhere,
    // or the quality argmax would be dead weight
    assert(expected.exists { case (cid, (keep, _, _)) => keep != cid },
      "at least one cluster's best copy should not be its lowest id")
  }

  test("dedupFamily equals the union of the three standalone queries") {
    val fam = Clusters.dedupFamily(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSet
    val pairs = graft.operators.Dedup.dedupMinhash(t).collect()
      .map(r => ("pair", r.getLong(0), r.getLong(1), Some(r.getDouble(2))))
    val clusters = Clusters.dedupClusters(t).collect()
      .map(r => ("cluster", r.getLong(0), r.getLong(1), Some(-1.0)))
    val contam = graft.operators.Dedup.decontaminate(t).collect()
      .map(r => ("contam", r.getLong(0), r.getLong(1), Some(r.getDouble(2))))
    assert(fam === (pairs ++ clusters ++ contam).toSet)
    assert(fam.nonEmpty)
  }
}
