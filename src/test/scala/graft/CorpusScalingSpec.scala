package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** The corpus-scaling bench's replication must multiply work WITHOUT
  * changing its character, or the SCALING.md §5 curves measure an
  * artifact. These invariants are what make the read honest:
  * per-replica statistics identical to the base corpus, zero
  * cross-replica similarity (documents) / exact in-replica geometry
  * (embeddings). */
class CorpusScalingSpec extends SparkTestBase {

  test("replicated corpus preserves per-replica stats and keeps replicas disjoint") {
    val dir = CorpusScaling.ensureReplicatedDir(spark, sfDir, 2)
    val base = Tables(spark, sfDir)
    val scaled = Tables(spark, dir)

    val n0 = base.documents.count()
    assert(scaled.documents.count() === 2 * n0)
    assert(scaled.documents.select("doc_id").distinct().count() === 2 * n0)

    // the word salt is bijective per replica: token counts per doc
    // match the base corpus exactly in each replica
    val baseTok = base.documents
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val docBase = base.documents.agg(max(col("doc_id"))).first().getLong(0) + 1L
    scaled.documents
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("nt"))
      .collect().foreach { r =>
        assert(r.getInt(1) === baseTok(r.getLong(0) % docBase),
          s"token count drifted for replicated doc ${r.getLong(0)}")
      }

    // zero cross-replica similarity: every MinHash-LSH pair the
    // scaled corpus produces stays WITHIN one replica, and each
    // replica reproduces exactly the base corpus' pair set
    val basePairs = Dedup.dedupMinhash(base).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val scaledPairs = Dedup.dedupMinhash(scaled).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(scaledPairs.length === 2 * basePairs.size)
    scaledPairs.foreach { case (a, b) =>
      assert(a / docBase === b / docBase, s"cross-replica pair ($a, $b)")
      assert(basePairs.contains((a % docBase, b % docBase)))
    }

    // embeddings: the circular shift preserves norms exactly and the
    // replica stays id-disjoint
    val m0 = base.embeddings.count()
    assert(scaled.embeddings.count() === 2 * m0)
    val norms = scaled.embeddings.select(
      col("vec_id"),
      round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 5).as("nrm"))
    val embBase = base.embeddings.agg(max(col("vec_id"))).first().getLong(0) + 1L
    val baseNorms = base.embeddings.select(
      col("vec_id"),
      round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 5).as("nrm"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    norms.collect().foreach { r =>
      assert(r.getDouble(1) === baseNorms(r.getLong(0) % embBase),
        s"norm drifted for replicated vec ${r.getLong(0)}")
    }

    // lineitem/part (the A18/Q17 pair, replicated since r14): counts
    // multiply, the lineitem→part FK survives the key shifts, and
    // per-part fact density is constant (the Q17 window never
    // deepens under replication)
    assert(scaled.lineitem.count() === 2 * base.lineitem.count())
    assert(scaled.part.count() === 2 * base.part.count())
    assert(scaled.lineitem
      .join(scaled.part, col("l_partkey") === col("p_partkey"), "left_anti")
      .count() === 0L, "a replicated lineitem row lost its part")
    val partBase = base.part.agg(max(col("p_partkey"))).first().getLong(0) + 1L
    val baseDens = base.lineitem.groupBy(col("l_partkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    scaled.lineitem.groupBy(col("l_partkey")).count()
      .collect().foreach { r =>
        assert(r.getLong(1) === baseDens(r.getLong(0) % partBase),
          s"per-part density drifted for replicated part ${r.getLong(0)}")
      }
  }
}
