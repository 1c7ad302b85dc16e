package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Duplicate-cluster resolution: dedup emits PAIRS, but the pipeline
  * action ("keep one canonical doc per duplicate group") needs the
  * transitive closure — connected components over the pair graph.
  * The classic production example: A≈B and B≈C but A's similarity to
  * C is just under threshold; all three are one cluster and exactly
  * one survives.
  */
object Clusters {

  /** Min-label propagation connected components over an undirected
    * pair graph. Iterative: every node starts labeled with its own
    * id; each round every node takes the minimum label among itself
    * and its neighbors; fixpoint = every node carries its component's
    * minimum id. Each round is one equi-join + one min-aggregate —
    * both shuffle on the node key, fully distributed — and the loop
    * runs at most DIAMETER rounds (near-dup clusters are shallow:
    * quasi-cliques of a few docs, so 2-3 rounds in practice). The
    * driver only sequences rounds and runs the convergence check —
    * index-metadata-scale coordination, the same role it plays in any
    * iterative Spark algorithm. Each round's labels are EAGERLY
    * checkpointed: iterative self-referencing lineage otherwise grows
    * exponentially, and lazy materialization races its consumers (see
    * Dedup's scaladoc). At web scale the same join shape with the
    * large-star/small-star rewrite converges in O(log n) rounds —
    * the round structure here is that algorithm's building block. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("s"), col(bCol).as("d"))
      .unionByName(pairs.select(col(bCol).as("s"), col(aCol).as("d")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("s").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbr = edges.join(labels, col("s") === col("node"))
        .select(col("d").as("node"), col("label"))
      val next = labels.unionByName(nbr)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      done = next
        .join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old"))
        .isEmpty
      labels = next
      iter += 1
    }
    require(done, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** E6 — `q_dedup_clusters`: duplicate clusters over the MinHash
    * near-dup pairs; each doc in any pair maps to its cluster's
    * minimum doc_id (the canonical survivor). The oracle replays the
    * same closure with a recursive CTE over the identical pair SQL. */
  def dedupClusters(t: Tables): DataFrame =
    connectedComponents(Dedup.dedupMinhash(t), "doc_a", "doc_b")
      .select(col("node").cast(LongType).as("doc_id"),
        col("label").cast(LongType).as("cluster_id"))
      .orderBy(col("doc_id"))
}
