package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, L2Norm}

/** SQL surface for the custom Catalyst expressions: `cosine_sim`,
  * `dot_product`, `l2_norm` become plain SQL functions, so
  * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")`
  * works the same as the DataFrame DSL (the reference exposes its
  * search through a query string API, server.py:60 — this is the
  * equivalent extension point).
  *
  * Two registration paths:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster
  *    deployment — applies to every session built with the conf)
  *  - dynamic: `GraftFunctions.register(spark)` on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach(ext.injectFunction)
}

object GraftFunctions {

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      es => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      es => DotProduct(es(0), es(1))),
    (FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      es => L2Norm(es.head)))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, info, builder) =>
      GraftColumnBridge.registerFunction(spark, id, info, builder)
    }
}
