package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.sources.Tables

class GraftExtensionsSpec extends SparkTestBase {

  test("registered SQL functions evaluate: self-cosine is 1, norms positive") {
    GraftFunctions.register(spark)
    Tables(spark, sfDir).embeddings.createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT vec_id,
        |  ROUND(cosine_sim(embedding, embedding), 6) AS self_cos,
        |  l2_norm(embedding) AS nrm,
        |  ROUND(dot_product(embedding, embedding) - l2_norm(embedding) * l2_norm(embedding), 6) AS diff
        |FROM emb LIMIT 100""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) === 1.0)
      assert(r.getDouble(2) > 0.0)
      assert(math.abs(r.getDouble(3)) < 1e-6)
    }
  }

  test("extensions class injects the same definitions without error") {
    // config path: spark.sql.extensions=graft.GraftExtensions at session
    // build; here we only exercise the injection wiring
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
