package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkTestBase {
  lazy val t = Tables(spark, sfDir)

  test("multimodalMeta conserves docs and byte bounds are consistent") {
    val rows = Multimodal.multimodalMeta(t).collect()
    assert(rows.map(_.getLong(1)).sum === t.documents.count())
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5)) // min <= max
      assert(r.getLong(2) >= r.getLong(5)) // total >= max
      assert(r.getLong(3) >= 1L)
    }
  }

  test("stubDecode is deterministic and bounded like a real decoder") {
    val (w, h) = Multimodal.stubDecode(lit(1000L))
    val r = t.documents.limit(1).select(w.as("w"), h.as("h")).first()
    assert(r.getLong(0) === 1000L % 640 && r.getLong(1) === (1000L * 7) % 480)
  }

  test("binary payload round-trips: md5 of binary equals md5 of source text") {
    val n = t.documents
      .select(md5(col("text").cast("binary")).as("a"), md5(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n === 0)
  }
}
