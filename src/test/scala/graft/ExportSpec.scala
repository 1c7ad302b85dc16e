package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import graft.sources.{Export, Tables}

class ExportSpec extends SparkTestBase {

  test("exportManifest: read-back manifest equals the pre-write frame's " +
    "facts (counts, token volume, xor checksum) — the round trip is exact") {
    val t = Tables(spark, sfDir)
    val pre = TextAnalysis.pipelineKeptDocs(t)
      .join(t.documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("split"), col("source"), col("doc_id"),
        size(TextFunctions.words(col("text"))).cast("long").as("toks"))
      .collect()
    assert(pre.nonEmpty, "pipeline kept nothing — fixture drifted")
    val expected = pre.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_.getLong(3)).sum,
          rs.map(_.getLong(2)).reduce(_ ^ _)))
      }
    val got = Export.exportManifest(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected)
  }
}
