package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.StreamingPacker

class StreamingPackerSpec extends SparkTestBase {
  import spark.implicits._

  private val re =
    java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")
  private def ntOf(text: String): Long = {
    val m = re.matcher(text); var n = 0L; while (m.find()) n += 1; n
  }

  test("closed sequences reproduce the batch bins exactly on ordered input") {
    // one sorted file => one micro-batch in doc_id order => the
    // streaming accumulator must equal the batch concat-and-chunk rule
    val rnd = new scala.util.Random(7)
    val docs = (0L until 300L).map { i =>
      (s"s${i % 2}", i, Seq.fill(200 + rnd.nextInt(400))("w").mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_spack_").toString
    docs.toDF("source", "doc_id", "text")
      .repartition(1).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sink = StreamingPacker.runAvailableNow(
      spark, s"$dir/documents.parquet", "spack_sink")
    val got = spark.table(sink).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force closed bins from the same rule
    docs.groupBy(_._1).foreach { case (source, ds) =>
      val nts = ds.sortBy(_._2).map(d => ntOf(d._3))
      val starts = nts.scanLeft(0L)(_ + _).init
      val total = nts.sum
      val nClosed = total / StreamingPacker.seqLen
      val startedPerBin = starts.map(_ / StreamingPacker.seqLen)
        .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
      (0L until nClosed).foreach { b =>
        assert(got.get((source, b)).contains(startedPerBin.getOrElse(b, 0L)),
          s"$source seq $b docs_started")
      }
      assert(!got.contains((source, nClosed)),
        s"$source open partial sequence must not be emitted")
    }
  }

  test("closed-sequence counts match the batch audit on the sf corpus") {
    // order-independent invariants: total tokens fix the closed count
    // regardless of arrival order, and the batch n_seqs is the closed
    // count plus the open partial (if any)
    // testdata tables are single parquet FILES; the streaming source
    // needs a directory — stage the file into one
    val staged = java.nio.file.Files.createTempDirectory("graft_spack_sf_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      staged.resolve("part-00000.parquet"))
    val sink = StreamingPacker.runAvailableNow(
      spark, staged.toString, "spack_sf_sink")
    val closed = spark.table(sink).groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_docs_started")).as("ds"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = TextAnalysis.packSequences(Tables(spark, sfDir)).collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val (source, nDocs, total, nSeqs) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val nClosed = total / StreamingPacker.seqLen
      val (gotClosed, gotStarted) = closed.getOrElse(source, (0L, 0L))
      assert(gotClosed === nClosed, s"$source closed count")
      assert(nSeqs === nClosed +
        (if (total % StreamingPacker.seqLen != 0) 1L else 0L), s"$source n_seqs")
      // docs that started in a closed sequence <= all docs; equality
      // iff no doc starts in the open partial sequence
      assert(gotStarted <= nDocs, s"$source started bound")
    }
  }
}
