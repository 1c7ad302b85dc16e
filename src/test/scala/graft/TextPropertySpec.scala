package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.TextFunctions
import graft.operators.EventOps

/** Property-based invariants for the per-row text primitives —
  * ScalaCheck-generated adversarial inputs (unicode, control chars,
  * JSON-ish fragments, emptiness) rather than hand-picked cases. Each
  * property batches its generated inputs through ONE Spark job. */
class TextPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('a', ' ', '\n', '\t', '.', '!', 'é', '✨',
      '{', '}', '[', ']', '"', ':', '/', '@')).map(_.mkString),
    Gen.const(""),
    Gen.alphaNumStr.map(s => s"""{"text": "$s"}"""),
    Gen.alphaNumStr.map(s => s"""[{"text": "$s"}]"""))

  private def collectBatch(inputs: Seq[String], c: org.apache.spark.sql.Column)
      : Seq[String] =
    inputs.toDF("s").select(c.cast("string")).as[String].collect().toSeq

  test("cleanText: total, trimmed, restricted alphabet on adversarial input") {
    // NOTE deliberately NOT asserted: idempotence. The reference
    // collapses whitespace BEFORE stripping URLs/special chars
    // (processor.py:167-176), so a strip can reintroduce a double
    // space ("a ✨ b" → "a  b") that a second pass would collapse —
    // cleanText reproduces that order faithfully (this property suite
    // discovered the non-idempotence; it is reference behavior).
    val inputs = Gen.listOfN(200, anyText).sample.get
    val once = collectBatch(inputs, TextFunctions.cleanText(col("s")))
    assert(once.length === inputs.length)
    once.foreach { s =>
      assert(s != null)
      assert(s === s.trim, s"not trimmed: '$s'")
      // the cleaned alphabet: word chars, space, basic punctuation only
      assert(s.matches("""[\w \.,!\?;:\-'"]*"""), s"'$s'")
    }
  }

  test("extractText is total (never null) for any content and type") {
    val inputs = Gen.listOfN(200, anyText).sample.get
    Seq(1, 2).foreach { mt =>
      val out = inputs.toDF("s")
        .select(TextFunctions.extractText(col("s"), lit(mt)))
        .as[String].collect()
      assert(out.length === inputs.length)
      out.foreach(s => assert(s != null))
    }
  }

  test("isFileName is total and deterministic on adversarial names") {
    val inputs = Gen.listOfN(200, anyText).sample.get
    val a = collectBatch(inputs, EventOps.isFileName(col("s")))
    val b = collectBatch(inputs, EventOps.isFileName(col("s")))
    assert(a === b)
    a.foreach(v => assert(v == "true" || v == "false"))
    // the documented invariant: anything under 2 chars after trim is junk
    inputs.zip(a).foreach { case (in, v) =>
      if (in.trim.length < 2) assert(v === "true", s"short name kept: '$in'")
    }
  }

  test("shingles3 equals the brute-force sliding window on adversarial text " +
    "(pins the slice+zip_with composition to the family definition)") {
    val inputs = Gen.listOfN(300, anyText).sample.get
    val got = inputs.toDF("s")
      .select(TextFunctions.shingles3(TextFunctions.words(col("s"))))
      .as[Seq[String]].collect().toSeq
    val expected = inputs.map { s =>
      // Spark semantics exactly: lower, SPACE-only trim (Spark's
      // trim() strips 0x20, not \n\t), split keeping empty tokens
      // (Spark split's default limit is -1)
      val t = s.toLowerCase.dropWhile(_ == ' ')
        .reverse.dropWhile(_ == ' ').reverse
      val ws = t.split("\\s+", -1).toSeq
      if (ws.length < 3) Seq.empty[String]
      else ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    assert(got === expected)
  }

  test("conversationType is a 2-valued total function keyed only on the prefix") {
    val sids = Gen.listOfN(200, Gen.oneOf(
      Gen.alphaNumStr, Gen.alphaNumStr.map("group-" + _),
      Gen.alphaNumStr.map("buddy-" + _), Gen.const(""))).sample.get
    val out = collectBatch(sids, EventOps.conversationType(col("s")))
    sids.zip(out).foreach { case (sid, ct) =>
      assert(ct === (if (sid.startsWith("group-")) "group" else "private"))
    }
  }
}
