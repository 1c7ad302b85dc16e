package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-DSL text primitives shared by the C/E/F families. Everything
  * here is a composition of codegen'd built-ins (regexp, array, hash
  * functions) — per-row, embarrassingly parallel, no UDFs — and every
  * construct has an exact DuckDB equivalent so oracle SQL can replay it
  * verbatim (SURVEY.md §4).
  */
object TextFunctions {

  /** The reference's message-cleaning pipeline, in its exact order
    * (reference: src/core/database/processor.py:153
    * `clean_text_content` — collapse whitespace, strip URLs, strip
    * emoji/special chars keeping word chars + basic punctuation, trim).
    */
  def cleanText(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, "\\s+", " "),
          "https?://\\S+", ""),
        "[^\\w\\s.,!?;:\\-'\"]", ""))

  /** Lowercased whitespace tokens. `trim` first so Spark's
    * trailing-empty-preserving split and DuckDB's string_split_regex
    * agree on the token list. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word 3-gram shingles (the unit of E-family similarity).
    * The oracle uses DuckDB's 1-based lists with a stop-exclusive
    * range — same set.
    *
    * Composed from three `slice`s zipped together — every reference
    * to `ws` sits at ARGUMENT level, so the (often inlined,
    * interpreted-HOF) token-split expression evaluates a constant
    * number of times per ROW. The previous index-transform shape
    * referenced `ws` inside the lambda body, where it re-evaluated
    * per ELEMENT — ~3 regex splits of the full text per shingle,
    * which made every shingle consumer O(words × textlen) per doc
    * (measured ~2 ms/doc, 100× this composition). */
  def shingles3(ws: Column): Column = {
    val n = size(ws)
    when(n >= 3,
      array_distinct(zip_with(
        slice(ws, lit(1), n - 2),
        zip_with(slice(ws, lit(2), n - 2), slice(ws, lit(3), n - 2),
          (b, c) => concat_ws(" ", b, c)),
        (a, bc) => concat_ws(" ", a, bc))))
      .otherwise(array().cast("array<string>"))
  }

  /** All adjacent word pairs as (w1, w2) structs, one per OCCURRENCE
    * (collocation counting needs multiplicity, unlike shingles3's
    * distinct set). Same argument-level slice+zip_with composition as
    * shingles3 — a HOF lambda must never capture the token-split
    * expression, or it re-evaluates per element. */
  def bigramPairs(ws: Column): Column = {
    val n = size(ws)
    when(n >= 2,
      zip_with(slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
  }

  /** How many tokens fall in a fixed stopword profile. */
  def stopwordCount(ws: Column, stops: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(stops))).cast(LongType)

  /** The reference's message-content text extraction (reference:
    * src/core/database/processor.py:117 `extract_text_from_content`):
    * JSON parsing is attempted ONLY for text messages
    * (`message_type == 1`, processor.py:133) — a type-1 JSON object
    * with a `text` field yields that field, a type-1 JSON array of
    * such objects yields their texts joined by spaces (non-text
    * elements skipped), and everything else — parse failures, text-less
    * dicts, and ALL non-type-1 messages even when their content looks
    * like JSON — returns content as-is. Null-safe: null/empty content
    * yields "". */
  def extractText(content: Column, messageType: Column): Column = {
    val objText = get_json_object(content, "$.text")
    val arr = from_json(content,
      org.apache.spark.sql.types.DataType.fromDDL("array<struct<text:string>>"))
    val arrJoined = concat_ws(" ",
      transform(filter(arr, x => x.getField("text").isNotNull),
        x => x.getField("text")))
    // from_json(PERMISSIVE) wraps a lone object into a 1-element array,
    // so the list branch must also check the content is really a list;
    // strip ALL JSON whitespace (default ltrim strips only spaces, and
    // the two-parameter ltrim signature is deprecated in Spark 4)
    val isList =
      substring(regexp_replace(content, "^[ \\t\\n\\r]+", ""), 1, 1) === "["
    coalesce(
      // null-safe gate: a NULL type is "not a text message" (the
      // reference's `message_type == 1` is False for None) — without
      // isNull the three-valued `=!=` would skip this branch and
      // wrongly JSON-parse null-typed messages
      when(messageType.isNull || messageType =!= 1, content)
        .when(objText.isNotNull, objText)
        .when(arr.isNotNull && isList, arrJoined)
        .otherwise(content),
      lit(""))
  }
}
