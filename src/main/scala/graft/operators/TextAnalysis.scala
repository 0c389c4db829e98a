package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expressions for LLM-training-data pipelines:
  * tokenization, quality scoring, language ID, token counting.
  *
  * Everything is a Catalyst expression tree (codegen'd, no UDFs) with
  * a DuckDB-identical SQL rendering for the oracle. The reference's
  * text utilities (`deva/core/pipe.py:1429 extract`, `:1520 truncate`,
  * `deva/utils/simhash.py` tokenization) are per-string Python; here
  * they are columnar and run where the data lives.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  val tokensSql: String = "list_filter(str_split(text, ' '), t -> t <> '')"

  /** Word n-gram shingles over a token array (n fixed at call site).
    * Guarded for short docs: fewer than n tokens → empty array.
    */
  def shingles(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB rendering of [[shingles]]. `tkRef` must be a simple
    * column reference (define the token list in a CTE first).
    * range(a,b) is [a,b): i runs 1..len-(n-1); short docs → empty.
    */
  def shinglesSql(tkRef: String, n: Int): String = {
    val parts = (0 until n).map(o => s"$tkRef[i+$o]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($tkRef) - ${n - 2}), i -> $parts)"
  }

  /** Adjacent-element pairs of an array as array<struct<x,y>> —
    * zipped shifted slices, fully codegen'd. The equivalent
    * `transform(sequence(1, n-1), i -> struct(a[i], a[i+1]))` form
    * runs its lambda INTERPRETED per element (higher-order functions
    * don't codegen) — measured 7× slower on the sf0.1 corpus bigram
    * build — so every adjacent-pair explode goes through this shape.
    * Empty/1-element arrays yield an empty array (slice length is
    * clamped at 0).
    */
  def adjacentPairs(tk: Column): Column = {
    val n = greatest(size(tk) - 1, lit(0))
    arrays_zip(slice(tk, lit(1), n).as("x"), slice(tk, lit(2), n).as("y"))
  }

  /** Stopword hit count within a token array. */
  def stopCount(tk: Column, words: Seq[String]): Column =
    size(filter(tk, t => t.isin(words.map(lit): _*))).cast("long")

  def stopCountSql(tkExpr: String, words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter($tkExpr, t -> t IN ($list))) AS BIGINT)"
  }

  val stopEn: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")
  val stopEs: Seq[String] = Seq("el", "la", "de", "y", "es", "un", "en")
  val stopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "zu")

  // ---- PII scrubbing -------------------------------------------------
  // Regexes restricted to the syntax Java regex and RE2 (DuckDB)
  // interpret identically, so the oracle is bit-exact.

  /** Email addresses. */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (account/phone/ID-shaped; 6+ digits). Applied
    * AFTER email scrubbing so an address's digits never double-count.
    */
  val longNumRe: String = "[0-9]{6,}"

  /** Redact PII into typed placeholders — the pre-training scrub pass
    * every production corpus runs. Pure codegen'd expressions (no
    * UDF): Spark regexp_replace is global by default; the DuckDB
    * rendering passes the 'g' flag explicitly.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
      lit(longNumRe), lit("<NUM>"))

  def scrubPiiSql(ref: String): String =
    s"regexp_replace(regexp_replace($ref, '$emailRe', '<EMAIL>', 'g'), '$longNumRe', '<NUM>', 'g')"

  def countMatches(text: Column, re: String): Column =
    regexp_count(text, lit(re)).cast("long")

  def countMatchesSql(ref: String, re: String): String =
    s"CAST(len(regexp_extract_all($ref, '$re')) AS BIGINT)"
}
