package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization for dedup/tokenization pipelines
  * (beyond-parity): the standard pre-shingling canonicalization
  * chain, as composable codegen'd column functions.
  */
object TextNormalize {

  /** Collapse all whitespace runs to single spaces and trim. */
  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Strip punctuation (keep letters, digits, whitespace — Unicode
    * classes so CJK/accented text survives). */
  def stripPunct(c: Column): Column =
    regexp_replace(c, "[^\\p{L}\\p{N}\\s]", "")

  /** Remove ASCII control characters. */
  def stripControl(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x1f\\x7f]", "")

  /** Lowercased, punctuation-free, whitespace-collapsed canonical
    * form — the input MinHash/SimHash shingling should see. */
  def canonical(c: Column): Column =
    collapseWhitespace(stripPunct(lower(stripControl(c))))

  /** Truncate to at most `n` characters without splitting a word:
    * cut at the last space within the window (or hard-cut a single
    * overlong token). */
  def truncateAtWord(c: Column, n: Int): Column = {
    val window = substring(c, 1, n)
    val lastSpace = length(window) - locate(" ", reverse(window)) + 1
    when(length(c) <= n, c)
      .when(locate(" ", window) === 0, window)
      .otherwise(substring(window, lit(1), lastSpace - 1))
  }
}
