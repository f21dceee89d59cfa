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
    * form — the input MinHash/SimHash shingling should see. Control
    * characters become SPACES (not deletions) before the collapse:
    * deleting a newline would fuse the words around it and corrupt
    * every shingle spanning the join point. */
  def canonical(c: Column): Column =
    collapseWhitespace(stripPunct(lower(
      regexp_replace(c, "[\\x00-\\x1f\\x7f]", " "))))

  /** Unicode canonical composition (NFC): visually identical strings
    * with different codepoint sequences (combining accents,
    * decomposed Hangul) collapse to one form — run BEFORE hashing or
    * shingling, or near-dups hash apart. Codegen JDK normalizer, see
    * [[graft.functions.TextExpressions.UnicodeNormalize]]; NFKC/NFD/
    * NFKD via the `form` parameter. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    graft.functions.TextExpressions.unicode_normalize(c, form)

  /** Truncate to at most `n` characters without splitting a word:
    * keep the window whole when it ends exactly on a word boundary,
    * otherwise cut at the last space inside it (or hard-cut a single
    * overlong token). Output carries no trailing whitespace. */
  def truncateAtWord(c: Column, n: Int): Column = {
    val window = substring(c, 1, n)
    val nextCh = substring(c, n + 1, 1)
    val lastSpace = length(window) - locate(" ", reverse(window)) + 1
    when(length(c) <= n, c)
      .when(nextCh === " ", rtrim(window))          // boundary exactly at n
      .when(locate(" ", window) === 0, window)      // single overlong token
      .otherwise(rtrim(substring(window, lit(1), lastSpace - 1)))
  }
}
