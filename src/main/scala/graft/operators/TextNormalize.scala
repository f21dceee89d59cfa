package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Visible text out of HTML/XML markup — the raw-crawl → corpus
    * extraction step every web-scale pipeline runs first. Drops
    * script/style payloads and comments wholesale (their content is
    * code, not prose), turns every remaining tag into a SPACE (a tag
    * is a word boundary: `<p>a</p><p>b</p>` must not fuse "ab"),
    * decodes the six ubiquitous character entities (`&amp;` LAST, so
    * `&amp;lt;` decodes to the literal "&lt;" exactly once — the
    * HTML5 double-escape rule), then collapses whitespace.
    *
    * Deliberately regex-composable (no backreferences, no
    * lookaround): the whole chain is native `regexp_replace`/
    * `replace` — whole-stage codegen on the Spark side, and exactly
    * replayable in any RE2-class SQL engine, which is what the
    * `html1` oracle does. Not a browser: CDATA, conditional
    * comments, and numeric entities beyond the named six pass
    * through as-is (document-level noise the quality gate
    * downstream prices anyway). Row-local, shuffle-free. */
  def extractText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (from, to)) =>
        replace(col0, lit(from), lit(to)) }
    collapseWhitespace(ent)
  }

  /** Outlink extraction from raw HTML — the web-graph half of the
    * crawl-extraction step ([[extractText]] is the text half): every
    * `href` target in document order with its 1-based position and a
    * kind tag (absolute / protocol-relative / fragment / relative)
    * the URL frontier routes on. Same contract as extractText:
    * regex-composable (RE2-class, no lookaround) so the whole thing
    * is ONE codegen `regexp_extract_all` + a row-local classify —
    * shuffle-free, and exactly replayable in SQL. Quote handling is
    * the pragmatic crawl rule: double- or single-quoted values,
    * mismatched quotes truncate at the first closing quote of either
    * kind. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val urls = regexp_extract_all(col(htmlCol),
      lit("(?i)href\\s*=\\s*[\"']([^\"']*)[\"']"), lit(1))
    val url = col("url")
    val kind = when(lower(url).startsWith("http://") ||
        lower(url).startsWith("https://"), "absolute")
      .when(url.startsWith("//"), "protocol-relative")
      .when(url.startsWith("#"), "fragment")
      .otherwise("relative")
    df.select(col(idCol).as("doc"), posexplode(urls).as(Seq("__p", "url")))
      .select(col("doc"), (col("__p") + 1).cast("long").as("link_pos"),
        url, kind.as("kind"))
  }

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
