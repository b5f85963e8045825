package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction — the jusText-class pre-dedup stage of a
  * CommonCrawl-style pipeline (Pomikálek 2011: classify block elements by
  * link density and content length, keep the content blocks, drop
  * nav/chrome). Everything downstream in this engine (lang-id t04,
  * quality t16/t40, every dedup tier) assumes clean text; this operator
  * produces it from raw HTML as a NARROW MAP over codegen'd builtins
  * (regexp_extract_all + higher-order array functions — no UDF, no
  * shuffle, linear at 100 TB).
  *
  * Block model: a page is a flat sequence of block elements
  * (nav/div/p/aside/footer) whose content is inline-only (anchors +
  * text) — the shape a tag-soup normalizer emits. Per block:
  *
  *   total = chars of tag-stripped, entity-unescaped text
  *   link  = total minus the same after deleting <a>...</a> runs
  *   keep  ⇔ 3·link ≤ total AND total ≥ MinChars
  *
  * The density threshold is the classic jusText ⅓, applied in INTEGER
  * arithmetic (3·link ≤ total) so the engine and the DuckDB oracle can
  * never disagree on a float boundary. Stopword density is measured and
  * reported (it feeds t16/t40-style gates) but is NOT a keep rule here:
  * this corpus has documents with zero stopwords, and a stopword gate
  * would drop real content (jusText itself only demotes such blocks to
  * "short/near-good" in context).
  */
object HtmlExtract {

  /** Minimum kept-block text length (jusText's length-low boundary). */
  val MinChars = 25

  // ---- planted page chrome (shared with the t49 oracle verbatim — the
  // ---- constants are interpolated into both sides, the MixBudget
  // ---- pattern, so the synthesis can never desync) ----
  val Nav: String =
    "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
      "<a href=\"/contact\">Contact</a></nav>"
  val Teaser: String = "<p>Read more.</p>"
  val Aside: String =
    "<aside>Related: <a href=\"/d/1\">first doc</a> " +
      "<a href=\"/d/2\">second doc</a> <a href=\"/d/3\">third doc</a></aside>"
  val Footer: String =
    "<footer><a href=\"/terms\">Terms</a> " +
      "<a href=\"/privacy\">Privacy</a></footer>"

  /** Entity-escape text content the way a well-formed emitter would. */
  def escapeHtml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** Inverse of [[escapeHtml]] — &amp; LAST so it can't re-introduce
    * entities ("&amp;lt;" must decode to "&lt;" text, not "<"). */
  def unescapeHtml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&lt;", "<"), "&gt;", ">"), "&amp;", "&")

  /** Synthesize the HTML-wrapped twin of a corpus document: real text in
    * a content block plus a byline (mixed text/links — the density rule's
    * hard case), a short teaser (length rule), an entity-bearing notes
    * block that must be KEPT (escape round-trip under test), and pure
    * chrome (nav/aside/footer). Every rule has a block that only IT
    * drops: teaser (length), aside (density — it passes length). */
  def wrap(docId: Column, source: Column, text: Column): Column =
    concat(
      lit("<html><body>" + Nav + "<div>Posted in <a href=\"/s/"),
      // source is entity-escaped like text: a raw '<'/'>'/'&' here would
      // break the flat well-formed-page model the extractor (and the
      // oracle, which mirrors this synthesis) assumes — shifting block
      // boundaries identically on both sides, so the gate could not
      // flag the corruption
      escapeHtml(source), lit("\">"), escapeHtml(source),
      lit("</a> by <a href=\"/u/"), docId.cast("string"),
      lit("\">user"), docId.cast("string"), lit("</a></div><p>"),
      escapeHtml(text),
      lit("</p>" + Teaser + "<p>Notes &amp; errata for document "),
      docId.cast("string"),
      lit(" &lt;rev 2&gt;</p>" + Aside + Footer + "</body></html>"))

  /** The clean text [[extract]] must reproduce from [[wrap]]'s page:
    * original document text plus the kept notes block. */
  def expectedClean(docId: Column, text: Column): Column =
    concat(text, lit("\nNotes & errata for document "),
      docId.cast("string"), lit(" <rev 2>"))

  /** Top-level block contents of a flat page (inline-only interiors).
    * No regex backreference — RE2 (the oracle dialect) has none; in a
    * well-formed flat sequence the first block-level close after an open
    * IS the matching one. */
  def blocks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?s)<(?:nav|div|p|aside|footer)>(.*?)</(?:nav|div|p|aside|footer)>"),
      lit(1))

  /** Tag-stripped, entity-unescaped text of one block. */
  def blockText(b: Column): Column =
    unescapeHtml(regexp_replace(b, "(?s)<[^>]*>", ""))

  /** Block content with its anchor runs (tags AND anchor text) deleted —
    * the complement that prices link density. */
  private def delinked(b: Column): Column =
    regexp_replace(b, "(?s)<a [^>]*>.*?</a>", "")

  /** jusText keep rule, integer arithmetic only: 3·link ≤ total chars
    * and total ≥ minChars. */
  def keepBlock(b: Column, minChars: Int = MinChars): Column = {
    val total = length(blockText(b))
    val link = total - length(blockText(delinked(b)))
    (link * lit(3) <= total) && (total >= lit(minChars))
  }

  /** Kept blocks of an already-parsed block array (callers that also
    * report counts should parse [[blocks]] ONCE and reuse the array —
    * lambda array functions are not free to duplicate). */
  def keptBlocks(blks: Column, minChars: Int = MinChars): Column =
    filter(blks, b => keepBlock(b, minChars))

  /** Kept blocks' text joined with newlines — the extracted document. */
  def extractFromBlocks(kept: Column): Column =
    array_join(transform(kept, b => blockText(b)), "\n")

  def extract(html: Column, minChars: Int = MinChars): Column =
    extractFromBlocks(keptBlocks(blocks(html), minChars))
}
