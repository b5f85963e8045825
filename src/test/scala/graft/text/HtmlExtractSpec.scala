package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t49_html_extract — jusText-class boilerplate removal. The driver row
  * gates values against the DuckDB oracle; this spec pins the RULE
  * boundaries (integer density threshold, length-low), the entity
  * round-trip, and that the operator is a pure narrow map (no exchange).
  * Recorded kills (BASELINE.md r19): engine-side density 3→2 and
  * length 25→10 each flag exactly t49 via clean_match. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String): (Int, String) = {
    val r = Seq(html).toDF("html")
      .select(size(HtmlExtract.keptBlocks(HtmlExtract.blocks(col("html"))))
          .as("n"),
        HtmlExtract.extract(col("html")).as("out"))
      .head()
    (r.getInt(0), r.getString(1))
  }

  test("density boundary is integer-exact: 3*link == total keeps, " +
    "3*link == total+1 drops") {
    // text: 20 non-link chars + 10 link chars = 30 total, link*3 = 30 ✓
    val atBoundary =
      "<p>aaaaaaaaaaaaaaaaaaaa<a href=\"/x\">bbbbbbbbbb</a></p>"
    assert(extractOne(s"<html><body>$atBoundary</body></html>") ==
      ((1, "aaaaaaaaaaaaaaaaaaaa" + "bbbbbbbbbb")))
    // 19 non-link + 10 link = 29 total < 30 — one char over the line
    val overBoundary =
      "<p>aaaaaaaaaaaaaaaaaaa<a href=\"/x\">bbbbbbbbbb</a></p>"
    assert(extractOne(s"<html><body>$overBoundary</body></html>")._1 == 0)
  }

  test("length-low boundary: 25 chars keeps, 24 drops") {
    val keep25 = "<p>" + "x" * 25 + "</p>"
    val drop24 = "<p>" + "y" * 24 + "</p>"
    assert(extractOne(s"<html><body>$keep25$drop24</body></html>") ==
      ((1, "x" * 25)))
  }

  test("entity escape/unescape round-trips < > & in kept content, " +
    "&amp;lt; decodes to text not a tag") {
    val raw = "a < b & b > c, literally &lt;tag&gt; " + "pad" * 5
    val html = Seq((7L, "srcX", raw)).toDF("doc_id", "source", "text")
      .select(HtmlExtract.wrap(col("doc_id"), col("source"), col("text"))
        .as("h")).head().getString(0)
    // the wrapped page must carry no raw < > & inside the content block
    assert(!html.contains("a < b") && html.contains("a &lt; b"))
    assert(html.contains("&amp;lt;tag&amp;gt;"))
    val (n, out) = extractOne(html)
    assert(n == 2, s"content + notes blocks expected, got $n")
    assert(out.startsWith(raw), s"escape round-trip lost content: $out")
  }

  test("each chrome block is dropped by its own rule on the wrapped page") {
    val text = "real content words here that are long enough to keep " * 2
    val df = Seq((3L, "src3", text)).toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("text"),
        HtmlExtract.blocks(HtmlExtract.wrap(
          col("doc_id"), col("source"), col("text"))).as("blks"))
    val r = df.select(size(col("blks")).as("n_blocks"),
      size(HtmlExtract.keptBlocks(col("blks"))).as("n_kept"),
      HtmlExtract.extractFromBlocks(
        HtmlExtract.keptBlocks(col("blks"))).as("out"),
      HtmlExtract.expectedClean(col("doc_id"), col("text")).as("want"))
      .head()
    assert(r.getInt(0) == 7, "nav/div/p/teaser/notes/aside/footer = 7 blocks")
    assert(r.getInt(1) == 2, "only content + notes survive")
    assert(r.getString(2) == r.getString(3))
    // the aside passes the LENGTH rule — only density drops it; the
    // teaser passes DENSITY (no links) — only length drops it
    val blks = df.select(col("blks")).head().getSeq[String](0)
    val aside = blks.find(_.startsWith("Related:")).get
    val asideKept = Seq(aside).toDF("b")
      .select(HtmlExtract.keepBlock(col("b"), minChars = 0).as("k"),
        length(HtmlExtract.blockText(col("b"))).as("len")).head()
    assert(asideKept.getInt(1) >= HtmlExtract.MinChars,
      "aside must be long enough that only density can drop it")
    assert(!asideKept.getBoolean(0), "aside must fail the density rule")
    val teaser = blks.find(_ == "Read more.")
    assert(teaser.nonEmpty, "teaser block must parse")
  }

  test("markup-bearing source survives: the byline stays a flat block " +
    "and extraction still reconstructs the clean text") {
    // '</a><p>' raw in source would close the byline anchor early and
    // open a stray block — with source escaped on synthesis, the page
    // stays flat and well-formed and reconstruction is exact
    val text = "real content words here that are long enough to keep " * 2
    val r = Seq((9L, "x</a><p>junk & more", text))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("text"),
        HtmlExtract.blocks(HtmlExtract.wrap(
          col("doc_id"), col("source"), col("text"))).as("blks"))
      .select(size(col("blks")).as("n_blocks"),
        HtmlExtract.extractFromBlocks(
          HtmlExtract.keptBlocks(col("blks"))).as("out"),
        HtmlExtract.expectedClean(col("doc_id"), col("text")).as("want"))
      .head()
    assert(r.getInt(0) == 7, "hostile source must not shift block count")
    assert(r.getString(1) == r.getString(2),
      "hostile source corrupted extraction")
  }

  test("extraction over the corpus reconstructs every original " +
    "(clean_match) and plans as a pure narrow map — zero exchanges") {
    val out = graft.queries.TextQueries.htmlExtract(spark, sf)
    val plan = out.queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"t49 must be a narrow map; found shuffles:\n$plan")
    // the token array must be STAGED once, not inlined into the three
    // stop_density usages (lambda array ops are CodegenFallback; a
    // collapsed projection re-tokenizes every row 3x)
    val tokenizations = "split\\(lower\\(trim\\(".r
      .findAllIn(plan.toString).length
    assert(tokenizations == 1,
      s"extracted text tokenized $tokenizations times; must be staged once")
    val n = out.count()
    val clean = out.where(col("clean_match")).count()
    assert(n > 0 && clean == n, s"$clean/$n docs reconstructed cleanly")
  }
}
