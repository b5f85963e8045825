package graft.queries

import graft.SparkSpec

/** t25/t26 behavior on planted data: span-dedup must count exactly the
  * duplicated window occurrences (cross-doc AND intra-doc) and flag on
  * the 0.5 fraction, and the token-budget mix must admit exactly the
  * docs that START below the budget — including the straddler and
  * excluding the doc that starts exactly AT the budget. (Value-exactness
  * vs DuckDB is the oracle gate's job; these pin the semantics where the
  * expected outcome is known by construction.) */
class SpanMixSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("spanmix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("span dedup counts planted duplicated windows, intra and cross") {
    // W = 4. doc0/doc1 share exactly one 4-token window
    // ("alpha beta gamma delta"); doc2 is all-distinct; doc3 has < 4
    // tokens (zero windows, must still appear, kept); doc4 is one token
    // repeated — every window identical, intra-doc duplication alone
    // must flag it.
    val dir = docsDir(Seq(
      (0L, "alpha beta gamma delta eps", "en", "s", 1L),
      (1L, "zz alpha beta gamma delta yy", "en", "s", 1L),
      (2L, "one two three four five six", "en", "s", 1L),
      (3L, "a b c", "en", "s", 1L),
      (4L, "rep rep rep rep rep rep rep rep", "en", "s", 1L)))
    val out = TextQueries.spanDedup(spark, dir)
      .select("doc_id", "n_windows", "n_dup_windows", "keep_flag")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2L, 1L, 0)),
      s"doc0: 2 windows, 1 shared, frac 0.5 -> drop; got ${out(0L)}")
    assert(out(1L) == ((1L, 3L, 1L, 1)),
      s"doc1: 3 windows, 1 shared, frac 1/3 -> keep; got ${out(1L)}")
    assert(out(2L) == ((2L, 3L, 0L, 1)),
      s"doc2: all windows unique -> keep; got ${out(2L)}")
    assert(out(3L) == ((3L, 0L, 0L, 1)),
      s"doc3: zero windows -> frac 0, keep; got ${out(3L)}")
    assert(out(4L) == ((4L, 5L, 5L, 0)),
      s"doc4: one repeated window, all 5 occurrences dup -> drop; got ${out(4L)}")
  }

  test("spanLayout parameterizes W: counts move exactly with the window algebra") {
    // Same planted corpus as above, W = 2: doc0 "alpha beta gamma delta
    // eps" has 4 bigram windows of which 3 ("alpha beta", "beta gamma",
    // "gamma delta") also appear in doc1's 5 windows; doc4's 7 identical
    // "rep rep" windows dup intra-doc. The W=4 counts (asserted in the
    // planted-windows test) and these W=2 counts pin that w is really
    // the knob, not a re-derivation of the same query.
    val dir = docsDir(Seq(
      (0L, "alpha beta gamma delta eps", "en", "s", 1L),
      (1L, "zz alpha beta gamma delta yy", "en", "s", 1L),
      (2L, "one two three four five six", "en", "s", 1L),
      (3L, "a b c", "en", "s", 1L),
      (4L, "rep rep rep rep rep rep rep rep", "en", "s", 1L)))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = TextQueries.spanLayout(docs, w = 2, dropFrac = 0.5)
      .select("doc_id", "n_windows", "n_dup_windows", "keep_flag")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 4L, 3L, 0)), s"doc0 W=2: got ${out(0L)}")
    assert(out(1L) == ((1L, 5L, 3L, 0)), s"doc1 W=2: got ${out(1L)}")
    assert(out(2L) == ((2L, 5L, 0L, 1)), s"doc2 W=2: got ${out(2L)}")
    assert(out(3L) == ((3L, 2L, 0L, 1)), s"doc3 W=2 has 2 bigrams now: got ${out(3L)}")
    assert(out(4L) == ((4L, 7L, 7L, 0)), s"doc4 W=2: got ${out(4L)}")
  }

  test("collapsed spanLayout == flat on a duplicate-heavy corpus (weighted globals)") {
    // the hot-axis shape: texts duplicated (with normalization variants),
    // plus the semantic the member-weighting MUST preserve — a window
    // occurring once per distinct text still counts as duplicated when
    // exact copies multiply it (cnt = occ·m), exactly as the flat sum
    // over member rows sees it. Includes a null text (sentinel-key
    // group: must survive expansion with zero counts, kept).
    val rows: Seq[(Long, String)] = (Seq(
      (0L, "alpha beta gamma delta eps"),
      (1L, "ALPHA BETA GAMMA DELTA EPS"),        // exact dup of 0 normalized
      (2L, "  alpha beta gamma delta eps "),     // exact dup of 0 normalized
      (3L, "one two three four five six seven"), // unique text...
      (4L, "one two three four five six seven"), // ...but duplicated ×2:
      // every window occurs once per copy -> cnt=2 -> ALL dup, dropped
      (5L, "totally unique words appearing nowhere else at all here"),
      (6L, "a b c"),
      (7L, null)))
    val docs = rows.toDF("doc_id", "text")
    assert(graft.dedup.Dedup.duplicationHeavy(docs, "text"),
      "planted corpus must route through the collapse")
    val got = TextQueries.spanLayout(docs, w = 4, dropFrac = 0.5)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val want = TextQueries.spanLayoutFlat(docs, w = 4, dropFrac = 0.5)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    assert(got == want, s"collapsed=${got.size} flat=${want.size}; " +
      s"onlyCollapsed=${(got -- want).take(5)} onlyFlat=${(want -- got).take(5)}")
    val byId = got.map(r => r._1 -> r).toMap
    // the weighting semantics, by construction: docs 3/4 (text ×2) have
    // every window at cnt=2 -> all dup -> dropped
    assert(byId(3L)._3 == byId(3L)._2 && byId(3L)._5 == 0, s"${byId(3L)}")
    assert(byId(4L) == byId(3L).copy(_1 = 4L))
    // unique text keeps; null text survives expansion with zero windows
    assert(byId(5L)._3 == 0L && byId(5L)._5 == 1)
    assert(byId(7L) == ((7L, 0L, 0L, 0.0, 1)), s"null doc: ${byId(7L)}")
    // the sf-gate corpus stays on the flat route (distinct texts)
    val gate = spark.read.parquet(s"$sf/documents.parquet")
    assert(!graft.dedup.Dedup.duplicationHeavy(gate, "text"))
  }

  test("span dedup avoids WindowExec: counts via agg + shuffle join") {
    // The global window count is deliberately an aggregate joined back,
    // not count(*) OVER (PARTITION BY w) — WindowExec would buffer an
    // entire boilerplate-hot window's occurrence list in one task.
    val s = TextQueries.spanDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s.contains("Window"), s"no window operator expected:\n$s")
  }

  test("span dedup is partitioning-independent") {
    val base = TextQueries.spanDedup(spark, sf)
      .as[(Long, Long, Long, Double, Int)].collect().sortBy(_._1).toSeq
    val p1 = spark.newSession()
    p1.conf.set("spark.sql.shuffle.partitions", "1")
    val again = TextQueries.spanDedup(p1, sf)
      .as[(Long, Long, Long, Double, Int)].collect().sortBy(_._1).toSeq
    assert(base == again, "span dedup depends on partitioning")
  }

  test("token budget mix admits exactly the docs starting below budget") {
    // Budget 700, single source. Mix order is (doc_id*48271) % 97:
    // srcA doc0(key 0) -> doc2(27) -> doc4(54) -> doc1(62) -> doc3(89);
    // srcB doc5(19) -> doc7(46) -> doc6(81).
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val dir = docsDir(Seq(
      (0L, words(350), "en", "srcA", 1L), // starts 0   -> keep
      (2L, words(400), "en", "srcA", 1L), // starts 350, ends 750: straddles -> keep
      (4L, words(50), "en", "srcA", 1L),  // starts 750 -> drop
      (1L, words(10), "en", "srcA", 1L),  // starts 800 -> drop
      (3L, words(10), "en", "srcA", 1L),  // starts 810 -> drop
      (5L, words(700), "en", "srcB", 1L), // starts 0, ends exactly 700 -> keep
      (7L, words(20), "en", "srcB", 1L),  // starts exactly AT budget -> drop
      (6L, words(20), "en", "srcB", 1L))) // starts 720 -> drop
    val out = TextQueries.tokenBudgetMix(spark, dir)
      .select("doc_id", "start_tok").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 2L -> 350L, 5L -> 0L),
      s"expected the two prefix docs + the straddler, got $out")
  }

  test("token budget mix is partitioning-independent") {
    val base = TextQueries.tokenBudgetMix(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val p1 = spark.newSession()
    p1.conf.set("spark.sql.shuffle.partitions", "1")
    val again = TextQueries.tokenBudgetMix(p1, sf)
      .as[(String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(base == again, "mix selection depends on partitioning")
  }
}
