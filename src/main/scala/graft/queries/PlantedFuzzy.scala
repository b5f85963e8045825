package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Planted multibyte (CJK + accent + combining-mark) rows for the fuzzy
  * near-dup cells (t18/t20/t29) \u2014 the codepoint-semantics probe the
  * ASCII harness corpus cannot provide.
  *
  * Spark's `levenshtein` walks CODEPOINTS; DuckDB's `levenshtein` /
  * `jaro_winkler_similarity` walk BYTES (measured: lev('h\u00E9llo',
  * 'hello') = 2 in DuckDB \u2014 \u00E9 is two UTF-8 bytes \u2014 vs 1 in Spark;
  * CJK substitutions count 3). On the pure-ASCII corpus the two agree
  * byte-for-byte, which is why the caveat stayed latent. These rows make
  * it load-bearing: each designed pair has byte-distance \u2260
  * codepoint-distance (e.g. \u65E5 -> \u8A9E substitution: 1 codepoint,
  * 3 bytes; precomposed \u00E9 vs plain e: 1 vs 2; precomposed \u00E9 vs
  * decomposed e+U+0301: 2 codepoints, 3 bytes), so a byte-walking engine
  * implementation now produces different VALUES in the survivor rows and
  * the oracle hash catches it.
  *
  * The oracle bridge: the planted multibyte alphabet is closed (7 chars),
  * so the oracle SQL transcodes each one to a distinct single-byte char
  * ([[tcSql]] \u2014 a nested `replace` chain, identity on the ASCII corpus),
  * after which DuckDB's byte distance IS the codepoint distance.
  * Verified against an independent pure-python codepoint
  * Levenshtein/Jaro-Winkler on all 28 planted pairs before landing; the
  * in-suite pin is NonAsciiFuzzySpec. All planted chars are BMP, where
  * the native JaroWinkler's UTF-16 char walk == codepoints (supplementary
  * planes would split into surrogates \u2014 out of scope, documented).
  *
  * Ids live at 2_000_000+: disjoint from raw doc_ids (< ~5000 per
  * replica), the +1_000_000 perturbed ranges, and the ScaleUp replica
  * stride (1e9\u00B7r + those), at every shipped SF and scale factor.
  */
object PlantedFuzzy {

  /** Closed multibyte alphabet, transcoded to chr(1)..chr(7) in oracle
    * SQL. The corpus is ASCII with no control chars (verified at every
    * SF), so the target bytes are collision-free. */
  val alphabet: Seq[String] =
    Seq("\u65E5", "\u8A9E", "\u30C6", "\u30AD", "\u00E9", "\u0301", "\u672C")

  /** (doc_id, text). Pair design (codepoint-dist vs byte-dist):
    *  - 2000001/3000001: CJK substitution \u65E5 -> \u8A9E (1 vs 3)
    *  - 2000003/3000003: CJK insertion \u30AD (1 vs 3)
    *  - 2000005/3000005: precomposed \u00E9 -> e (1 vs 2)
    *  - 2000007/3000007: precomposed \u00E9 vs decomposed e+U+0301
    *    (2 vs 3); the caf\u00E9-family cross pairs also survive the
    *    lev <= 20 gate, widening the verified surface.
    *
    * Pair members differ by exactly +1_000_000, mirroring the perturbed-
    * copy convention, so `id % 1e6` folds each designed pair to ONE
    * residue and RecallProbe's 1-in-N slices keep designed pairs intact
    * (the r14 ADVICE finding: the old consecutive ids 2000001/2000002
    * straddled every slicing n > 1, so the probe silently never
    * exercised the multibyte pairs). The caf\u00E9-family CROSS pairs
    * (2000005 x 3000007 etc.) still straddle slices; the probe's
    * slice-x-slice restriction excludes them consistently on both sides,
    * and their full coverage lives in NonAsciiFuzzySpec + the dump-time
    * oracles. */
  val rows: Seq[(Long, String)] = Seq(
    (2000001L, "training corpus \u65E5\u672C tokens flow deep in the net"),
    (3000001L, "training corpus \u8A9E\u672C tokens flow deep in the net"),
    (2000003L, "stream \u30C6 segment alpha beta gamma delta epsilon"),
    (3000003L, "stream \u30C6\u30AD segment alpha beta gamma delta epsilon"),
    (2000005L, "caf\u00E9 corpus quality filter rank beta gamma delta"),
    (3000005L, "cafe corpus quality filter rank beta gamma delta"),
    (2000007L, "caf\u00E9 corpus quality filter rank beta gamma theta"),
    (3000007L, "cafe\u0301 corpus quality filter rank beta gamma theta"))

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** `(id, 'text'), ...` VALUES body for the oracle SQL (single quotes
    * SQL-escaped by doubling, so a future planted apostrophe cannot
    * silently corrupt the t18/t20/t29 oracles; the multibyte chars ride
    * the JSON dump as UTF-8). */
  def sqlValues: String =
    rows.map { case (id, t) =>
      s"($id, '${t.replace("'", "''")}')"
    }.mkString(",\n  ")

  /** Wrap a DuckDB text expression in the codepoint transcode: each
    * planted multibyte char becomes one distinct low byte, identity on
    * ASCII. Apply to BOTH arguments of levenshtein /
    * jaro_winkler_similarity wherever planted rows can reach. */
  def tcSql(expr: String): String =
    alphabet.zipWithIndex.foldLeft(expr) { case (e, (ch, i)) =>
      s"replace($e, '$ch', chr(${i + 1}))"
    }
}
