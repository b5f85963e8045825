package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t21/t22/t23 behavior on planted data: decontamination must drop
  * exactly the corpus docs sharing a 20-char gram with the eval slice,
  * the per-source quota must keep a deterministic,
  * partitioning-independent subset, and the unigram-LM score must rank
  * corpus-unique tokens above corpus-common ones. (Value-exactness vs
  * DuckDB is the oracle gate's job; these pin the SEMANTICS on corpora
  * where the expected outcome is known by construction.) */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val evalText = "the secret benchmark passage nobody may train on today"

  test("decontaminate drops exactly the planted overlaps") {
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    // doc 0: eval (0 % 97 == 0). docs 1-2: contaminated (embed a >=20-char
    // span of the eval text). docs 3-4: clean.
    Seq(
      (0L, evalText, "en", "src0", 1L),
      (1L, s"prefix $evalText suffix", "en", "src1", 1L),
      (2L, "xx " + evalText.substring(4, 30) + " yy", "en", "src1", 1L),
      (3L, "a completely unrelated document with plenty of words", "en", "src2", 1L),
      (4L, "another clean text that shares nothing long enough", "en", "src2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = TextQueries.decontaminate(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L),
      s"expected only the clean docs to survive, got $kept")
  }

  test("source quota keeps <=10 per source, deterministically") {
    val out = TextQueries.sourceQuota(spark, sf)
      .as[(String, Int, Long)].collect()
    val bySource = out.groupBy(_._1)
    assert(bySource.values.forall(_.length <= 10))
    // ranks are 1..n contiguous per source
    bySource.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    // partitioning-independent: 1 shuffle partition == default
    val p1 = spark.newSession()
    p1.conf.set("spark.sql.shuffle.partitions", "1")
    val again = TextQueries.sourceQuota(p1, sf)
      .as[(String, Int, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq,
      "quota selection depends on partitioning")
  }

  test("decontaminate plan: eval grams broadcast; corpus anti-join keyed") {
    val s = TextQueries.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"),
      s"eval gram probe must broadcast:\n$s")
    // the contaminated-id set broadcasts into a LeftAnti — corpus rows
    // are filtered in place, never shuffled
    assert(s.contains("LeftAnti"), s"anti-join shape lost:\n$s")
    assert(!s.contains("CartesianProduct"))
    // output scan prunes text: the wide column feeds only the gram pass
    assert(s.contains("struct<doc_id:bigint,source:string,n_chars:bigint>"),
      s"output scan must not read text:\n$s")
  }

  test("bloom contamination == shuffled contamination, row for row") {
    // t31 is t30 behind a performance gate: might_contain passes every
    // true hit (no false negatives, by bloom construction) and the exact
    // verify join removes the false positives, so the outputs must be
    // bit-identical. A gate bug in either direction breaks this.
    val viaShuffle = TextQueries.contaminationScore(spark, sf)
      .as[(Long, String, Long, Int)].collect().sortBy(_._1).toSeq
    val viaBloom = TextQueries.bloomContamination(spark, sf)
      .as[(Long, String, Long, Int)].collect().sortBy(_._1).toSeq
    assert(viaShuffle.nonEmpty)
    assert(viaBloom == viaShuffle, "bloom route diverged from exact route")
  }

  test("saturated 64-bit sketch still yields exact output (FP removal)") {
    // With 64 bits the filter saturates and might_contain passes
    // essentially every gram — the gate degenerates to a no-op and the
    // verify join sees ALL pairs as candidates. The output must STILL
    // equal the exact route: this is the only value-level witness for
    // the FP-removal join, because the honest 2^20 sketch produces zero
    // false positives at harness SF (measured; a dropped-verify mutant
    // survives the sf0.01 oracle but dies here and on the plan pin).
    val exact = TextQueries.contaminationScore(spark, sf)
      .as[(Long, String, Long, Int)].collect().sortBy(_._1).toSeq
    val saturated = TextQueries.bloomContaminationSized(spark, sf, numBits = 64)
      .as[(Long, String, Long, Int)].collect().sortBy(_._1).toSeq
    assert(saturated == exact,
      "a saturated gate must be semantics-neutral — FP removal is broken")
  }

  test("bloom contamination flags the planted overlaps with exact counts") {
    val dir = java.nio.file.Files.createTempDirectory("bloomc").toString
    // doc 0: eval. doc 1 embeds the whole eval text (many shared grams —
    // n_hit_grams over threshold). doc 2 shares a 21-char span = exactly
    // 2 distinct 20-grams, UNDER the >=3 threshold. docs 3: clean.
    Seq(
      (0L, evalText, "en", "src0", 1L),
      (1L, s"prefix $evalText suffix", "en", "src1", 1L),
      // no space padding: a space next to the span would re-align with
      // evalText's own spaces and add a third straddle-gram hit
      (2L, "xx" + evalText.substring(4, 25) + "yy", "en", "src1", 1L),
      (3L, "a completely unrelated document with plenty of words", "en", "src2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.bloomContamination(spark, dir)
      .select("doc_id", "n_hit_grams", "keep_flag")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"corpus is docs 1-3: $out")
    assert(out(1L)._1 >= 3 && out(1L)._2 == 0, s"doc 1 must be flagged: $out")
    assert(out(2L) == ((2L, 1)), s"doc 2 is 2 grams under threshold: $out")
    assert(out(3L) == ((0L, 1)), s"doc 3 is clean: $out")
  }

  test("bloom incremental dedup == exact incremental dedup, row for row") {
    // t32 gates the corpus key index with a batch-side sketch; no false
    // negatives means no corpus key that matches a batch key is ever
    // rejected, so the anti-join verdicts must be identical to t17's.
    val exact = TextQueries.incrementalDedup(spark, sf)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val gated = TextQueries.bloomIncrementalDedup(spark, sf)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(exact.nonEmpty)
    assert(gated == exact, "bloom route diverged from exact route")
  }

  test("saturated 64-bit sketch: incremental dedup still exact") {
    // Saturation admits EVERY corpus key to the anti-join (all false
    // positives) — output must still match, which is only true if the
    // verdict comes from exact key equality, never from the gate. Kills
    // the treat-bloom-as-membership mutant the honest sketch cannot
    // (zero FPs at harness SF, as t31).
    val exact = TextQueries.incrementalDedup(spark, sf)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val saturated = TextQueries
      .bloomIncrementalDedupSized(spark, sf, numBits = 64)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(saturated == exact,
      "a saturated gate must be semantics-neutral on the anti-join")
  }

  test("unigram nll: repeated tokens score lower than rare ones") {
    // the whole point of the LM filter: a doc made of corpus-common
    // tokens has low mean -ln(p); a doc of corpus-unique tokens high
    val dir = java.nio.file.Files.createTempDirectory("nll").toString
    val common = "alpha beta gamma alpha beta gamma alpha beta gamma"
    Seq(
      (1L, common, "en", "s", 1L), (2L, common, "en", "s", 1L),
      (3L, common, "en", "s", 1L),
      (4L, "zq xv jk wm yb pf dg hn lt rc", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nll = TextQueries.unigramLogprob(spark, dir)
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(nll(1L) == nll(2L) && nll(2L) == nll(3L),
      "identical docs must score identically")
    assert(nll(4L) > nll(1L),
      s"unique-token doc must score higher: ${nll(4L)} vs ${nll(1L)}")
  }

  test("source quota plan: partial WindowGroupLimit before the shuffle") {
    // Spark's rank-limit pushdown means a pathologically hot source
    // ships at most ~10 rows per map partition, not its whole partition —
    // the property that makes the quota skew-safe; pin it so a rewrite
    // (e.g. rank via join or a non-limit window) can't silently lose it
    val s = TextQueries.sourceQuota(spark, sf)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(s).size >= 2,
      s"expected Partial+Final WindowGroupLimit:\n$s")
    assert("Exchange hashpartitioning\\(source".r.findAllIn(s).size == 1,
      s"expected exactly one shuffle, on source:\n$s")
  }
}
