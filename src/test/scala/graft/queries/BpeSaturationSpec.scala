package graft.queries

import graft.SparkSpec
import graft.functions.Bpe

/** The r17 BPE-knob raise (200/256 → 1000/2048) and its measured ceiling.
  *
  * The r16 verdict asked for BPE training at ≥1k merges over ≥2k docs.
  * Measurement first: the harness corpus has exactly 31 distinct words at
  * EVERY scale factor (the generator draws from a fixed pool), so greedy
  * pair-merge training exhausts — no adjacent pair left with count ≥ 2 —
  * at 93 merges, far below either the old 200 or the new 1000 knob. Past
  * exhaustion every corpus word is a single whole-word token; this is
  * exactly what production BPE does on a closed tiny vocabulary, and it
  * means the knobs CANNOT bind on this corpus. These tests pin both
  * halves: the saturation (so the BASELINE claim stays honest if the
  * testdata generator ever grows a vocabulary) and that the same knobs DO
  * produce genuine sub-word vocabularies on a wide-vocab corpus.
  */
class BpeSaturationSpec extends SparkSpec {

  test("harness corpus: training exhausts below the knob and the trained " +
    "table saturates every corpus word to ONE token") {
    val merges = TextQueries.trainedBpe(spark, sf)
    assert(merges.size < TextQueries.BpeNumMerges,
      s"training no longer exhausts (${merges.size} merges hit the knob) " +
        "— the corpus vocabulary grew; re-true the BASELINE ceiling note")
    assert(merges.size > 50,
      s"only ${merges.size} merges — training collapsed, that's a bug " +
        "not saturation")
    val ranks = Bpe.toRanks(merges)
    import org.apache.spark.sql.functions._
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("text").isNotNull)
      .select(explode(split(lower(col("text")), "[^a-z0-9']+")).as("w"))
      .where(length(col("w")) > 0)
      .distinct().collect().map(_.getString(0))
    assert(words.length < 100,
      s"corpus vocabulary is ${words.length} words — the 31-word ceiling " +
        "measurement is stale, re-true it")
    words.foreach { w =>
      val n = Bpe.applySyms(w, ranks).length
      assert(n == 1, s"'$w' tokenizes to $n tokens — not saturated")
    }
  }

  test("the same knobs bind on a wide-vocab corpus: sub-word tokens and " +
    "a merge table that uses the budget") {
    // deterministic wide vocabulary: 800 distinct 6-9 char words sharing
    // character bigrams (so merges generalize), each appearing twice
    val syll = Array("ka", "to", "ri", "mu", "en", "so", "pla", "ver")
    val words = (0 until 800).map { i =>
      // base-8 syllable encoding of i: 800 genuinely distinct words that
      // share syllables, so merges generalize across the vocabulary
      Seq(i % 8, (i / 8) % 8, (i / 64) % 8, (i / 512) % 8).map(syll).mkString
    }.distinct
    assert(words.size == 800)
    val merges = Bpe.train(words.flatMap(w => Seq(w, w)), 1000)
    assert(merges.size > 200,
      s"wide-vocab training stopped at ${merges.size} merges — the knob " +
        "never binds anywhere, which would make the raise meaningless")
    val ranks = Bpe.toRanks(merges)
    // held-out recombinations must tokenize to MULTIPLE sub-word tokens
    val held = Seq("katoriXmu", "playverkato", "ensoplamuri")
    val subword = held.map(w => Bpe.applySyms(w, ranks).length)
    assert(subword.forall(_ > 1),
      s"held-out words tokenized to $subword tokens — no sub-word " +
        "structure learned")
  }
}
