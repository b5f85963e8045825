package graft.sim

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** Video keyframe-containment near-dup (s18) on a hand-countable planted
  * corpus: block-aligned texts where every frame membership is known. */
class VideoNearDupSpec extends SparkSpec {

  // 32-char blocks: frame f of a block-aligned text IS block f
  private def blk(c: Char): String = c.toString * 32

  test("trimmed re-encode flags at 1.0; half-mutation stays below the " +
    "threshold; exact copies flag; frame counts are hand-exact") {
    import spark.implicits._
    val docs = Seq(
      // id 3 gets a planted trimmed copy (loses 80 chars = 2.5 frames:
      // the copy keeps floor(48/32) = 1 complete frame, block a)
      3L -> (blk('a') + blk('b') + blk('c') + blk('d')),
      // id 6 gets the half-mutated control: frames c,d upper-cased,
      // shared = {e,f} of 4 -> 0.5 < 0.8
      6L -> (blk('e') + blk('f') + blk('g') + blk('h')),
      // 1 and 11: exact copies, all 4 frames shared -> 1.0
      1L -> (blk('p') + blk('q') + blk('r') + blk('s')),
      11L -> (blk('p') + blk('q') + blk('r') + blk('s'))
    ).toDF("doc_id", "text")
    val got = SimilarityQueries
      .videoLayout(docs, frameLen = 32, threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = Set(
      (3L, 2000003L, 1L, 1.0), // trimmed copy: 1 shared frame, min nfr 1
      (1L, 11L, 4L, 1.0)) // exact copy: 4 shared frames
    assert(got == want, s"got $got")
  }

  test("a sub-frame payload drops cleanly (no descending-sequence frames)") {
    import spark.implicits._
    val docs = Seq(5L -> "short", 15L -> "short").toDF("doc_id", "text")
    // both too short for one 32-char frame: no frames, no pairs, no error
    assert(SimilarityQueries.videoLayout(docs, 32, 0.8).count() == 0L)
  }

  test("ubiquitous-frame cap: a boilerplate frame shared by more than " +
    "maxFrameDf videos generates NO candidate pairs, while a surfaced " +
    "pair's exact n_shared still counts it") {
    import spark.implicits._
    // ids avoid %10∈{3,6} so the in-query planted copies stay out of the way
    val boiler = blk('i') // shared by all 6 videos → df 6 > cap 3
    val docs = Seq(
      21L -> (boiler + blk('a') + blk('b') + blk('c')),
      22L -> (boiler + blk('a') + blk('b') + blk('c')), // exact copy of 21
      24L -> (boiler + blk('d') + blk('e') + blk('f')),
      25L -> (boiler + blk('g') + blk('h') + blk('j')),
      27L -> (boiler + blk('k') + blk('l') + blk('m')),
      28L -> (boiler + blk('n') + blk('o') + blk('q'))
    ).toDF("doc_id", "text")
    val got = SimilarityQueries
      .videoLayout(docs, 32, 0.8, maxFrameDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // the copy pair survives (found via its rare frames a,b,c) and its
    // containment count INCLUDES the capped boilerplate frame: 4/4 shared,
    // not 3/4 — the cap gates candidate generation, never the verify count.
    // The 14 boilerplate-only pairs (each would share 1/4 = 0.25) never
    // even become candidates.
    assert(got == Set((21L, 22L, 4L, 1.0)), s"got $got")
    // and on this corpus the capped run agrees with the uncapped default —
    // boilerplate-only pairs were below threshold anyway; the cap's delta
    // is candidate VOLUME, which is what kills the O(df²) hot key at scale
    val dflt = SimilarityQueries.videoLayout(docs, 32, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(dflt == got, s"default-cap run diverged: $dflt")
  }

  test("repeated frames within one video collapse at the distinct " +
    "(a boilerplate-heavy video cannot inflate containment)") {
    import spark.implicits._
    // id 2: the same block 4 times = ONE distinct frame; id 12 holds
    // that block once among 4 -> shared 1, min(nfr) = 1 -> overlap 1.0
    val docs = Seq(
      2L -> (blk('z') * 4),
      12L -> (blk('z') + blk('x') + blk('y') + blk('w'))
    ).toDF("doc_id", "text")
    val got = SimilarityQueries.videoLayout(docs, 32, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((2L, 12L, 1L, 1.0)), s"got ${got.toSeq}")
  }
}
