package graft.queries

import graft.SparkSpec

/** t24 invariants on the real corpus: packing must be a gapless token
  * layout — every chunk lands exactly where the previous one ended
  * within its shard, offsets stay inside the budget, and pack ids are
  * monotone. (Value-exactness vs DuckDB is the oracle gate's job.) */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  test("packing is gapless, in-budget, and monotone per shard") {
    val rows = TextQueries.sequencePack(spark, sf)
      .as[(Int, Long, Int, Int, Int, Int)].collect()
      .sortBy(r => (r._1, r._2, r._3)) // shard, doc_id, chunk_no
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { shard =>
      var cum = 0L
      shard.foreach { case (_, _, _, nTok, packId, tokOffset) =>
        assert(tokOffset >= 0 && tokOffset < 256, s"offset $tokOffset")
        assert(packId == cum / 256 && tokOffset == cum % 256,
          s"gap or overlap at cum=$cum: pack=$packId off=$tokOffset")
        cum += nTok
      }
    }
  }
}
