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
      .as[(Int, Long, Int, Long, Int, Int)].collect()
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

  test("raising the shard count keeps the shape: invariants hold and pack count tracks tokens/budget") {
    // the 100 TB story — packs are shard-local, so more shards = more
    // parallelism, same layout logic — pinned by running the SAME core
    // at 32 and 128 shards and checking (a) the gapless/in-budget
    // invariants are shard-count-independent, and (b) per-shard packs
    // are exactly the windowed-cumsum arithmetic, so the TOTAL pack
    // count stays within one partial tail pack per shard of the
    // data-determined floor ceil(totalTokens/budget)
    import org.apache.spark.sql.functions.{col, posexplode}
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        posexplode(graft.text.TextOps.chunkWindows(col("text"))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_no"),
        col("col").as("chunk"))
    val budget = 256
    Seq(32, 128).foreach { shards =>
      val rows = TextQueries.packLayout(base, shards, budget)
        .as[(Int, Long, Int, Long, Int, Int)].collect()
        .sortBy(r => (r._1, r._2, r._3))
      assert(rows.map(_._1).distinct.forall(s => s >= 0 && s < shards))
      var totalTok = 0L
      var totalPacks = 0L
      var maxTok = 0L
      rows.groupBy(_._1).values.foreach { shard =>
        var cum = 0L
        shard.foreach { case (_, _, _, nTok, packId, tokOffset) =>
          assert(packId == cum / budget && tokOffset == cum % budget,
            s"shards=$shards: gap at cum=$cum")
          cum += nTok
        }
        // exact per-shard identity: a chunk belongs to the pack of its
        // START offset, so the last chunk's pack is
        // floor((shardTok - lastChunkTok)/budget) and packs = that + 1
        val lastTok = shard.last._4
        val packs = shard.map(_._5).max + 1L
        assert(packs == (cum - lastTok) / budget + 1,
          s"shards=$shards: packs=$packs != identity for shardTok=$cum last=$lastTok")
        totalTok += cum
        totalPacks += packs
        maxTok = maxTok.max(shard.map(_._4.toLong).max)
      }
      // upper bound IS a theorem (<= one partial tail pack per shard);
      // the naive lower bound ceil(totalTok/budget) is NOT — a chunk
      // straddling a budget cut makes its pack carry more than `budget`
      // tokens — so the floor must be collision-aware: every pack holds
      // at most budget + maxChunkTok - 1 tokens
      val ceilTotal = (totalTok + budget - 1) / budget
      val looseFloor =
        (totalTok + budget + maxTok - 2) / (budget + maxTok - 1)
      assert(totalPacks >= looseFloor && totalPacks <= ceilTotal + shards,
        s"shards=$shards: packs=$totalPacks outside [$looseFloor, ${ceilTotal + shards}]")
    }
  }
}
