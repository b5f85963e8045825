package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t28 epoch shuffle — the training-export layout pass. The contract:
  * every epoch is a complete, deterministically re-permuted copy of the
  * corpus, laid out as independently-ordered shards with contiguous
  * 1-based positions; the whole layout is a pure function of
  * (epoch, doc_id) so it survives stage replay and partitioning changes.
  */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def layout(epochs: Int = 2, shards: Int = 8) =
    TextQueries.shuffleLayout(docs, epochs, shards)
      .as[(Int, Int, Int, Long)].collect().toSeq

  test("each epoch is a complete permutation of the corpus") {
    val ids = docs.select(col("doc_id")).as[Long].collect().toSet
    val out = layout()
    assert(out.size == ids.size * 2)
    (0 to 1).foreach { e =>
      val epochIds = out.filter(_._1 == e).map(_._4)
      assert(epochIds.size == ids.size, s"epoch $e row count")
      assert(epochIds.toSet == ids, s"epoch $e is not a permutation")
    }
  }

  test("positions are contiguous 1..n within every (epoch, shard)") {
    layout().groupBy(r => (r._1, r._2)).foreach { case ((e, s), rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toList,
        s"epoch $e shard $s positions not contiguous")
    }
  }

  test("epochs permute differently and shards are used") {
    val out = layout()
    val byEpoch = out.groupBy(_._1)
      .map { case (e, rows) => e -> rows.map(r => (r._2, r._3, r._4)).toSet }
    assert(byEpoch(0) != byEpoch(1),
      "epoch 1 must re-permute, not replay epoch 0's layout")
    // md5 spreads the corpus: every shard sees traffic in each epoch
    // (fixed corpus — this is a deterministic fact, not a probabilistic one)
    (0 to 1).foreach { e =>
      val used = out.filter(_._1 == e).map(_._2).toSet
      assert(used == (0 until 8).toSet, s"epoch $e shards used: $used")
    }
  }

  test("shuffleLayout is parameterized: epochs=3, shards=4") {
    val n = docs.count()
    val out = layout(epochs = 3, shards = 4)
    assert(out.size == 3 * n)
    assert(out.map(_._1).toSet == Set(0, 1, 2))
    assert(out.map(_._2).forall(s => s >= 0 && s < 4))
  }

  test("plan: ONE narrow-row shuffle on (epoch, shard); text never read") {
    val plan = TextQueries.epochShuffle(spark, sf).queryExecution.executedPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val shuffles = root.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, s"expected exactly one exchange:\n$root")
    // the shuffled row is (doc_id, epoch, k, shard) — no text column
    assert(!shuffles.head.output.exists(_.name == "text"),
      "document text must not ride the layout shuffle")
    val s = root.toString
    assert(s.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan must prune every column but doc_id:\n$s")
  }

  test("layout is partitioning-independent and replay-deterministic") {
    val base = layout().sorted
    val p1sess = spark.newSession()
    p1sess.conf.set("spark.sql.shuffle.partitions", "1")
    val again = TextQueries.shuffleLayout(
        p1sess.read.parquet(s"$sf/documents.parquet"), 2, 8)
      .as[(Int, Int, Int, Long)].collect().toSeq.sorted
    assert(base == again, "layout depends on the physical partitioning")
  }
}
