package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, SimilarityQueries}

/** s20 cluster-balanced sampling: quota semantics (rare cells keep
  * everything, hot cells cap at exactly the quota with the LCG-ranked
  * slice), determinism under repartitioning, and the scale-shape pins
  * (vectors off the exchange, partial WindowGroupLimit). */
class ClusterBalancedSpec extends SparkSpec {

  test("per-cell output size is min(cell size, quota); admitted set is " +
    "the LCG-lowest slice, independent of input partitioning") {
    val q = Registry.queries("s20_cluster_balanced_sample")
    val out = q(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out.nonEmpty)
    val byCell = out.groupBy(_._1)
    byCell.foreach { case (cell, rows) =>
      assert(rows.length <= SimilarityQueries.BalancedQuota,
        s"cell $cell over quota: ${rows.length}")
      // ranks are dense 1..n within the cell
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"cell $cell ranks not dense")
    }
    // at the harness SF the corpus is bigger than cells*quota, so at
    // least one cell must actually cap (the operator's point)
    assert(byCell.values.exists(_.length == SimilarityQueries.BalancedQuota),
      "no cell reached the quota — the cap branch is untested")
    assert(byCell.values.exists(_.length < SimilarityQueries.BalancedQuota),
      "every cell capped — the keep-all branch is untested")
    assert(q(spark, sf).collect().length == out.length) // deterministic re-run
  }

  test("admission is a pure function of vec_id: same output under " +
    "repartition(7) of the source") {
    val base = Registry.queries("s20_cluster_balanced_sample")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    // the query reads the dir itself; emulate a different partitioning by
    // checking the window key directly: the LCG rank of every admitted
    // vec_id is below every rejected one within its cell
    val all = Similarity.ivfAssign(
        spark.read.parquet(s"$sf/embeddings.parquet"),
        graft.sim.Similarity.trainCentroids(
          spark.read.parquet(s"$sf/embeddings.parquet"), k = 8))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    def key(id: Long) = (id * 48271 % 104729, id)
    all.groupBy(_._2).foreach { case (cell, members) =>
      val admitted = base.filter(_._1 == cell).map(_._3)
      val expect = members.map(_._1).sortBy(key)
        .take(SimilarityQueries.BalancedQuota).toSet
      assert(admitted == expect, s"cell $cell admission mismatch")
    }
  }

  test("plan: one cell-keyed exchange carrying (vec_id, cell) only — " +
    "no vector column — and a partial WindowGroupLimit before it") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = Registry.queries("s20_cluster_balanced_sample")(spark, sf)
      .queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val exchanges = root.collect { case e: Exchange => e }
    assert(exchanges.length == 1, s"expected exactly one exchange:\n$root")
    exchanges.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[
          org.apache.spark.sql.types.ArrayType]),
        s"vectors rode the exchange: ${e.output.map(_.name).mkString(",")}")
    }
    val s = root.toString
    assert(s.contains("WindowGroupLimit"),
      s"rank filter must prune map-side before the exchange:\n$s")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(s).isDefined ||
      s.contains("Partial"),
      s"expected the PARTIAL WindowGroupLimit phase:\n$s")
  }
}
