package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t41_stream_ingest_gate — the streaming ingest gate's driver row.
  * The gate's streaming mechanics (fresh-session function resolution,
  * multi-batch sink landing, exactly-once) live in StreamingSpec and the
  * equivalence spec; this pins the REGISTERED query's claims: the
  * foreachBatch replay's verdicts are identical to a one-shot batch run
  * of the same gate, and both verdict populations are live (the planted
  * perturbed copies all flag, the planted novel docs all pass).
  */
class StreamIngestGateSpec extends SparkSpec {

  private def key(r: Row) = (r.getLong(0),
    if (r.isNullAt(2)) None else Some(r.getLong(2)),
    if (r.isNullAt(3)) None else Some(r.getDouble(3)),
    r.getInt(4))

  test("replayed verdicts == one-shot batch gate on the same slices; " +
    "both verdict populations live") {
    val streamed = TextQueries.streamIngestGate(spark, sf).collect()

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dupes = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" nightly batch")).as("text"))
    val novel = docs.where(pmod(col("doc_id"), lit(10)) === 5)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("zyq wubrak vexilo "),
          (col("doc_id") + 2000000L).cast("string"),
          lit(" cromulent frobz nixplat gorvane thrubix")).as("text"))
    val oneShot = graft.streaming.StreamOps.nearDupGateBatch(
      dupes.unionByName(novel), docs, "text", "doc_id", threshold = 0.5)
      .collect()

    assert(streamed.map(key).toSet == oneShot.map(key).toSet,
      "foreachBatch replay diverged from the one-shot gate")
    val byPop = streamed.groupBy(_.getLong(0) / 1000000L)
    assert(byPop(1L).forall(_.getInt(4) == 0),
      "a perturbed corpus copy passed the gate")
    assert(byPop(2L).forall(_.getInt(4) == 1),
      "a planted novel doc was flagged")
    assert(byPop(1L).nonEmpty && byPop(2L).nonEmpty)
  }
}
