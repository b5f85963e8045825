package graft.ops

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec

/** In-flight pipeline observability via `Dataset.observe`: row counts and
  * invariant sums are computed DURING the write — no second scan of 100 TB
  * just to know how many rows landed. The metrics surface through a
  * QueryExecutionListener (batch) or StreamingQueryProgress (streams). */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observe() yields row counts + invariant sums without a second scan") {
    val captured = new AtomicReference[Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        val m = qe.observedMetrics.get("ingest_metrics")
        m.foreach(captured.set)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq((1L, 10.0), (2L, -3.0), (3L, 5.0)).toDF("k", "v")
        .observe("ingest_metrics",
          count(lit(1)).as("n_rows"),
          sum(when(col("v") < 0, 1L).otherwise(0L)).as("n_negative"))
      df.write.mode("overwrite").format("noop").save()
      // listener fires on the driver event loop; wait for delivery
      val deadline = System.nanoTime() + 10_000_000_000L
      while (captured.get() == null && System.nanoTime() < deadline)
        Thread.sleep(50)
      val m = captured.get()
      assert(m != null, "observed metrics must reach the listener")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("n_negative") == 1L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("observed metrics do not change the result or add a scan") {
    val df = spark.read.parquet(s"$sf/nation.parquet")
      .observe("scan_metrics", count(lit(1)).as("n"))
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"observe must piggyback on the existing scan:\n$plan")
    assert(df.collect().map(_.getLong(1)).sum == 25)
  }
}
