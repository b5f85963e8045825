package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation primitives. Spark's AQE skew-join handles most
  * cases at runtime (and stays enabled in our sessions); these are for
  * the two shapes AQE cannot fix:
  *
  *   - a broadcast-too-big dimension joined on a hot key (salting spreads
  *     the hot key's rows over `salts` tasks);
  *   - a groupBy where one key owns most rows (two-phase salted agg
  *     splits the hot group into `salts` partials before the final
  *     combine).
  */
object Skew {

  /** Equi-join with the LARGE (skewed) side salted and the small side
    * replicated `salts` times. Result rows are identical to the plain
    * join; the shuffle key becomes (key, salt) so one hot key spreads
    * over `salts` partitions instead of one straggler task.
    *
    * The salt only routes rows between partitions, so any per-row value
    * works; a hash of the join key + a distributing component keeps it
    * deterministic enough while spreading uniformly. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched REPLICATED small-side row
    // once per salt — result-changing, so refuse rather than mislead
    require(Set("inner", "leftouter", "leftsemi", "leftanti", "left")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-combine on key. `partial` and `combine`
    * must form a semigroup on the aggregated column (sum/sum, count/sum,
    * min/min, max/max...). */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Column => Column, combine: Column => Column,
                valueCol: String, outCol: String): DataFrame =
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial(col(valueCol)).as("__p"))
      .groupBy(col(key))
      .agg(combine(col("__p")).as(outCol))
}
