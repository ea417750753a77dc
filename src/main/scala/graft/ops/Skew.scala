package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (builder brief: "skewed keys → salting or AQE
  * skew-join"). AQE rebalances sort-merge skew automatically; these cover
  * the aggregation side, where one hot key would otherwise pin a single
  * reducer at 100 TB.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) computes partial
    * aggregates across `saltBuckets` reducers, then a tiny second pass
    * merges per-key. Algebraic aggregates only (sum/count/min/max — the
    * decomposable ones). The salt is a hash of the whole row's random-ish
    * columns, not rand(): deterministic, so retried tasks produce identical
    * results (a rand() salt breaks exactly-once on retry).
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column, saltBuckets: Int,
      saltSource: Column): (DataFrame, DataFrame) = {
    val salted = df.groupBy(key.as("k"), (pmod(xxhash64(saltSource), lit(saltBuckets))).as("salt"))
      .agg(count(lit(1)).as("pc"), sum(value).as("ps"),
        min(value).as("pmin"), max(value).as("pmax"))
    val merged = salted.groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"),
        min(col("pmin")).as("vmin"), max(col("pmax")).as("vmax"))
    (salted, merged)
  }
}
