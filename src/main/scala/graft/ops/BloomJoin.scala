package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShims
import graft.Tables

/** Manual runtime-filter join pruning — the technique Spark's own
  * InjectRuntimeFilter applies to shuffle joins, exposed as an operator
  * for the cases the optimizer can't reach (multi-stage pipelines where
  * the filter should apply several stages before the join; sinks/
  * aggregations between scan and join). A bloom filter built over the
  * small side's hashed keys broadcasts to the big side's SCAN, dropping
  * non-matching rows before any shuffle; since blooms have no false
  * negatives, a real semi join over the survivors restores exact
  * semantics — the bloom only changes how many rows pay the shuffle.
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling the ~selectivity fraction that can match.
  */
object BloomJoin {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** bloom_filter_agg over the hashed key column. */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    GraftSqlShims.column(
      new BloomFilterAggregate(GraftSqlShims.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())

  /** might_contain probe of a bloom column against a hashed key. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftSqlShims.column(BloomFilterMightContain(
      GraftSqlShims.expression(bloom), GraftSqlShims.expression(xxhash64(key))))

  /** Exact semi join with a bloom pre-filter on the probe side. The
    * bloom rides a scalar subquery (might_contain requires a constant or
    * scalar subquery — the same shape InjectRuntimeFilter plants), so the
    * sketch ships like a broadcast, never through a join.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, expectedItems: Long = 1L << 20): DataFrame = {
    val bloomPlan = small.agg(bloomAgg(col(smallKey), expectedItems).as("__bf"))
      .queryExecution.analyzed
    val probe = BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bloomPlan),
      GraftSqlShims.expression(xxhash64(col(bigKey))))
    big.filter(GraftSqlShims.column(probe))
      .join(small.select(col(smallKey)).distinct(),
        col(bigKey) === col(smallKey), "left_semi")
  }

  val queries: Seq[Q] = Seq(
    // Exactness on the gate: the bloom prune must be invisible — the
    // oracle is the plain IN-subquery semi join.
    Q("q_bloom_semi_join",
      (s, dir) => {
        val buyers = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        bloomSemiJoin(t(s, dir, "orders"), buyers, "o_custkey", "c_custkey")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
              FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer
                                  WHERE c_mktsegment = 'BUILDING')
              ORDER BY o_orderkey"""))
  )
}
