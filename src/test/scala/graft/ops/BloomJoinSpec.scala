package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class BloomJoinSpec extends SparkSpec {

  test("bloom pre-filter evaluates at the probe scan and stays exact") {
    val orders = Tables.load(spark, sf0001, "orders")
    val buyers = Tables.load(spark, sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val out = BloomJoin.bloomSemiJoin(orders, buyers, "o_custkey", "c_custkey")
    // the might_contain probe sits in a Filter directly over the orders
    // scan — rows drop before any join/shuffle
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // exact: identical to the plain semi join
    val plain = orders.join(buyers.select("c_custkey"),
      col("o_custkey") === col("c_custkey"), "left_semi")
    assert(out.count() == plain.count())
    assert(out.select("o_orderkey").except(plain.select("o_orderkey")).count() == 0)
    assert(plain.select("o_orderkey").except(out.select("o_orderkey")).count() == 0)
  }
}
