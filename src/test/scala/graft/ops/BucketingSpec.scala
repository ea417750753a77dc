package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Co-located joins via bucketing (builder brief: "repartition/bucketing
  * for co-located joins"): two tables bucketed 8-ways on the join key join
  * WITHOUT any shuffle exchange — the layout every recurring 100 TB join
  * should be stored in.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      Tables.load(spark, sf0001, "orders")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      Tables.load(spark, sf0001, "customer")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin"), planStr)
      // the JOIN itself is exchange-free; only the 5-group aggregate shuffles
      val joinPart = planStr.substring(planStr.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), joinPart)
      // and it still computes the right answer
      val direct = Tables.load(spark, sf0001, "orders")
        .join(Tables.load(spark, sf0001, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(joined.except(direct).count() == 0 && direct.except(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("native as-of join over bucketed inputs plans zero exchanges") {
    // AsOfJoinExec declares ClusteredDistribution on its keys, so a
    // bucketed-by-key layout must satisfy it with no shuffle — the same
    // zero-exchange contract a sort-merge join gets, which is what makes
    // the operator viable for recurring 100 TB as-of joins.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val e = Tables.load(spark, sf0001, "events")
      e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .write.mode("overwrite").bucketBy(8, "user_id").saveAsTable("purch_bkt")
      e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .write.mode("overwrite").bucketBy(8, "user_id").saveAsTable("click_bkt")
      val out = graft.plans.NativeAsOfJoin.join(
        spark.table("purch_bkt"), spark.table("click_bkt"),
        Seq("user_id"), "ts", "ts", Seq("event_id", "value"),
        rightTieBreak = Some("event_id"))
      val planStr = out.queryExecution.executedPlan.toString
      assert(planStr.contains("AsOfJoin"), planStr)
      assert(!planStr.contains("Exchange"), planStr)
      // still the right answer: matches the shuffled (unbucketed) run
      val shuffled = graft.plans.NativeAsOfJoin.join(
        e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value")),
        Seq("user_id"), "ts", "ts", Seq("event_id", "value"),
        rightTieBreak = Some("event_id"))
      assert(out.count() == shuffled.count())
      assert(out.except(shuffled).count() == 0 && shuffled.except(out).count() == 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS purch_bkt")
      spark.sql("DROP TABLE IF EXISTS click_bkt")
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // The runtime half of the skew story (Skew.saltedJoin is the explicit
    // half): one hot key dominates the left side; with tiny skew
    // thresholds AQE's OptimizeSkewedJoin must split that partition —
    // visible as skew=true on the final plan's shuffle read.
    import spark.implicits._
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val hot = spark.range(50000).select(lit(1L).as("k"),
        concat(lit("payload-padding-"), col("id").cast("string")).as("pad"))
        .unionAll(spark.range(100).select((col("id") + 2).as("k"),
          lit("x").as("pad")))
      val dim = spark.range(200).select(col("id").as("k2"), lit("d").as("v"))
      val joined = hot.join(dim, col("k") === col("k2"))
      // execute THIS frame (count() would plan a different query and leave
      // joined's AdaptiveSparkPlan non-final)
      val n = joined.collect().length
      assert(n == 50100, s"rows $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(300))
      assert(plan.contains("skew=true"), plan.take(1200))
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
