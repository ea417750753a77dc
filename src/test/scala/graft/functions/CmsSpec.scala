package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Count-Min pins: the CM overestimate guarantee against exact counts,
  * bit-exact mergeability (the property that makes stored per-day
  * sketches roll up losslessly), and partition-invariance of the built
  * image (merge is commutative+associative elementwise addition, so the
  * sketch bytes cannot depend on the physical split).
  */
class CmsSpec extends SparkSpec {

  private lazy val ev = Tables.load(spark, sf001, "events")

  test("point estimates always >= exact counts; small keys near-exact") {
    val img = ev.agg(CmsFunctions.cmsAgg(spark, col("user_id")).as("sk"))
      .head.getAs[Array[Byte]](0)
    val truth = ev.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    truth.foreach { case (k, c) =>
      val est = CountMin.query(img, k,
        CountMin.DefaultDepth, CountMin.DefaultWidth)
      assert(est >= c, s"CM must never underestimate: key $k est $est < $c")
      // eps = e/w ≈ 0.0053 at w=512; the d=4 min makes the expected
      // overshoot far smaller — allow the full eps*N bound
      assert(est - c <= math.ceil(math.E / CountMin.DefaultWidth * n).toLong,
        s"key $k overshoot ${est - c} beyond eps*N")
    }
    // an absent key reads ~0 (bounded by the same guarantee)
    val absent = CountMin.query(img, 999999L,
      CountMin.DefaultDepth, CountMin.DefaultWidth)
    assert(absent <= math.ceil(math.E / CountMin.DefaultWidth * n).toLong)
  }

  test("merge of per-type sketches is BIT-IDENTICAL to the one-pass sketch") {
    val whole = ev.agg(CmsFunctions.cmsAgg(spark, col("user_id")).as("sk"))
      .head.getAs[Array[Byte]](0)
    val merged = ev.groupBy("event_type")
      .agg(CmsFunctions.cmsAgg(spark, col("user_id")).as("sk"))
      .agg(CmsFunctions.cmsMergeAgg(spark, col("sk")).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, merged),
      "elementwise merge must reproduce the one-pass image exactly")
  }

  test("sketch image is partition-invariant") {
    val a = ev.repartition(1)
      .agg(CmsFunctions.cmsAgg(spark, col("user_id")).as("sk"))
      .head.getAs[Array[Byte]](0)
    val b = ev.repartition(13, col("event_type"))
      .agg(CmsFunctions.cmsAgg(spark, col("user_id")).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }
}
