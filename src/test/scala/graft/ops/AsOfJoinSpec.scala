package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("attaches latest right row at or before each left ts, per key") {
    val trades = Seq(
      ("A", 100L, "t1"), ("A", 205L, "t2"), ("B", 150L, "t3"), ("B", 90L, "t4"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 90L, 1.0), ("A", 100L, 2.0), ("A", 200L, 3.0), ("B", 100L, 4.0))
      .toDF("sym", "ts", "px")
    val out = AsOfJoin.join(trades, quotes, keys = Seq("sym"),
        leftTs = "ts", rightTs = "ts", rightValues = Seq("px"))
      .select("trade", "asof_px").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out("t1").contains(2.0))  // ts=100 matches the equal-ts quote (<=)
    assert(out("t2").contains(3.0))  // latest earlier quote at 200
    assert(out("t3").contains(4.0))
    assert(out("t4").isEmpty)        // no quote at or before ts=90 for B
  }

  test("tie-break picks the greatest right row at identical (key, ts)") {
    val l = Seq(("A", 100L, "x")).toDF("sym", "ts", "name")
    val r = Seq(("A", 100L, 7L, 1.0), ("A", 100L, 9L, 2.0), ("A", 100L, 8L, 3.0))
      .toDF("sym", "ts", "qid", "px")
    val out = AsOfJoin.join(l, r, Seq("sym"), "ts", "ts",
      Seq("qid", "px"), rightTieBreak = Some("qid")).collect().head
    assert(out.getAs[Long]("asof_qid") == 9L)
    assert(out.getAs[Double]("asof_px") == 2.0)
  }
}
