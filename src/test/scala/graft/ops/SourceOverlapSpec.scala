package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SourceOverlapSpec extends SparkSpec {

  test("sourceOverlap: known-overlap fixture produces the exact matrix") {
    import spark.implicits._
    // srcA: shingles {alpha beta gamma, beta gamma delta}
    // srcB: shingles {x1 alpha beta, alpha beta gamma, beta gamma x2}
    // srcC: disjoint -> appears in NO pair row
    val df = Seq(
      (0L, "alpha beta gamma delta", "srcA"),
      (1L, "x1 alpha beta gamma x2", "srcB"),
      (2L, "zeta eta theta iota", "srcC")
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.sourceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(("srcA", "srcB", 1L, 2L, 3L, 0.25)), s"$got")
  }

  test("sourceOverlap: matrix invariants hold on real docs") {
    val docs = Tables.load(spark, sf0001, "documents")
    val rows = CorpusOps.sourceOverlap(docs).collect()
    assert(rows.nonEmpty, "the synthetic corpus has cross-source repeats")
    rows.foreach { r =>
      val (a, b, sh, na, nb, j) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b, "pairs are ordered once, no mirror rows")
      assert(sh >= 1 && sh <= math.min(na, nb), s"$a/$b: $sh of $na/$nb")
      assert(j == sh.toDouble / (na + nb - sh), s"$a/$b jaccard formula")
    }
    // per-source shingle-set sizes are consistent across every row that
    // mentions the source
    val sizes = rows.flatMap(r => Seq(r.getString(0) -> r.getLong(3),
      r.getString(1) -> r.getLong(4)))
    sizes.groupBy(_._1).foreach { case (s, vs) =>
      assert(vs.map(_._2).distinct.length == 1, s"size of $s inconsistent")
    }
  }
}
