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

  test("docNovelty: first doc scores 1.0, a near-copy scores near 0, invariants hold") {
    import spark.implicits._
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val df = Seq(
      (0L, a, "s"),                                  // all shingles first-owned
      (1L, a + " tailx taily tailz", "s"),           // mostly a copy of doc 0
      (2L, "fresh u1 u2 u3 u4 u5 u6 u7", "s")        // fully novel
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.docNovelty(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L)._3 == 1.0 && got(2L)._3 == 1.0)
    // doc 1 = 11 words -> 9 shingles; the 8 from doc 0 are owned there;
    // novel = the 3 crossing into the fresh tail... recompute honestly:
    // shingles of doc1: w1w2w3..w8w9w10 (8, owned by doc 0) + w9w10tailx,
    // w10tailxtaily, tailxtailytailz (3 novel) = 11 total, novelty 3/11
    assert(got(1L)._1 == 11L && got(1L)._2 == 3L)
    assert(math.abs(got(1L)._3 - 3.0 / 11.0) < 1e-15)
    got.values.foreach { case (n, nov, f) =>
      assert(nov >= 0 && nov <= n && f >= 0.0 && f <= 1.0)
    }
  }

  test("sourceUniqueness: known fixture fractions; consistent with the overlap matrix on real docs") {
    import spark.implicits._
    // srcA shingles: {alpha beta gamma, beta gamma delta} — 1 shared
    // srcB shingles: {x1 alpha beta, alpha beta gamma, beta gamma x2} — 1 shared
    val df = Seq(
      (0L, "alpha beta gamma delta", "srcA"),
      (1L, "x1 alpha beta gamma x2", "srcB")
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.sourceUniqueness(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(("srcA", 2L, 1L, 0.5), ("srcB", 3L, 2L, 2.0 / 3.0)), s"$got")

    val docs = Tables.load(spark, sf0001, "documents")
    val uniq = CorpusOps.sourceUniqueness(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // per-source shingle-set sizes must agree with the overlap matrix's
    val ov = CorpusOps.sourceOverlap(docs).collect()
    ov.foreach { r =>
      assert(uniq(r.getString(0))._1 == r.getLong(3))
      assert(uniq(r.getString(1))._1 == r.getLong(4))
    }
    // a source that appears in ANY overlap pair cannot be 100% unique
    val inPairs = ov.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    inPairs.foreach(s => assert(uniq(s)._2 < uniq(s)._1, s"$s fully unique but overlaps"))
  }

  test("dupClusterSizes: fixture histogram exact; doc mass conserved on real docs") {
    import spark.implicits._
    val twin = "same words repeated here exactly for the pair of twins now"
    val df = Seq(
      (0L, twin, "s", twin.length.toLong),
      (1L, twin, "s", twin.length.toLong),
      (2L, "completely different content with no shared trigrams at all q", "s", 60L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val got = TextDedup.dupClusterSizes(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 2L)), s"$got")

    val docs = Tables.load(spark, sf0001, "documents")
    val rows = TextDedup.dupClusterSizes(docs).collect()
    assert(rows.map(_.getLong(2)).sum == docs.count(), "every doc lands in exactly one cluster")
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
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

  test("retrievalMetrics: equals a full JVM replay (idf scores, ranks, MRR/recall/nDCG)") {
    val docs = Tables.load(spark, sf0001, "documents")
    val rows = docs.select(col("doc_id"), col("text"), col("source"),
        col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val k = 10
    def d9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val termSets = rows.map(r =>
      r._1 -> r._2.split(" ").filter(_.nonEmpty).toSet).toMap
    val n = rows.length
    val dfT = rows.flatMap(r => termSets(r._1)).groupBy(identity)
      .view.mapValues(_.size).toMap
    val queries = rows.filter(_._1 % 97 == 0)
    val cands = rows.filter(_._1 % 97 != 0)
    val meta = rows.map(r => r._1 -> (r._3, r._4)).toMap
    val nRel = cands.groupBy(r => (r._3, r._4)).view.mapValues(_.size).toMap
    val ln2 = math.log(2.0)
    val expected = queries.map { q =>
      val qs = termSets(q._1)
      val scored = cands.flatMap { c =>
        val shared = termSets(c._1).intersect(qs)
        if (shared.isEmpty) None
        else Some(c._1 ->
          shared.toSeq.map(t => d9(math.log(n.toDouble / dfT(t)))).sum.toDouble)
      }
      val top = scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, _), i) => (id, i + 1L) }
      val rels = top.filter { case (id, _) => meta(id) == (q._3, q._4) }
      val nrt = nRel.getOrElse((q._3, q._4), 0).toLong
      val first = rels.headOption.map(_._2)
      val dcg = top.map { case (id, r) =>
        val rel = if (meta(id) == (q._3, q._4)) 1 else 0
        d9(rel / (math.log(r + 1.0) / ln2))
      }.sum.toDouble
      val idcg = if (nrt >= 1)
        Some((1L to math.min(k.toLong, nrt))
          .map(i => d9(1.0 / (math.log(i + 1.0) / ln2))).sum.toDouble)
      else None
      (q._1, nrt, first, first.map(1.0 / _).getOrElse(0.0), rels.size.toLong,
        if (nrt == 0) None else Some(rels.size.toDouble / nrt),
        dcg, idcg.map(dcg / _))
    }.sortBy(_._1).toSeq
    val got = CorpusOps.retrievalMetrics(spark, docs, k).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getDouble(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toSeq
    assert(got.nonEmpty && got == expected,
      s"\n got=${got.take(3)}\n exp=${expected.take(3)}")
    // the weak labels must actually be retrievable: some query finds a
    // relevant doc in its top k
    assert(got.exists(_._5 > 0))
  }
}
