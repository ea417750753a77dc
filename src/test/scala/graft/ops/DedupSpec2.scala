package graft.ops

import graft.SparkSpec

/** Connected-components regimes must agree: single-task union-find
  * (small graphs) vs distributed large-star/small-star contraction.
  */
class CcRegimeSpec extends SparkSpec {
  import spark.implicits._

  test("star contraction equals union-find on a deep chain plus cliques") {
    // a 100-node path (diameter 99 — hostile to O(diameter) propagation,
    // fine for O(log n) star rounds), a triangle, and an isolated pair
    val edges = (0L until 99L).map(i => (i, i + 1)) ++
      Seq((200L, 201L), (201L, 202L), (202L, 200L), (300L, 301L))
    val df = edges.toDF("a_id", "b_id")
    def run(thr: Long) = TextDedup.connectedComponents(df, localThreshold = thr)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run(Long.MaxValue)
    val star = run(0L)
    assert(local == star)
    assert((0L to 99L).forall(local(_) == 0L))
    assert(Seq(200L, 201L, 202L).forall(local(_) == 200L))
    assert(local(301L) == 300L && local(300L) == 300L)
  }

  test("regimes agree on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 20 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("a_id", "b_id")
      val local = TextDedup.connectedComponents(df, localThreshold = Long.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = TextDedup.connectedComponents(df, localThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == star, s"trial $trial: $local vs $star")
      // every keeper is its component's min: keepers map to themselves
      assert(local.values.toSet.forall(k => local(k) == k))
    }
  }

  test("duplicate and reversed input edges don't change components") {
    val df = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    def run(thr: Long) = TextDedup.connectedComponents(df, localThreshold = thr)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Long.MaxValue) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(run(0L) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}

/** The grouped-split hygiene pin: leakage-safe assignment keeps every
  * near-dup pair on one side of the split, where the doc-keyed split
  * (q_train_split's convention) provably does not on this fixture.
  */
class LeakageSafeSplitSpec extends SparkSpec {

  test("no near-dup pair straddles a split; doc-keyed assignment would leak") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    def md5p(x: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(2)
    def splitOf(key: Long): String = {
      val h = md5p(key)
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    val pairs = TextDedup.ngramJaccardPairsPrefix(docs, 0.6)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs - pin is vacuous")
    val comp = TextDedup.connectedComponents(
        TextDedup.ngramJaccardPairsPrefix(docs, 0.6))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def grp(id: Long): Long = comp.getOrElse(id, id)
    // the property the operator exists for: zero straddling pairs
    pairs.foreach { case (a, b) =>
      assert(splitOf(grp(a)) == splitOf(grp(b)),
        s"pair ($a, $b) straddles the grouped split")
    }
    // and the doc-keyed split DOES leak on this fixture (so the pin bites)
    assert(pairs.exists { case (a, b) => splitOf(a) != splitOf(b) },
      "doc-keyed split leaks nothing here - fixture too weak to pin")
    // aggregated output partitions the corpus
    val out = TextDedup.leakageSafeSplit(docs).collect()
    assert(out.map(_.getLong(2)).sum == docs.count())
    assert(out.map(_.getString(1)).toSet == Set("train", "val", "test"))
  }
}
