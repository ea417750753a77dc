package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf001, "embeddings")

  test("FloatDotProduct matches the interpreted higher-order-function fold bitwise") {
    val hof = emb.select(col("vec_id"), expr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)").as("d"))
    val cg = emb.select(col("vec_id"),
      VectorFunctions.floatDot(spark, col("embedding"), col("embedding")).as("d"))
    val diff = hof.as("a").join(cg.as("b"), "vec_id")
      .filter(col("a.d") =!= col("b.d")).count()
    assert(diff == 0)
  }

  test("LSH top-k recall >= 0.8 vs brute force") {
    val bf = Similarity.bruteForceTopK(spark, emb, nQueries = 20, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, emb, nQueries = 20, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF top-k recall vs brute force (nprobe=4 of 16 cells)") {
    val bf = Similarity.bruteForceTopK(spark, emb, nQueries = 20, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, emb, nQueries = 20, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    // near-uniform corpus: probing 1/4 of cells bounds recall near nprobe/nlist;
    // the spec pins the floor (clustered real embeddings sit far higher)
    assert(recall >= 0.25, s"recall $recall")
  }

  test("LSH near-dup pairs are a subset of the exact pairs") {
    val exact = Similarity.cosinePairs(spark, emb, 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.embedNearDupLsh(spark, emb, 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.5,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("top-k ranks are ordered by descending cosine per query") {
    val rows = Similarity.bruteForceTopK(spark, emb, nQueries = 5, k = 5)
      .orderBy("q_id", "rank").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cosines = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("PqCodes: one in-range code per subspace, matching a Scala argmin-L2 recompute") {
    val cb = Similarity.pqCodebook(emb, nSub = 8, nCent = 16)
    val rows = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.pqCodes(col("embedding"), cb).as("codes"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val codes = r.getSeq[Int](2)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
      (0 until 8).foreach { sub =>
        val x = v.slice(sub * 8, sub * 8 + 8)
        val best = cb(sub).zipWithIndex.map { case (c, cid) =>
          (x.zip(c).map { case (a, b) => val d = a.toDouble - b.toDouble; d * d }.sum, cid)
        }.min // (dist, cid) natural order = dist ASC then cid ASC tie-break
        assert(codes(sub) == best._2, s"vec ${r.getLong(0)} sub $sub")
      }
    }
  }

  test("IVF-PQ top-k recall vs brute force (compressed candidates + exact re-rank)") {
    val bf = Similarity.bruteForceTopK(spark, emb, nQueries = 20, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqTopK(spark, emb, nQueries = 20, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(bf).size.toDouble / bf.size
    // same nprobe=4/16 cell bound as plain IVF (floor 0.25 there); the
    // ADC pool + exact re-rank holds measured recall at 0.55 here
    assert(recall >= 0.4, s"recall $recall")
    // every query answered with a full k
    assert(pq.size == bf.size)
  }

  test("semanticDecontaminate: flags equal a JVM brute-force max-cosine replay") {
    val vecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val evs = vecs.filter(_._1 % 97 == 0)
    val expected = vecs.filter(_._1 % 97 != 0).flatMap { case (id, v) =>
      val nv = math.sqrt(dot(v, v))
      val best = evs.map { case (eid, q) =>
        (dot(q, v) / (math.sqrt(dot(q, q)) * nv), eid)
      }.maxBy { case (c, eid) => (c, -eid) }
      if (best._1 >= 0.3) Some((id, best._2, best._1)) else None
    }.sortBy(_._1).toSeq
    val got = Similarity.semanticDecontaminate(spark, emb, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("semanticDecontaminate excludes zero-norm vectors on both legs (NaN guard)") {
    import spark.implicits._
    // vec 0: zero EVAL vector (0 % 97 == 0) — cosine against it is x/0 =
    // NaN, which sorts above every real value and would silently win the
    // argmax if not excluded. vec 97: real eval. vec 1: identical to the
    // real eval (cosine 1). vec 2: orthogonal (cosine 0 < threshold).
    // vec 3: zero TRAIN vector — must not appear at all.
    val dim = 64
    def v(hot: Int*): Seq[Float] =
      (0 until dim).map(i => if (hot.contains(i)) 1f else 0f)
    val zero = Seq.fill(dim)(0f)
    val fx = Seq(
      (0L, zero), (97L, v(0, 1)), (1L, v(0, 1)), (2L, v(5)), (3L, zero)
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = Similarity.semanticDecontaminate(spark, fx, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map { case (id, ev, c) => (id, ev, math.abs(c - 1.0) < 1e-12) }
        == Seq((1L, 97L, true)),
      s"zero-norm eval must not NaN-shadow the real match, zero-norm train must drop: $got")
  }

  test("stored-IVF semantic decontamination equals the brute force row-for-row (exact regime)") {
    val idx = graft.sources.VectorIndexStore.ensure(spark, sf001)
    val brute = Similarity.semanticDecontaminate(spark, emb, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ivf = graft.sources.VectorIndexStore
      .semanticDecontaminate(spark, idx, 0.3,
        nprobe = graft.sources.VectorIndexStore.NList)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(ivf.nonEmpty && ivf == brute,
      s"exact regime (nprobe = nlist) must reproduce the brute force: ${ivf.size} vs ${brute.size}")
  }

  test("semanticDecontaminateSweep: recall 1.0 at full depth, truth equals brute, monotone depths") {
    val sweep = Similarity.semanticDecontaminateSweep(spark, emb, 0.3)
      .orderBy(col("nprobe")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(sweep.map(_._1).toSeq == Seq(1, 2, 4, 8, 16))
    val brute = Similarity.semanticDecontaminate(spark, emb, 0.3).count()
    sweep.foreach { case (_, nf, nt, rec, _) =>
      assert(nt == brute, s"sweep truth $nt must equal the brute flag count $brute")
      assert(rec == nf.toDouble / nt)
    }
    // nprobe = nlist probes every cell: coverage is complete by
    // construction, so the widest row recovers every flag
    assert(sweep.last._2 == brute && sweep.last._4 == 1.0)
    // flags and candidate volume are monotone in depth (filters over one
    // shared relation can only grow)
    assert(sweep.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(sweep.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("stored-IVF semantic decontamination at narrow nprobe: flags are a sound subset") {
    val idx = graft.sources.VectorIndexStore.ensure(spark, sf001)
    val brute = Similarity.semanticDecontaminate(spark, emb, 0.3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val narrow = graft.sources.VectorIndexStore
      .semanticDecontaminate(spark, idx, 0.3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // a narrow probe can only MISS leaks, never invent one, and its best
    // cosine never exceeds the full argmax
    narrow.foreach { case (id, c) =>
      assert(brute.contains(id), s"vec $id flagged at nprobe=4 but not by brute force")
      assert(c <= brute(id) + 1e-12, s"vec $id: narrow cosine $c > brute ${brute(id)}")
    }
  }

  test("inContextPack: cluster-sorted packs beat arrival order on coherence; accounting holds") {
    val embS = Tables.load(spark, sf0001, "embeddings")
    val packs = Similarity.inContextPack(spark, embS).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packs.nonEmpty)
    val nVec = embS.filter(col("embedding").isNotNull).count()
    assert(packs.map(_._2).sum == nVec, "packs must partition the corpus")
    packs.foreach { case (_, nd, nc, _, md) =>
      assert(nc >= 1 && md <= nd && md >= (nd + nc - 1) / nc)
    }
    // baseline: the SAME cells packed in ARRIVAL (vec_id) order
    val cells = Similarity.kmeansAssign(spark, embS, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val base = cells.grouped(64).map(_.map(_._2).distinct.length).toSeq
    val baseMaj = cells.grouped(64).map(g =>
      g.groupBy(_._2).values.map(_.length).max).toSeq
    // doc-weighted coherence: cluster order needs FEWER distinct cells
    // per pack and a LARGER majority share than arrival order
    val inCells = packs.map(_._3.toDouble).sum / packs.length
    val baseCells = base.map(_.toDouble).sum / base.length
    assert(inCells < baseCells,
      s"cluster order must be more coherent: $inCells vs $baseCells")
    val inMaj = packs.map(_._5).sum.toDouble / nVec
    val baseMajFrac = baseMaj.sum.toDouble / nVec
    assert(inMaj > baseMajFrac,
      s"majority share must improve: $inMaj vs $baseMajFrac")
  }

  test("inContextPackOffsets: offsets are the exact token cumsum in (cell, doc_id) order") {
    val embS = Tables.load(spark, sf0001, "embeddings")
    val docsS = Tables.load(spark, sf0001, "documents")
    val got = Similarity.inContextPackOffsets(spark, embS, docsS).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // replay: sort by (cell, doc_id), cumsum token counts
    val inOrder = got.sortBy(x => (x._2, x._1))
    var off = 0L
    inOrder.foreach { case (_, _, n, o, sh) =>
      assert(o == off, s"offset drift at $o vs $off")
      assert(sh == o / 256)
      off += n
    }
    assert(off == got.map(_._3).sum)
  }

  test("bitextMine: mined pairs equal a JVM brute-force margin replay") {
    val vecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val norm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val src = vecs.filter { case (id, _) => id % 2 == 0 && norm(id) > 0 }
    val tgt = vecs.filter { case (id, _) => id % 2 != 0 && norm(id) > 0 }
    val k = 4
    val cos = (for ((si, sv) <- src; (ti, tv) <- tgt)
      yield (si, ti) -> (dot(sv, tv) / (norm(si) * norm(ti)))).toMap
    // k-NN averages: top-k by (cosine desc, id), summed in ASCENDING
    // value order — the sort_array fold the engine and oracle share
    def knnAvg(ids: Seq[Long], others: Seq[Long], key: (Long, Long) => (Long, Long)) =
      ids.map { i =>
        val top = others.map(o => (cos(key(i, o)), o)).sortBy { case (c, o) => (-c, o) }.take(k)
        val s = top.map(_._1).sorted.foldLeft(0.0)(_ + _)
        i -> s / top.size
      }.toMap
    val fa = knnAvg(src.map(_._1), tgt.map(_._1), (a, b) => (a, b))
    val ba = knnAvg(tgt.map(_._1), src.map(_._1), (a, b) => (b, a))
    def margin(s0: Long, t0: Long) = cos((s0, t0)) / ((fa(s0) + ba(t0)) / 2.0)
    val fbest = src.map(_._1).map { s0 =>
      s0 -> tgt.map(_._1).maxBy(t0 => (margin(s0, t0), -t0))
    }.toMap
    val bbest = tgt.map(_._1).map { t0 =>
      t0 -> src.map(_._1).maxBy(s0 => (margin(s0, t0), -s0))
    }.toMap
    val expected = fbest.toSeq.collect {
      case (s0, t0) if bbest(t0) == s0 && margin(s0, t0) >= 1.05 =>
        (s0, t0, cos((s0, t0)), margin(s0, t0))
    }.sortBy(_._1)
    val got = Similarity.bitextMine(spark, emb, k = 4, minMargin = 1.05).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("bitextMine output is a partial matching above the margin floor") {
    val rows = Similarity.bitextMine(spark, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "src side not a matching")
    assert(rows.map(_._2).distinct.length == rows.length, "tgt side not a matching")
    assert(rows.forall(_._3 >= 1.05))
    assert(rows.forall { case (s0, t0, _) => s0 % 2 == 0 && t0 % 2 != 0 })
  }

  test("bitextMineIvf: exact regime equals brute row-for-row; narrow probe stays a matching") {
    val brute = Similarity.bitextMine(spark, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val exact = Similarity.bitextMineIvf(spark, emb, nprobe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(exact == brute)
    val narrow = Similarity.bitextMineIvf(spark, emb, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(narrow.map(_._1).distinct.length == narrow.length)
    assert(narrow.map(_._2).distinct.length == narrow.length)
  }
}
