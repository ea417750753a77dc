package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins for the trainer-side dataset-prep family (TrainerOps): the
  * packing-efficiency identities, the curriculum-vs-arrival padding win,
  * an independent JVM md5 replay of the FIM rendering, and a brute-force
  * in-memory oracle for the repetition loss mask.
  */
class TrainerOpsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  test("packEfficiency: accounting identities hold on the fixture") {
    val rows = TrainerOps.packEfficiency(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("concat", "pad_max", "bucket_pow2"))
    val total = rows("concat").getLong(4)
    assert(rows.values.forall(_.getLong(4) == total), "corpus total differs across strategies")
    for ((name, r) <- rows) {
      val (seqs, pad) = (r.getLong(1), r.getLong(3))
      assert(pad >= 0, s"$name negative padding")
      assert(r.getDouble(5) == total.toDouble / (total + pad), s"$name efficiency formula")
      if (name == "concat")
        assert(seqs * 256L == total + pad, "concat: seqs*L == total+pad")
      else assert(r.getLong(2) == 0L, s"$name must not mix documents")
    }
    // the strategy ordering that motivates the audit: concat pads least,
    // pad-to-max pads most, pow2 bucketing sits between
    assert(rows("concat").getLong(3) <= rows("bucket_pow2").getLong(3))
    assert(rows("bucket_pow2").getLong(3) <= rows("pad_max").getLong(3))
    // pad_max and bucket_pow2 cut per doc: same sequence count
    assert(rows("pad_max").getLong(1) == rows("bucket_pow2").getLong(1))
    // concat mixes at least one sequence on a 500-doc fixture with
    // avg doc length well under L
    assert(rows("concat").getLong(2) > 0L)
  }

  test("lengthCurriculum: schedules partition the corpus; curriculum pads less") {
    val out = TrainerOps.lengthCurriculum(docs).collect()
    val bySched = out.groupBy(_.getString(0))
    assert(bySched.keySet == Set("curriculum", "arrival"))
    val nDocs = docs.count()
    for ((sched, rows) <- bySched) {
      assert(rows.map(_.getLong(2)).sum == nDocs, s"$sched drops docs")
      assert(rows.forall(_.getLong(2) <= 32L), s"$sched oversized batch")
      rows.foreach { r =>
        assert(r.getLong(6) == r.getLong(4) * r.getLong(2) - r.getLong(5),
          s"$sched pad formula")
      }
    }
    // curriculum batches are length-contiguous: each batch's min >= the
    // previous batch's max is too strong under ties split across batches,
    // but min >= previous min always holds
    val cur = bySched("curriculum").sortBy(_.getLong(1))
    assert(cur.map(_.getLong(3)).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // the point of the schedule, on this fixture: less padding than arrival
    val padC = cur.map(_.getLong(6)).sum
    val padA = bySched("arrival").map(_.getLong(6)).sum
    assert(padC < padA, s"curriculum $padC should pad less than arrival $padA")
  }

  test("fimTransform: segment lengths re-assemble and an independent md5 replay agrees") {
    val out = TrainerOps.fimTransform(docs).collect()
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == texts.size)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(8), 16)
    var applied = 0
    out.foreach { r =>
      val id = r.getLong(0)
      val ws = texts(id).split(" ", -1)
      val n = ws.length.toLong
      val (fa, np, nm, ns) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np + nm + ns == n, s"doc $id segments don't cover the text")
      if (fa == 1L) {
        applied += 1
        val a = h32(s"fima:$id") % (n + 1)
        val b = a + h32(s"fimb:$id") % (n - a + 1)
        assert(np == a && nm == b - a && ns == n - b, s"doc $id cut points")
        val psm = "<PRE> " + ws.slice(0, a.toInt).mkString(" ") +
          " <SUF> " + ws.slice(b.toInt, n.toInt).mkString(" ") +
          " <MID> " + ws.slice(a.toInt, b.toInt).mkString(" ")
        assert(r.getString(5) == md5hex(psm), s"doc $id PSM md5 mismatch")
      } else {
        assert(h32(s"fim:$id") % 2 == 1, s"doc $id coin disagrees")
        assert(r.getString(5) == md5hex(texts(id)), s"doc $id passthrough md5")
      }
    }
    // the coin is a fair md5 bit: both arms populated on 500 docs
    assert(applied > 100 && applied < 400, s"suspicious FIM rate: $applied/500")
  }

  test("packRepetitionMask: equals a brute-force in-memory replay") {
    val k = 10
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .sortBy(_._1)
    // corpus-granularity repeated windows (whole doc when n <= k)
    val wins = texts.flatMap { case (id, ws) =>
      if (ws.length <= k) Seq((id, 0, ws.mkString(" ")))
      else (0 to ws.length - k).map(j => (id, j, ws.slice(j, j + k).mkString(" ")))
    }
    val dupChunks = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    // per-doc spans via islands, then global positions via offsets
    val offsets = texts.scanLeft(0L) { case (acc, (_, ws)) => acc + ws.length }
    val offByDoc = texts.map(_._1).zip(offsets).toMap
    val positions = texts.flatMap { case (id, ws) =>
      val hitWins = wins.filter(w => w._1 == id && dupChunks(w._3)).map(_._2).sorted
      val covered = hitWins.flatMap(j => j to math.min(j + k - 1, ws.length - 1)).distinct.sorted
      covered.map(offByDoc(id) + _)
    }.sorted
    // islands per 256-token sequence
    val expected = positions.groupBy(_ / 256).toSeq.flatMap { case (seq, ps) =>
      val sorted = ps.sorted
      val islands = sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
        if (acc.nonEmpty && p - acc.last.last == 1) acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      islands.map(is => (seq / 8, seq, is.head, is.last, is.length.toLong))
    }.sortBy(t => (t._2, t._3))
    val got = TrainerOps.packRepetitionMask(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty, "fixture has no repeated spans — pin is vacuous")
    assert(got == expected)
  }

  test("packFirstFit: equals an in-memory FFD replay; no bin overflows") {
    val cap = 256L
    val sized = docs.collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      (id, math.min(r.getAs[String]("text").split(" ", -1).length.toLong, cap),
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(1))
    }
    val expected = sized.groupBy(_._3).toSeq.sortBy(_._1).flatMap { case (b, ds) =>
      val sorted = ds.sortBy { case (id, n, _) => (-n, id) }
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
      sorted.foreach { case (_, n, _) =>
        val i = fills.indexWhere(_ + n <= cap)
        if (i < 0) { fills += n; counts += 1L } else { fills(i) += n; counts(i) += 1L }
      }
      fills.indices.map(i => (b, i.toLong, counts(i), fills(i), cap - fills(i)))
    }
    val got = TrainerOps.packFirstFit(docs, cap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.forall(b => b._4 <= cap && b._5 >= 0))
    // FFD never pads more than per-doc pad-to-max (each doc alone in a bin)
    val effRows = TrainerOps.packEfficiency(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.map(_._5).sum <= effRows("pad_max"))
  }

  test("packSftMask: intervals match a brute-force per-position prompt mask") {
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .sortBy(_._1)
    def h32(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    val offsets = texts.scanLeft(0L)(_ + _._2)
    val positions = texts.zip(offsets).flatMap { case ((id, n), off) =>
      val f = 0.2 + 0.6 * (h32(s"sft:$id").toDouble / 4294967296.0)
      val p = 1L + math.floor((n - 1).toDouble * f).toLong
      (0L until p).map(off + _)
    }.sorted
    val expected = positions.groupBy(_ / 256).toSeq.flatMap { case (seq, ps) =>
      val sorted = ps.sorted
      val islands = sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, x) =>
        if (acc.nonEmpty && x - acc.last.last == 1) acc.init :+ (acc.last :+ x)
        else acc :+ Vector(x)
      }
      islands.map(is => (seq / 8, seq, is.head, is.last, is.length.toLong))
    }.sortBy(t => (t._2, t._3))
    val got = TrainerOps.packSftMask(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // roughly half the corpus is prompt (fractions are uniform on 0.2-0.8)
    val total = texts.map(_._2).sum
    val masked = got.map(_._5).sum
    assert(masked > total * 2 / 5 && masked < total * 3 / 5,
      s"suspicious mask share: $masked of $total")
  }

  test("packAttentionMix: per-sequence pair accounting matches brute force") {
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .sortBy(_._1)
    val offsets = texts.scanLeft(0L)(_ + _._2)
    val perSeq = texts.zip(offsets).flatMap { case ((_, n), off) =>
      (off / 256 to (off + n - 1) / 256).map { seq =>
        seq -> (math.min(off + n, (seq + 1) * 256) - math.max(off, seq * 256))
      }
    }.groupBy(_._1)
    val expected = perSeq.toSeq.map { case (seq, ts) =>
      val t = ts.map(_._2)
      val total = t.sum
      val cross = total * total - t.map(x => x * x).sum
      (seq, t.size.toLong, total, cross, cross.toDouble / (total * total).toDouble)
    }.sortBy(_._1)
    val got = TrainerOps.packAttentionMix(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // the audit's point: most sequences mix docs on this fixture
    assert(got.count(_._4 > 0) > got.size / 2)
  }

  test("packMultimodal: modality split matches brute force and conserves tokens") {
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .sortBy(_._1)
    val sized = texts.map { case (id, nt) =>
      (id, nt, if (id % 3 == 0) 64L else 0L)
    }
    val offsets = sized.scanLeft(0L) { case (acc, (_, nt, img)) => acc + nt + img }
    val perSeq = sized.zip(offsets).flatMap { case ((_, nt, img), off) =>
      val ne = nt + img
      (off / 256 to (off + ne - 1) / 256).map { seq =>
        val it = math.max(math.min(off + img, (seq + 1) * 256) - math.max(off, seq * 256), 0L)
        val tt = math.max(math.min(off + ne, (seq + 1) * 256) - math.max(off + img, seq * 256), 0L)
        (seq, it, tt)
      }
    }.groupBy(_._1)
    val expected = perSeq.toSeq.map { case (seq, xs) =>
      val (it, tt) = (xs.map(_._2).sum, xs.map(_._3).sum)
      (seq, xs.size.toLong, it, tt, it.toDouble / (it + tt).toDouble)
    }.sortBy(_._1)
    val got = TrainerOps.packMultimodal(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    val totalEff = sized.map(t => t._2 + t._3).sum
    assert(got.map(r => r._3 + r._4).sum == totalEff, "token conservation")
    assert(got.exists(_._3 > 0) && got.forall(_._3 <= 256))
  }

  test("spanCorruption: per-doc span geometry matches a JVM md5 replay") {
    def h32(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
    val expected = texts.flatMap { case (id, n) =>
      val hit = (0L until n).filter(i => h32(s"corrupt:$id:$i").toDouble / 4294967296.0 < 0.15)
      if (hit.isEmpty) None
      else {
        val spans = hit.foldLeft(0L -> -2L) { case ((cnt, prev), i) =>
          (if (i - prev > 1) cnt + 1 else cnt, i)
        }._1
        Some((id, n, hit.size.toLong, spans, hit.size.toDouble / spans.toDouble))
      }
    }.sortBy(_._1).toSeq
    val got = TrainerOps.spanCorruption(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // the corruption rate is real: ~15% of all tokens flip
    val total = texts.map(_._2).sum
    val corrupted = got.map(_._3).sum
    assert(corrupted > total / 10 && corrupted < total / 5,
      s"suspicious corruption rate: $corrupted of $total")
  }

  test("fimTransform: adversarial texts (multi-space, Unicode, empties) replay exactly") {
    // the fixture is clean prose; this pins the slice/join/md5 semantics
    // where they could diverge — empty words from consecutive/leading/
    // trailing spaces, multi-byte UTF-8, single-word docs
    val words = Seq("", "a", "héllo", "日本", "x1", "..", "<PRE>")
    val rng = new scala.util.Random(42)
    val texts = (0L until 64L).map { id =>
      val n = 1 + rng.nextInt(9)
      id -> Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
    }
    val spark2 = spark
    import spark2.implicits._
    val df = texts.toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val got = TrainerOps.fimTransform(df).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val ws = texts.find(_._1 == id).get._2.split(" ", -1)
      val n = ws.length.toLong
      if (r.getLong(1) == 1L) {
        val a = h32(s"fima:$id") % (n + 1)
        val b = a + h32(s"fimb:$id") % (n - a + 1)
        val psm = "<PRE> " + ws.slice(0, a.toInt).mkString(" ") +
          " <SUF> " + ws.slice(b.toInt, n.toInt).mkString(" ") +
          " <MID> " + ws.slice(a.toInt, b.toInt).mkString(" ")
        assert(r.getString(5) == md5hex(psm), s"adversarial doc $id")
      } else assert(r.getString(5) == md5hex(texts.find(_._1 == id).get._2))
    }
  }

  test("multi-turn SFT: mask intervals equal a per-position brute-force replay; render md5 pins the bytes") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def coin(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val local = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val B = 256
    // brute force: materialize every token of every rendered doc with its
    // masked flag, in global pack order
    val masked = scala.collection.mutable.ArrayBuffer[Boolean]()
    val renders = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    local.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val n = ws.length
      val t = (2L * (1L + coin(s"sft2:$id") % 3)).toInt
      val toks = scala.collection.mutable.ArrayBuffer[String]()
      (0 until t).foreach { i =>
        val role = if (i % 2 == 0) "user" else "assistant"
        val content = ws.slice((i.toLong * n / t).toInt, ((i + 1).toLong * n / t).toInt)
        toks ++= Seq("<|im_start|>", role); masked ++= Seq(true, true)
        toks ++= content
        toks += "<|im_end|>"
        if (i % 2 == 0) masked ++= Seq.fill(content.length + 1)(true)
        else masked ++= Seq.fill(content.length + 1)(false) // content + im_end train
      }
      renders(id) = (t.toLong, toks.length.toLong, md5hex(toks.mkString(" ")))
      assert(toks.length == 3 * t + n, s"doc $id token accounting")
    }
    // expected intervals: maximal masked runs per sequence
    val expected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    var g = 0
    while (g < masked.length) {
      if (masked(g)) {
        val seq = g / B
        var e = g
        while (e + 1 < masked.length && masked(e + 1) && (e + 1) / B == seq) e += 1
        expected += ((seq / 8L, seq.toLong, g.toLong, e.toLong, (e - g + 1).toLong))
        g = e + 1
      } else g += 1
    }
    val got = TrainerOps.packSftMaskMultiturn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty && got == expected.toSeq,
      s"interval mismatch: got ${got.size}, expected ${expected.size}")
    // render: md5 + counts pin every byte of the template rendering
    val gotR = TrainerOps.sftRenderMultiturn(docs).collect()
    assert(gotR.length == local.length)
    gotR.foreach { r =>
      val (t, nt, h) = renders(r.getLong(0))
      assert(r.getLong(1) == t && r.getLong(2) == nt && r.getString(3) == h,
        s"doc ${r.getLong(0)} render mismatch")
    }
    // both turn counts occur on 500 docs (the coin is md5-fair over 2/4/6)
    assert(gotR.map(_.getLong(1)).distinct.length == 3)
  }

  test("messages seam: parsed nested chat equals the synthesized multiturn rows") {
    // the parser over the synthesized messages column must reproduce the
    // md5-synthesis rows exactly — same turn counts, same offsets, same
    // intervals, same render bytes — proving the seam parses rather than
    // re-deriving
    val msgs = TrainerOps.synthMessages(docs)
    val viaMessages = TrainerOps.packSftMaskMessages(msgs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val viaSynthesis = TrainerOps.packSftMaskMultiturn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(viaMessages.nonEmpty && viaMessages == viaSynthesis)
    val rm = TrainerOps.sftRenderMessages(msgs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val rs = TrainerOps.sftRenderMultiturn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(rm.nonEmpty && rm == rs)
  }

  test("messages seam: system roles and empty contents replay per-position (hand-built chat)") {
    import spark.implicits._
    // two hand-built conversations with a SYSTEM turn (masked wholly,
    // like any non-assistant role) and an empty user content (0 tokens);
    // budget 16 forces boundary splits
    val convs = Seq(
      (0L, Seq(("system", "be very helpful"), ("user", "hi there friend"),
        ("assistant", "hello dear friend"), ("user", ""),
        ("assistant", "ok then"))),
      (1L, Seq(("user", "solve this now"), ("assistant", "the answer is four"))))
    val df = convs.toDF("doc_id", "pairs")
      .selectExpr("doc_id",
        "transform(pairs, p -> named_struct('role', p._1, 'content', p._2)) AS messages")
    val B = 16
    val got = TrainerOps.packSftMaskMessages(df, budget = B.toLong, seqsPerShard = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // brute force: materialize every token with its masked flag in order
    val masked = scala.collection.mutable.ArrayBuffer[Boolean]()
    convs.sortBy(_._1).foreach { case (_, turns) =>
      turns.foreach { case (role, content) =>
        val c = if (content.isEmpty) 0 else content.split(" ", -1).length
        val isA = role == "assistant"
        masked ++= Seq(true, true) // <|im_start|>, role
        masked ++= Seq.fill(c + 1)(!isA) // content + <|im_end|>
      }
    }
    val expected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    var g = 0
    while (g < masked.length) {
      if (masked(g)) {
        val seq = g / B
        var e = g
        while (e + 1 < masked.length && masked(e + 1) && (e + 1) / B == seq) e += 1
        expected += ((seq / 2L, seq.toLong, g.toLong, e.toLong, (e - g + 1).toLong))
        g = e + 1
      } else g += 1
    }
    assert(got == expected.toSeq.sortBy(x => (x._2, x._3)),
      s"got=$got\nexp=${expected.toSeq}")
    // render accounting: empty content contributes 0 tokens
    val byDoc = convs.map { case (id, turns) =>
      (id, (turns.length.toLong,
        turns.map { case (_, c) =>
          3L + (if (c.isEmpty) 0L else c.split(" ", -1).length.toLong) }.sum))
    }.toMap
    val gotR = TrainerOps.sftRenderMessages(df).collect()
    assert(gotR.nonEmpty)
    gotR.foreach { r =>
      val (t, nt) = byDoc(r.getLong(0))
      assert(r.getLong(1) == t && r.getLong(2) == nt, s"doc ${r.getLong(0)}")
    }
  }

  test("prefPairs: equals a brute-force per-prompt argmax/argmin replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def coin(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val local = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = local.map { case (id, text) =>
      val ws = text.split(" ", -1)
      (coin(s"pref:$id") % 97, id, ws.distinct.length.toDouble / ws.length)
    }
    val expected = scored.groupBy(_._1).toSeq.flatMap { case (p, cands) =>
      val best = cands.maxBy { case (_, id, sc) => (sc, -id) }
      val worst = cands.minBy { case (_, id, sc) => (sc, id) }
      if (cands.length >= 2 && best._3 > worst._3)
        Some((p, best._2, worst._2, best._3, worst._3, best._3 - worst._3,
          cands.length.toLong))
      else None
    }.sortBy(_._1)
    val got = TrainerOps.prefPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(got.nonEmpty && got == expected,
      s"got ${got.size} pairs, expected ${expected.size}")
    got.foreach { case (_, c, rj, cs, rs, m, n) =>
      assert(c != rj && cs > rs && m > 0 && n >= 2)
    }
  }

  test("annealMix: phase budgets split 80/20; anneal flattens the mixture toward small sources") {
    val rows = TrainerOps.annealMix(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    val byPhase = rows.groupBy(_._2)
    assert(byPhase.keySet == Set("pretrain", "anneal"))
    val tt = byPhase("pretrain").map(_._3).sum
    val b = tt / 2; val b1 = b * 4 / 5; val b2 = b - b1
    // per-source floors each lose < 1 token
    val s1 = byPhase("pretrain").map(_._5).sum
    val s2 = byPhase("anneal").map(_._5).sum
    assert(s1 <= b1 && s1 >= b1 - byPhase("pretrain").length)
    assert(s2 <= b2 && s2 >= b2 - byPhase("anneal").length)
    // shares sum to 1 within each phase
    byPhase.values.foreach(p => assert(math.abs(p.map(_._4).sum - 1.0) < 1e-9))
    // the flattening: in the anneal phase the SMALLEST source gets a
    // larger share than in pretrain, the largest a smaller one
    val p1 = byPhase("pretrain").map(r => r._1 -> r._4).toMap
    val p2 = byPhase("anneal").map(r => r._1 -> r._4).toMap
    val smallest = byPhase("pretrain").minBy(_._3)._1
    val largest = byPhase("pretrain").maxBy(_._3)._1
    assert(p2(smallest) > p1(smallest), s"anneal must upweight $smallest")
    assert(p2(largest) < p1(largest), s"anneal must downweight $largest")
    // epochs identity
    rows.foreach { case (_, _, nt, _, bt, ep) => assert(ep == bt.toDouble / nt) }
  }

  test("sourceEpochs: budget shares sum to ~tt/2 and epochs identity holds") {
    val rows = TrainerOps.sourceEpochs(docs).collect()
    assert(rows.length >= 2)
    val tt = rows.map(_.getLong(2)).sum
    val budget = rows.map(_.getLong(4)).sum
    // per-source floors can each lose <1 token
    assert(budget <= tt / 2 && budget >= tt / 2 - rows.length)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(r.getDouble(5) == r.getLong(4).toDouble / r.getLong(2).toDouble)
    }
    // the temperature flattening: smaller sources get epochs above the
    // 0.5 uniform rate, larger sources below — spread must be real
    assert(rows.map(_.getDouble(5)).max > rows.map(_.getDouble(5)).min)
  }

  test("doremiMix: arithmetic replays exactly from the KL relation; boost monotone in KL") {
    val kl = StatsOps.klBySource(spark, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(kl.length >= 2)
    // exact JVM replay of the quantize/normalize/budget arithmetic
    val terms = kl.map { case (src, n, k) =>
      (src, n, k, math.floor(n.toDouble * math.exp(10.0 * k) * 1e3).toLong)
    }
    val tw = terms.map(_._4).sum
    val tn = terms.map(_._2).sum
    val expected = terms.map { case (src, n, k, w) =>
      (src, n, k, w.toDouble / tw.toDouble, w * (tn / 2) / tw)
    }.sortBy(_._1).toSeq
    val got = TrainerOps.doremiMix(spark, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected)
    // weights normalize; budgets never exceed the half-corpus target
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9)
    assert(got.map(_._5).sum <= tn / 2)
    // the DoReMi direction: weight/plain-share boost is monotone
    // non-decreasing in excess loss (KL) — high-KL sources upweighted
    // (tolerance covers the <1/n_s quantization slack of the long floor)
    val boosts = got.map(r => (r._3, r._4 / (r._2.toDouble / tn))).sortBy(_._1)
    assert(boosts.zip(boosts.tail).forall { case ((_, b1), (_, b2)) => b1 <= b2 + 0.02 })
    assert(boosts.last._2 > boosts.head._2, "spread must be real")
  }

  test("epochCapMix: exact waterfill replay; budget conservation; caps respected") {
    // sf0.01, not sf0.001: the gate fixture is where the cap band
    // (2269–2705) straddles the 2500 budget and the level binds
    val docs01 = Tables.load(spark, sf001, "documents")
    val got = TrainerOps.epochCapMix(spark, docs01).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(got.length >= 2)
    val nt = got.map(_._2).sum
    val b = nt * 2500L
    // JVM waterfill over the same (n_tokens, cap) inputs
    val sorted = got.sortBy(r => (r._3, r._1))
    var prevC = 0L; var k = -1; var theta = Long.MaxValue
    for ((r, i) <- sorted.zipWithIndex if k < 0) {
      val prevR = sorted.drop(i).map(_._2).sum
      if (b - prevC <= r._3 * prevR) { k = i; theta = (b - prevC) / prevR }
      prevC += r._3 * r._2
    }
    got.foreach { r =>
      val (ea, et) = (math.min(r._3, theta), r._2 * math.min(r._3, theta) / 1000L)
      assert(r._4 == ea && r._5 == et, s"${r._1}: got ${(r._4, r._5)} want ${(ea, et)}")
      assert(r._4 <= r._3, "cap violated")
    }
    // conservation: allocation never exceeds the budget (+ per-source
    // integer-floor slack); if any source is uncapped, the level fills
    // the budget to within the theta-floor slack (< suffix/1000)
    val allocTok = got.map(_._5).sum
    assert(allocTok <= b / 1000L + got.length)
    if (got.exists(r => r._4 < r._3))
      assert(allocTok >= b / 1000L - got.length - nt / 1000L,
        s"level should fill the budget: $allocTok vs ${b / 1000L}")
    // the mixed regime must actually occur on the fixture
    assert(got.exists(r => r._4 == r._3) && got.exists(r => r._4 < r._3),
      "fixture must exercise both capped and level-bound sources")
  }

  test("longCtxMix: upsampling raises the long share but preserves the source token budget") {
    val rows = TrainerOps.longCtxMix(docs).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    for ((src, nDocs, nLong, tt, tl, before, after, rate) <- rows) {
      assert(nLong <= nDocs && tl <= tt)
      assert(before == tl.toDouble / tt)
      val up = tt - tl + 3L * tl
      assert(after == (3L * tl).toDouble / up && rate == tt.toDouble / up)
      // expected tokens after rate-thinning the upsampled stream == the
      // original budget (the domain-mix preservation the paper demands)
      assert(math.abs(rate * up - tt) < 1e-6, s"$src budget drift")
      if (tl > 0 && tl < tt) assert(after > before, s"$src share must rise")
    }
  }

  test("packLongCtx: offsets replay the (doc, epoch) cumsum; long docs appear factor times") {
    val lens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val stream = lens.flatMap { case (d, n) =>
      (0 until (if (n >= 80) 3 else 1)).map(e => (d, e.toLong, n))
    }
    var off = 0L
    val expected = stream.map { case (d, e, n) =>
      val r = (d, e, n, off, off / 1024L); off += n; r
    }.toSeq
    val got = TrainerOps.packLongCtx(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.exists(_._2 == 2L), "fixture must contain long docs")
  }
}
