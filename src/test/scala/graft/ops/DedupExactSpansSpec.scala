package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Exactness proofs for [[TextDedup.repeatedSpansExact]]:
  *
  *  1. the operator's spans equal a brute-force ALL-PAIRS cross-document
  *     common-prefix enumeration (the suffix-array definition of
  *     "position covered by a repeat >= L", computed naively) on a real
  *     corpus slice — the suffix-array-grade claim, verified not argued;
  *  2. the word-shingle approximation (repeatedSpans, k words) provably
  *     MISSES repeats the exact pass reports: a >= L-char repeat of
  *     fewer than k words, and a repeat starting mid-word;
  *  3. on a fixture where both methods are exact (whole-word-aligned
  *     block repeats of exactly k words), they agree on the covered
  *     words.
  */
class DedupExactSpansSpec extends SparkSpec {

  /** Ground truth by definition: for every cross-document position pair,
    * extend the common prefix; every common extension m >= L covers
    * [i, i+m) and [j, j+m). Islands over the covered-position sets are
    * the expected spans. O(n²) — run on small inputs only.
    */
  private def bruteSpans(docs: Seq[(Long, String)], L: Int): Seq[(Long, Long, Long, Long)] = {
    val covered = scala.collection.mutable.Map[Long, scala.collection.mutable.BitSet]()
    for {
      (da, ta) <- docs; (db, tb) <- docs if da < db
      i <- 0 until ta.length; j <- 0 until tb.length
    } {
      var m = 0
      val max = math.min(ta.length - i, tb.length - j)
      while (m < max && ta(i + m) == tb(j + m)) m += 1
      if (m >= L) {
        val ba = covered.getOrElseUpdate(da, scala.collection.mutable.BitSet())
        val bb = covered.getOrElseUpdate(db, scala.collection.mutable.BitSet())
        var p = i; while (p < i + m) { ba += p; p += 1 }
        p = j; while (p < j + m) { bb += p; p += 1 }
      }
    }
    covered.toSeq.flatMap { case (d, bs) =>
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      bs.toSeq.sorted.foreach { p =>
        if (runs.nonEmpty && runs.last._2 + 1 == p)
          runs(runs.length - 1) = (runs.last._1, p)
        else runs += ((p, p))
      }
      runs.map { case (s, e) => (d, s.toLong, e.toLong, (e - s + 1).toLong) }
    }.sortBy(x => (x._1, x._2))
  }

  private def runExact(df: org.apache.spark.sql.DataFrame, l: Int) =
    TextDedup.repeatedSpansExact(df, l, crossDocOnly = true)
      .orderBy(col("doc_id"), col("span_start")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("exact spans equal the brute-force all-pairs common-prefix enumeration on real docs") {
    // a 12-doc slice KNOWN to contain several cross-doc repeat clusters
    // (0-50-82, 8-12-120-360, 5-450, 16-369) plus uninvolved docs
    val ids = Seq(0L, 5L, 8L, 12L, 16L, 26L, 50L, 82L, 120L, 360L, 369L, 450L)
    val slice = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id").isin(ids: _*)).select(col("doc_id"), col("text"))
    val local = slice.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(local.size == 12)
    val expected = bruteSpans(local, 50)
    val got = runExact(slice, 50)
    assert(got.nonEmpty, "fixture slice must contain cross-doc repeats")
    assert(got == expected,
      s"operator spans must equal the suffix-LCP ground truth:\n got=$got\n exp=$expected")
  }

  test("word-shingle approximation misses a >=50-char repeat of fewer than 10 words; exact finds it") {
    import spark.implicits._
    // the shared block: 5 words x 12 chars = 64 chars >= 50, but only 5
    // words — no 10-word window is ever repeated (the surrounding filler
    // is unique), so repeatedSpans(k=10) returns NOTHING for it
    val block = (0 until 5).map(i => s"sharedblock$i" * 1).mkString(" ")
    assert(block.length >= 50 && block.split(" ").length < 10)
    def filler(tag: String, n: Int) = (0 until n).map(i => s"uniq$tag$i").mkString(" ")
    val docA = s"${filler("a", 15)} $block ${filler("b", 15)}"
    val docB = s"${filler("c", 15)} $block ${filler("d", 15)}"
    val df = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
    val word = TextDedup.repeatedSpans(df, 10, crossDocOnly = true).count()
    assert(word == 0, "the 10-word shingle pass must miss the 5-word repeat")
    val exact = runExact(df, 50)
    assert(exact.map(_._1).toSet == Set(0L, 1L),
      s"exact pass must report the repeat in both docs: $exact")
    assert(exact == bruteSpans(Seq((0L, docA), (1L, docB)), 50))
  }

  test("repeat starting mid-word: word granularity misses it, exact reports it") {
    import spark.implicits._
    // both docs contain the same 60-char tail inside DIFFERENT words:
    // "Xcommon..." vs "Ycommon..." — no word (or word sequence) is ever
    // equal, so any word-granularity pass is blind to it
    val tail = "commonsubstring" * 4 // 60 chars
    def filler(tag: String, n: Int) = (0 until n).map(i => s"pad$tag$i").mkString(" ")
    val docA = s"${filler("a", 12)} X$tail ${filler("b", 12)}"
    val docB = s"${filler("c", 12)} Y$tail ${filler("d", 12)}"
    val df = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
    assert(TextDedup.repeatedSpans(df, 10, crossDocOnly = true).count() == 0)
    assert(TextDedup.repeatedSpans(df, 1, crossDocOnly = true).count() == 0,
      "even 1-word shingles cannot see a mid-word repeat")
    val exact = runExact(df, 50)
    assert(exact.map(_._1).toSet == Set(0L, 1L), s"$exact")
    assert(exact == bruteSpans(Seq((0L, docA), (1L, docB)), 50))
  }

  /** Byte-level ground truth: the same all-pairs common-prefix
    * enumeration over the UTF-8 BYTES — the convention Lee et al.'s
    * ExactSubstr ships. O(n²), small inputs only.
    */
  private def bruteSpansBytes(docs: Seq[(Long, Array[Byte])], L: Int): Seq[(Long, Long, Long, Long)] = {
    val covered = scala.collection.mutable.Map[Long, scala.collection.mutable.BitSet]()
    for {
      (da, ta) <- docs; (db, tb) <- docs if da < db
      i <- 0 until ta.length; j <- 0 until tb.length
    } {
      var m = 0
      val max = math.min(ta.length - i, tb.length - j)
      while (m < max && ta(i + m) == tb(j + m)) m += 1
      if (m >= L) {
        val ba = covered.getOrElseUpdate(da, scala.collection.mutable.BitSet())
        val bb = covered.getOrElseUpdate(db, scala.collection.mutable.BitSet())
        var p = i; while (p < i + m) { ba += p; p += 1 }
        p = j; while (p < j + m) { bb += p; p += 1 }
      }
    }
    covered.toSeq.flatMap { case (d, bs) =>
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      bs.toSeq.sorted.foreach { p =>
        if (runs.nonEmpty && runs.last._2 + 1 == p)
          runs(runs.length - 1) = (runs.last._1, p)
        else runs += ((p, p))
      }
      runs.map { case (s, e) => (d, s.toLong, e.toLong, (e - s + 1).toLong) }
    }.sortBy(x => (x._1, x._2))
  }

  private def runExactBytes(df: org.apache.spark.sql.DataFrame, l: Int) =
    TextDedup.repeatedSpansExactBytes(df, l, crossDocOnly = true)
      .orderBy(col("doc_id"), col("span_start")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("byte-granularity spans equal the byte-level brute force over supplementary-plane text") {
    import spark.implicits._
    // the shared block mixes 1-byte (ASCII), 2-byte (é, à), 3-byte (€)
    // and 4-byte supplementary-plane (😀 U+1F600) code points:
    // 😀(4) d(1) é(2) j(1) à(2) €(3) = 13 bytes per unit
    val block = "😀déjà€" * 8 // 104 bytes >= 50
    assert(block.getBytes("UTF-8").length == 104)
    def filler(tag: String, n: Int) = (0 until n).map(i => s"uq$tag$i").mkString(" ")
    val docA = s"${filler("a", 12)} $block ${filler("b", 12)}"
    val docB = s"${filler("c", 12)} $block ${filler("d", 12)}"
    val df = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
    val expected = bruteSpansBytes(
      Seq((0L, docA.getBytes("UTF-8")), (1L, docB.getBytes("UTF-8"))), 50)
    val got = runExactBytes(df, 50)
    assert(got.nonEmpty, "the multi-byte block must be reported")
    assert(got == expected,
      s"byte spans must equal the byte-level ground truth:\n got=$got\n exp=$expected")
  }

  test("byte offsets diverge from char offsets on multi-byte text and agree on ASCII") {
    import spark.implicits._
    val block = "répéated-block-with-accénts!" * 3 // multi-byte, 84 chars / 93 bytes
    assert(block.getBytes("UTF-8").length > block.length)
    def filler(tag: String, n: Int) = (0 until n).map(i => s"zf$tag$i").mkString(" ")
    // the accented FILLER before the block shifts byte offsets past char
    // offsets, so the two conventions must disagree on span_start
    val docA = s"ééééé ${filler("a", 10)} $block ${filler("b", 10)}"
    val docB = s"ààààà ${filler("c", 10)} $block ${filler("d", 10)}"
    val df = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
    val chars = runExact(df, 50)
    val bytes = runExactBytes(df, 50)
    assert(chars.nonEmpty && bytes.nonEmpty)
    assert(chars.map(_._2) != bytes.map(_._2),
      s"multi-byte prefixes must shift byte offsets: chars=$chars bytes=$bytes")
    // pure-ASCII corpus: the two conventions coincide exactly
    val asciiA = s"${filler("e", 10)} ${"asciiblockrepeat" * 4} ${filler("f", 10)}"
    val asciiB = s"${filler("g", 10)} ${"asciiblockrepeat" * 4} ${filler("h", 10)}"
    val adf = Seq((0L, asciiA), (1L, asciiB)).toDF("doc_id", "text")
    assert(runExact(adf, 50) == runExactBytes(adf, 50))
  }

  test("cacheWindows knob is result-identical (chars and bytes)") {
    val ids = Seq(0L, 5L, 8L, 12L, 50L, 82L, 120L, 360L)
    val slice = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id").isin(ids: _*)).select(col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id"), col("span_start")).collect().toSeq
    val recompute = rows(TextDedup.repeatedSpansExact(slice, 50, crossDocOnly = true))
    val cached = rows(TextDedup.repeatedSpansExact(slice, 50, crossDocOnly = true,
      cacheWindows = true))
    assert(recompute.nonEmpty && recompute == cached)
    val recB = rows(TextDedup.repeatedSpansExactBytes(slice, 50, crossDocOnly = true))
    val cacB = rows(TextDedup.repeatedSpansExactBytes(slice, 50, crossDocOnly = true,
      cacheWindows = true))
    assert(recB.nonEmpty && recB == cacB)
  }

  /** Train↔eval decontamination ground truth: covered positions in
    * TRAIN docs from >= L common extensions with EVAL docs only.
    */
  private def bruteDeconSpans(train: Seq[(Long, String)], eval: Seq[(Long, String)],
      L: Int): Seq[(Long, Long, Long, Long)] = {
    val covered = scala.collection.mutable.Map[Long, scala.collection.mutable.BitSet]()
    for {
      (dt, tt) <- train; (_, te) <- eval
      i <- 0 until tt.length; j <- 0 until te.length
    } {
      var m = 0
      val max = math.min(tt.length - i, te.length - j)
      while (m < max && tt(i + m) == te(j + m)) m += 1
      if (m >= L) {
        val b = covered.getOrElseUpdate(dt, scala.collection.mutable.BitSet())
        var p = i; while (p < i + m) { b += p; p += 1 }
      }
    }
    covered.toSeq.flatMap { case (d, bs) =>
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      bs.toSeq.sorted.foreach { p =>
        if (runs.nonEmpty && runs.last._2 + 1 == p)
          runs(runs.length - 1) = (runs.last._1, p)
        else runs += ((p, p))
      }
      runs.map { case (s, e) => (d, s.toLong, e.toLong, (e - s + 1).toLong) }
    }.sortBy(x => (x._1, x._2))
  }

  test("train-eval exact decontamination: equals brute force; train-train repeats not flagged; eval docs emit nothing") {
    import spark.implicits._
    def filler(tag: String, n: Int) = (0 until n).map(i => s"dc$tag$i").mkString(" ")
    val leak = "leakedevalanswerblock!" * 3 // 66 chars shared train<->eval
    val tt = "traintrainsharedonly!" * 3 // 63 chars shared train<->train ONLY
    // 0 and 97 are eval ids (% 97 == 0); others train
    val docs = Seq(
      (0L, s"${filler("a", 12)} $leak ${filler("b", 12)}"), // eval
      (97L, s"${filler("c", 12)} $leak ${filler("d", 12)}"), // eval (same leak)
      (1L, s"${filler("e", 12)} $leak ${filler("f", 12)} $tt"), // train: leaked + tt
      (2L, s"${filler("g", 12)} $tt ${filler("h", 12)}")) // train: tt only
    val df = docs.toDF("doc_id", "text")
    val gotFull = TextDedup.decontaminateSpansExact(df, col("doc_id") % 97 === 0, 50)
      .orderBy(col("doc_id"), col("span_start")).collect()
    val got = gotFull
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = bruteDeconSpans(
      docs.filter(_._1 % 97 != 0), docs.filter(_._1 % 97 == 0), 50)
    assert(got.nonEmpty && got == expected,
      s"decon spans must equal train-vs-eval ground truth:\n got=$got\n exp=$expected")
    // only the train doc containing the LEAK is flagged; the train-train
    // repeat (tt) is invisible to decontamination, and eval ids never appear
    assert(got.map(_._1).toSet == Set(1L))
    // attribution: BOTH eval docs (0 and 97) carry the leak, min id 0
    gotFull.foreach { r =>
      assert(r.getLong(4) == 2L && r.getLong(5) == 0L,
        s"span must attribute to both eval docs: $r")
    }
    // ...while the corpus-repeat row sees the train-train repeat too
    val corpus = runExact(df, 50)
    assert(corpus.map(_._1).toSet.contains(2L))
  }

  test("contamination scorecard: blast radius and exposure equal a window-set brute force") {
    import spark.implicits._
    def filler(tag: String, n: Int) = (0 until n).map(i => s"sc$tag$i").mkString(" ")
    val leak = "leakedevalanswerblock!" * 3
    val L = 50
    val docs = Seq(
      (0L, s"${filler("a", 12)} $leak ${filler("b", 12)}"), // eval: partially leaked
      (97L, s"$leak"), // eval: the leak IS the doc (high exposure)
      (1L, s"${filler("e", 12)} $leak ${filler("f", 12)}"), // train carrier
      (2L, s"${filler("g", 12)} $leak"), // second train carrier
      (3L, filler("h", 30))) // clean train
    val df = docs.toDF("doc_id", "text")
    def winsOf(t: String) = (0 to t.length - L).map(i => (i.toLong, t.substring(i, i + L)))
    val train = docs.filter(_._1 % 97 != 0)
    val eval = docs.filter(_._1 % 97 == 0)
    val trainWins = train.flatMap { case (d, t) => winsOf(t).map { case (p, c) => (d, p, c) } }
    val evalChunkSet = eval.flatMap(e => winsOf(e._2).map(_._2)).toSet
    val tchunkSet = trainWins.map(_._3).toSet.intersect(evalChunkSet)
    val expected = eval.flatMap { case (eid, et) =>
      val eset = winsOf(et).map(_._2).toSet
      val hits = trainWins.filter(w => eset.contains(w._3))
      if (hits.isEmpty) None else {
        val covered = winsOf(et).count(w => tchunkSet.contains(w._2))
        val total = et.length - L + 1
        Some((eid, hits.map(_._1).distinct.size.toLong, hits.size.toLong,
          hits.map(_._1).min, covered.toLong, total.toLong,
          covered.toDouble / total))
      }
    }.sortBy(_._1)
    val got = TextDedup.decontaminateScorecard(df, col("doc_id") % 97 === 0, L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // the all-leak eval doc is fully exposed; the padded one only partly
    val byId = got.map(r => r._1 -> r._7).toMap
    assert(byId(97L) == 1.0 && byId(0L) > 0.0 && byId(0L) < 1.0)
  }

  test("within-doc repeat: the cross-doc row ignores it, the any-occurrence row reports it") {
    import spark.implicits._
    val block = "selfrepeatblock!" * 4 // 64 chars, repeated twice inside ONE doc
    def filler(tag: String, n: Int) = (0 until n).map(i => s"pw$tag$i").mkString(" ")
    val doc = s"${filler("a", 12)} $block ${filler("b", 12)} $block ${filler("c", 12)}"
    val other = s"${filler("d", 12)} nothing shared here at all ${filler("e", 12)}"
    val df = Seq((0L, doc), (1L, other)).toDF("doc_id", "text")
    assert(TextDedup.repeatedSpansExact(df, 50, crossDocOnly = true).count() == 0,
      "no cross-document repeat exists")
    val any = TextDedup.repeatedSpansExact(df, 50, crossDocOnly = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(any.nonEmpty && any.forall(_._1 == 0L),
      s"the self-repeat must be reported, only in doc 0: ${any.toSeq}")
    // both occurrences of the block are covered
    val a = doc.indexOf(block); val b = doc.indexOf(block, a + 1)
    assert(any.exists { case (_, s, e) => s <= a && a + block.length - 1 <= e })
    assert(any.exists { case (_, s, e) => s <= b && b + block.length - 1 <= e })
  }

  test("where both are exact (aligned 10-word block repeats), word and char passes agree on covered words") {
    import spark.implicits._
    // block = exactly 10 words x 5 chars (59 chars with separators): the
    // word pass's one repeated 10-window IS the block, and the char pass
    // covers the same words
    val block = (0 until 10).map(i => s"blk${i}${(97 + i).toChar}").mkString(" ")
    assert(block.split(" ").forall(_.length == 5) && block.length == 59)
    def filler(tag: String, n: Int) = (0 until n).map(i => s"f$tag$i").mkString(" ")
    val fA = filler("a", 12); val fB = filler("b", 12)
    val fC = filler("c", 12); val fD = filler("d", 12)
    val docA = s"$fA $block $fB"
    val docB = s"$fC $block $fD"
    val df = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
    // words covered per doc by the WORD pass
    val wordSpans = TextDedup.repeatedSpans(df, 10, crossDocOnly = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wordCovered = wordSpans.flatMap { case (d, s, e) =>
      (s to e).map(w => (d, w)) }.toSet
    assert(wordCovered.nonEmpty)
    // words FULLY covered per doc by the EXACT char pass
    def charToWords(doc: Long, text: String, spans: Seq[(Long, Long)]): Set[(Long, Long)] = {
      val bounds = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var start = 0
      text.split(" ").foreach { w =>
        bounds += ((start, start + w.length - 1)); start += w.length + 1
      }
      bounds.zipWithIndex.collect {
        case ((s, e), i) if spans.exists { case (ss, se) => ss <= s && e <= se } =>
          (doc, i.toLong)
      }.toSet
    }
    val exact = runExact(df, 50)
    val exactCovered =
      charToWords(0L, docA, exact.filter(_._1 == 0L).map(x => (x._2, x._3))) ++
        charToWords(1L, docB, exact.filter(_._1 == 1L).map(x => (x._2, x._3)))
    assert(exactCovered == wordCovered,
      s"on the aligned fixture both passes must cover the same words:\n char=$exactCovered\n word=$wordCovered")
  }
}
