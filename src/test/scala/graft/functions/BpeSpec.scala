package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import scala.collection.mutable.ArrayBuffer

/** Properties of the BPE merge loop (functions/Bpe.scala). The fold-
  * equivalence property is the load-bearing one: the DuckDB oracle
  * (TextOps.bpeCte) implements each merge pass as a left fold over the
  * token list, while the Scala encoder uses the canonical left-to-right
  * scan — this suite proves the two passes coincide on arbitrary input,
  * which is exactly the argument that makes q_bpe_encode's oracle a
  * faithful mirror rather than a coincidence of the test corpus.
  */
object BpeSpec extends Properties("Bpe") {

  private val tableSet: Set[(String, String)] = BpeMerges.table.toSet
  private val rank: Map[(String, String), Int] =
    BpeMerges.table.zipWithIndex.toMap

  // skew chars toward the merge-table alphabet so merges actually fire,
  // plus uniform a-z for coverage of no-merge paths
  private val chr: Gen[Char] = Gen.frequency(
    3 -> Gen.oneOf("tablescndfvquwiorgkyhp".toSeq),
    1 -> Gen.alphaLowerChar)
  private val word: Gen[String] =
    Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n, chr)).map(_.mkString)
  private val doc: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  private def encodeWord(w: String): Seq[String] = {
    val out = new ArrayBuffer[String]()
    BpeMerges.encodeWord(w, out)
    out.toSeq
  }

  /** Independent reference: one merge pass as the LEFT FOLD the DuckDB
    * oracle uses (acc last-element check), full loop with min-rank pair
    * selection re-derived from the table.
    */
  private def foldReference(w: String): Seq[String] = {
    var toks: Vector[String] = w.map(_.toString).toVector
    var done = false
    while (!done && toks.length > 1) {
      val ranks = toks.zip(toks.tail).flatMap(rank.get)
      if (ranks.isEmpty) done = true
      else {
        val (a, b) = BpeMerges.table(ranks.min)
        toks = toks.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == a && t == b)
            acc.init :+ (a + b)
          else acc :+ t
        }
      }
    }
    toks
  }

  property("deterministic: same input, same tokens") =
    forAll(doc) { t => BpeMerges.encodeDoc(t) == BpeMerges.encodeDoc(t) }

  property("lossless: token concatenation rebuilds the [a-z]+ words") =
    forAll(doc) { t =>
      BpeMerges.encodeDoc(t).mkString ==
        "[a-z]+".r.findAllIn(t.toLowerCase).mkString
    }

  property("fixed point: no adjacent token pair remains mergeable") =
    forAll(word) { w =>
      val toks = encodeWord(w)
      toks.zip(toks.tail).forall(p => !tableSet.contains(p))
    }

  property("merges never cross word boundaries") =
    forAll(word, word) { (w1, w2) =>
      BpeMerges.encodeDoc(w1 + " " + w2) == encodeWord(w1) ++ encodeWord(w2)
    }

  property("scan pass == fold pass (the DuckDB-oracle equivalence)") =
    forAll(word) { w => encodeWord(w) == foldReference(w) }

  property("known merges: table/data/the/agg collapse as designed") =
    forAll(Gen.const(())) { _ =>
      encodeWord("table") == Seq("table") &&
        encodeWord("data") == Seq("data") &&
        encodeWord("the") == Seq("the") &&
        encodeWord("agg") == Seq("a", "gg") &&
        encodeWord("aaa") == Seq("a", "a", "a") // (a,a) is not a merge
    }

  // ---- scale-proof properties: the heap path at a ~4k-merge vocabulary

  private val bigCodec = BpeMerges.big
  // repeat-heavy generator: pathological for overlapping-occurrence
  // handling ("aaaa...") and for the heap's staleness churn
  private val longWord: Gen[String] = for {
    n <- Gen.chooseNum(1, 400)
    mode <- Gen.oneOf(0, 1, 2)
    cs <- mode match {
      case 0 => Gen.listOfN(n, Gen.alphaLowerChar)
      case 1 => Gen.listOfN(n, Gen.oneOf('a', 'b'))
      case 2 => Gen.const(List.fill(n)('a'))
    }
  } yield cs.mkString

  private def encodeHeap(c: BpeCodec, w: String): Seq[String] = {
    val out = new ArrayBuffer[String]()
    c.encodeWord(w, out)
    out.toSeq
  }

  private def encodeRef(c: BpeCodec, w: String): Seq[String] = {
    val out = new ArrayBuffer[String]()
    c.encodeWordReference(w, out)
    out.toSeq
  }

  property("heap path == canonical reference loop (fixture table)") =
    forAll(longWord) { w =>
      encodeHeap(BpeMerges.default, w) == encodeRef(BpeMerges.default, w)
    }

  property("heap path == canonical reference loop (generated 4096-merge table)") =
    forAll(longWord) { w =>
      encodeHeap(bigCodec, w) == encodeRef(bigCodec, w)
    }

  property("per-word op count is LINEAR in word length at the 4096-merge vocab") =
    forAll(longWord) { w =>
      val out = new ArrayBuffer[String]()
      val ops = bigCodec.encodeWord(w, out)
      // lookups + pushes + pops: ≤ (n-1) initial lookups + 1 push each,
      // ≤ n-1 merges x (1 pop + 1 validate + ≤2 lookups + ≤2 pushes),
      // ≤ heap-size stale pops — every term O(n), no n² re-scan anywhere
      ops <= 12L * (w.length + 1)
    }

  property("per-doc op count is linear in doc length (4096-merge vocab)") =
    forAll(Gen.listOf(longWord).map(_.mkString(" "))) { d =>
      val out = new ArrayBuffer[String]()
      val ops = bigCodec.encodeDocCounted(d, out)
      ops <= 12L * (d.length + 1)
    }

  property("generated table: lossless + fixed point at realistic vocab") =
    forAll(longWord) { w =>
      val toks = encodeHeap(bigCodec, w)
      val ts = bigCodec.table.toSet
      toks.mkString == w && toks.zip(toks.tail).forall(p => !ts.contains(p))
    }

  // --- full-charset pre-tokenization (q_bpe_encode_full) ---

  private val anyChr: Gen[Char] = Gen.frequency(
    4 -> Gen.alphaLowerChar,
    2 -> Gen.alphaUpperChar,
    2 -> Gen.numChar,
    2 -> Gen.oneOf(" \t\n\r".toSeq),
    2 -> Gen.oneOf("#:,%!.()[]{}'\"@&*-_=+/<>".toSeq),
    1 -> Gen.oneOf("éïü—№日本¥œß".toSeq))
  private val anyDoc: Gen[String] = Gen.listOf(anyChr).map(_.mkString)

  private def asciiLower(s: String): String =
    s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  /** Inverse of the byte fallback: <0xNN> runs decode as UTF-8, word
    * tokens concatenate verbatim.
    */
  private def decodeFull(toks: Seq[String]): String = {
    val sb = new StringBuilder
    val bytes = ArrayBuffer.empty[Byte]
    def flush(): Unit = if (bytes.nonEmpty) {
      sb.append(new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8))
      bytes.clear()
    }
    toks.foreach { t =>
      if (t.length == 6 && t.startsWith("<0x") && t.endsWith(">"))
        bytes += Integer.parseInt(t.substring(3, 5), 16).toByte
      else { flush(); sb.append(t) }
    }
    flush()
    sb.toString
  }

  private def encodeFull(d: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    BpeMerges.default.encodeDocFull(d, out)
    out.toSeq
  }

  property("full charset: lossless up to ASCII case and whitespace") =
    forAll(anyDoc) { d =>
      // decode(tokens) rebuilds the ascii-lowered input with ASCII
      // whitespace removed — NOTHING else is dropped (the property the
      // [a-z]-only path lacks by design)
      decodeFull(encodeFull(d)) ==
        asciiLower(d).filterNot(c => c == ' ' || c == '\t' || c == '\n' || c == '\r')
    }

  property("full charset: agrees with encodeDoc on pure [a-z ] text") =
    forAll(doc) { d => encodeFull(d) == BpeMerges.default.encodeDoc(d) }

  property("full charset: surrogate pair encodes as one 4-byte fallback") = {
    val g = new String(Character.toChars(0x1D11E)) // 𝄞 MUSICAL SYMBOL G CLEF
    encodeFull(g) == Seq("<0xF0>", "<0x9D>", "<0x84>", "<0x9E>")
  }

  property("full charset: op count linear in doc length") =
    forAll(anyDoc) { d =>
      val out = ArrayBuffer.empty[String]
      val ops = BpeMerges.default.encodeDocFull(d, out)
      ops <= 12L * (4L * d.length + 1)
    }

  // --- round-trip (byte-exact) pre-tokenization (q_bpe_encode_roundtrip) ---

  // full Unicode incl. supplementary planes and whitespace runs — the
  // round-trip domain (valid code points only: an unpaired surrogate has
  // no UTF-8 encoding, so no byte-level tokenizer can round-trip it)
  private val anyCp: Gen[String] = Gen.frequency(
    8 -> anyChr.map(_.toString),
    1 -> Gen.oneOf(0x1F600, 0x1D11E, 0x2070E, 0x10348)
      .map(cp => new String(Character.toChars(cp))),
    1 -> Gen.const(" "))
  private val unicodeDoc: Gen[String] = Gen.listOf(anyCp).map(_.mkString)

  private def encodeExact(codec: BpeCodec, d: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    codec.encodeDocExact(d, out)
    out.toSeq
  }

  property("round trip: decode(encodeExact(s)) == s over full Unicode") =
    forAll(unicodeDoc) { d =>
      BpeCodec.decodeTokens(encodeExact(BpeMerges.default, d)) == d
    }

  property("round trip holds at realistic vocab (generated 4096-merge table)") =
    forAll(unicodeDoc) { d =>
      BpeCodec.decodeTokens(encodeExact(bigCodec, d)) == d
    }

  property("exact mode: ' word' glues as one unit opening with <0x20>") =
    forAll(word, word) { (w1, w2) =>
      // committed tables hold no <0x20> merges, so the glue token stays
      // whole and each word merges exactly as its unglued encode
      encodeExact(BpeMerges.default, w1 + " " + w2) ==
        encodeWord(w1) ++ ("<0x20>" +: encodeWord(w2))
    }

  property("exact mode: whitespace run — only the LAST space glues") =
    forAll(word) { w =>
      encodeExact(BpeMerges.default, "  " + w) ==
        Seq("<0x20>") ++ ("<0x20>" +: encodeWord(w))
    }

  property("exact mode: agrees with encodeDoc modulo glue on [a-z ] text") =
    forAll(doc) { d =>
      encodeExact(BpeMerges.default, d).filterNot(_ == "<0x20>") ==
        BpeMerges.default.encodeDoc(d)
    }

  property("vocab: token(id(t)) == t for every emittable exact-mode token") =
    forAll(unicodeDoc) { d =>
      val vocab = new BpeVocab(BpeMerges.table)
      encodeExact(BpeMerges.default, d).forall(t => vocab.token(vocab.id(t)) == t)
    }

  property("ids round trip: packed-id stream detokenizes to the input") =
    forAll(unicodeDoc) { d =>
      val vocab = new BpeVocab(BpeMerges.table)
      val ids = encodeExact(BpeMerges.default, d).map(vocab.id)
      BpeCodec.decodeTokens(ids.map(vocab.token)) == d
    }

  // --- trainer (q_bpe_train) ---

  property("trainer: hand-computed merges on a fixed histogram") = {
    // "abab"x2 + "ab": (a,b) = 2*2+1 = 5 beats (b,a) = 2; after merging,
    // (ab,ab) = 2 is the only pair left -> exactly two merges learnable
    val got = BpeTrainer.train(Seq("abab" -> 2L, "ab" -> 1L), 5)
    got == Seq((0, "a", "b", 5L), (1, "ab", "ab", 2L))
  }

  property("trainer: tie on count breaks to the (a, b)-lexicographic pair") = {
    // (b,a) and (a,c) both appear once; (a,c) < (b,a) lexicographically
    val got = BpeTrainer.train(Seq("ba" -> 1L, "ac" -> 1L), 1)
    got == Seq((0, "a", "c", 1L))
  }

  property("trainer: components of every merge exist before their use") =
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      // the valid-table invariant BpeCodec's heap encoder relies on: each
      // side of merge i is a single char or the product of some merge j < i
      val hist = ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
      val merges = BpeTrainer.train(hist, 8)
      merges.zipWithIndex.forall { case ((_, a, b, _), i) =>
        val prior = merges.take(i).map(m => m._2 + m._3).toSet
        (a.length == 1 || prior.contains(a)) &&
          (b.length == 1 || prior.contains(b))
      }
    }

  private val histGen: Gen[Seq[(String, Long)]] =
    Gen.listOf(word).map(_.groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq)

  property("trainer: invariant to histogram order") =
    forAll(histGen) { hist =>
      BpeTrainer.train(hist.reverse, 6) == BpeTrainer.train(hist, 6)
    }

  property("trainUnits: invariant to histogram order (the distributed-agg contract)") =
    forAll(histGen) { hist =>
      val units = hist.map { case (w, c) =>
        (w.toCharArray.map(String.valueOf): IndexedSeq[String], c)
      }
      try BpeTrainer.trainUnits(units.reverse, 6) == BpeTrainer.trainUnits(units, 6)
      catch {
        case e: IllegalArgumentException =>
          e.getMessage.contains("duplicate merge product")
      }
    }

  property("trainer: capped histogram == full when nothing is cut") =
    forAll(histGen) { hist =>
      // the driver-safety bound (TextOps.bpeWordHistogram pushes the same
      // floor + cap into the distributed aggregation): with a floor of 1
      // and a cap at/above the vocabulary size nothing is dropped, and
      // train's order-invariance makes the capped result identical
      val capped = BpeTrainer.capHistogram(hist, 1L, hist.size + 3)
      BpeTrainer.train(capped, 6) == BpeTrainer.train(hist, 6)
    }

  property("trainer: cap keeps the top-N by (count desc, word)") = {
    val hist = Seq("cc" -> 5L, "aa" -> 2L, "bb" -> 2L, "dd" -> 1L)
    BpeTrainer.capHistogram(hist, 2L, 2) == Seq("cc" -> 5L, "aa" -> 2L)
  }

  property("learned tables: sequential rank-order application == greedy encode") =
    // THE equivalence the join-form DuckDB oracles rest on
    // (TextOps.bpeTrainEncodeCtes / bpeTrainUnitsCtes encode via a join
    // against the training chain's final relation, i.e. sequential
    // application, while Spark encodes greedily): for any table a
    // successful train() emits — distinct products, operands formed
    // before use — the two coincide on EVERY word, not just histogram
    // words. A degenerate duplicate-product table fails train() loudly
    // instead (the designed behavior), so the equivalence precondition
    // always holds for learned tables.
    forAll(histGen, Gen.listOf(word)) { (hist, probes) =>
      try {
        val merges = BpeTrainer.train(hist, 8)
        val codec = new BpeCodec(merges.map(m => (m._2, m._3)).toIndexedSeq)
        (hist.map(_._1) ++ probes).forall { w =>
          var toks = w.toCharArray.map(String.valueOf)
          merges.foreach(m => toks = BpeTrainer.applyMerge(toks, m._2, m._3))
          val out = ArrayBuffer.empty[String]
          codec.encodeWord(w, out)
          out.toSeq == toks.toSeq
        }
      } catch {
        case e: IllegalArgumentException =>
          e.getMessage.contains("duplicate merge product")
      }
    }

  property("encodeUnit over chars == encodeWord") =
    forAll(word) { w =>
      val a = ArrayBuffer.empty[String]; val b = ArrayBuffer.empty[String]
      BpeMerges.default.encodeWord(w, a)
      BpeMerges.default.encodeUnit(w.toCharArray.map(String.valueOf), b)
      a == b
    }

  property("byte-level training: digit and byte-token merges learn and fire at encode") = {
    // the q_bpe_train_full seam in miniature: a unit histogram where the
    // full-charset fixture content ("42", "100", é/ï/em-dash byte units)
    // outweighs the letter tail must learn non-letter merges, and
    // encodeDocFull under the learned table must FUSE those tokens
    def unitToks(u: String): IndexedSeq[String] =
      if (u.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
        u.map(String.valueOf)
      else u.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"<0x${b & 0xff}%02X>").toIndexedSeq
    val hist: Seq[(IndexedSeq[String], Long)] = Seq(
      ("42", 50L), ("100", 50L), ("é", 50L), ("—", 50L),
      ("qty", 30L), ("the", 8L), ("table", 5L)
    ).map { case (u, c) => (unitToks(u), c) }
    val merges = BpeTrainer.trainUnits(hist, 8)
    val products = merges.map(m => m._2 + m._3)
    val nonLetter = products.filterNot(_.forall(c => c >= 'a' && c <= 'z'))
    val codec = new BpeCodec(merges.map(m => (m._2, m._3)).toIndexedSeq)
    val out = ArrayBuffer.empty[String]
    codec.encodeDocFull("Qty:42, 100% — é", out)
    // digit runs fused to single tokens; the em-dash's 3 bytes and é's 2
    // bytes fused (they rank above the letter tail at these weights)
    nonLetter.nonEmpty &&
      out.contains("42") && out.contains("100") &&
      out.contains("<0xE2><0x80><0x94>") && out.contains("<0xC3><0xA9>")
  }

  property("trainer: encode with the learned table replays training (fixed corpus)") = {
    // On a deterministic English-ish histogram, encoding a training word
    // with the learned table reproduces the trainer's final tokenization
    // of it (learning order == rank order; BPE's training/encode duality)
    val hist = Seq("the" -> 20L, "then" -> 6L, "they" -> 5L, "table" -> 8L,
      "stable" -> 4L, "data" -> 12L, "tab" -> 3L)
    val merges = BpeTrainer.train(hist, 10)
    val codec = new BpeCodec(merges.map(m => (m._2, m._3)).toIndexedSeq)
    hist.map(_._1).distinct.forall { w =>
      var toks = w.toCharArray.map(String.valueOf)
      merges.foreach(m => toks = BpeTrainer.applyMerge(toks, m._2, m._3))
      val out = ArrayBuffer.empty[String]
      codec.encodeWord(w, out)
      out.toSeq == toks.toSeq
    }
  }
}
