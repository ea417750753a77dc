package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer — the GPT-2 merge loop (public
  * algorithm shape: Sennrich et al. 2016, Radford et al. 2019) over a
  * deterministic merge table. A real training-data pipeline measures
  * token budgets in learned subword units, not whitespace words; this is
  * the engine's subword seam. The learned merges.txt is replaced by
  * committed deterministic tables — the 48-entry fixture (the DuckDB
  * oracle of q_bpe_encode replays it via a recursive CTE + list_reduce
  * from the same source of truth) and a generated ~4k-entry table whose
  * ranks have a CLOSED FORM, so q_bpe_encode_big's oracle computes them
  * arithmetically instead of exploding a literal — swap in a real merge
  * table (same (a, b) rank-order file shape) for production and nothing
  * else changes.
  *
  * Semantics, per word (canonical greedy loop): start from single
  * characters; repeatedly find the LOWEST-RANK adjacent pair present in
  * the table and merge every occurrence left-to-right non-overlapping;
  * stop when no adjacent pair is in the table. Deterministic: rank
  * totally orders pairs, and the left-to-right pass is order-fixed
  * (BpeSpec pins determinism, losslessness, and the fixed point — no
  * mergeable adjacent pair survives).
  *
  * Execution is NOT the naive O(len² · lookup) re-scan loop: encodeWord
  * runs the standard heap + linked-list formulation (lazy-invalidation
  * priority queue of adjacent-pair candidates over doubly-linked token
  * slots) — O(len log len) per word, an op COUNT linear in len
  * (property-pinned) — which is provably the same function: in a valid
  * merge table every pair created by a merge ranks strictly after the
  * merge that formed its fused token, so popping candidates in
  * (rank, position) order with staleness checks replays exactly the
  * canonical "min-rank pair type, all occurrences left-to-right" rounds.
  * The canonical loop is kept as encodeWordReference — the executable
  * spec the property tests compare against.
  *
  * Pre-tokenization: lowercase, words = maximal [a-z] runs (the GPT-2
  * regex's letter class, simplified to the corpus's ASCII alphabet);
  * everything else separates words and emits nothing. Subword merges
  * never cross word boundaries — encodeDoc(w1 + " " + w2) ==
  * encodeWord(w1) ++ encodeWord(w2) (property-tested).
  */
final class BpeCodec(val table: IndexedSeq[(String, String)])
    extends Serializable {

  // \u0001 pair-key delimiter is safe: tokens are [a-z]+ concatenations
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](table.size * 2)
    var i = 0
    while (i < table.size) {
      m.put(table(i)._1 + "\u0001" + table(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** CANONICAL greedy-merge loop (executable spec): per round, find the
    * min-rank adjacent pair by re-scan, merge all occurrences in one
    * left-to-right non-overlapping pass. O(len²·lookup) — kept ONLY as
    * the reference the heap path is property-compared against.
    */
  def encodeWordReference(word: String,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    val n = word.length
    if (n == 0) return
    if (n == 1) { out += word; return }
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    var len = n
    var merging = true
    while (merging && len > 1) {
      var best = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = rank.get(toks(i) + "\u0001" + toks(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Int.MaxValue) merging = false
      else {
        val a = table(best)._1
        val b = table(best)._2
        // one left-to-right non-overlapping pass over ALL occurrences
        var w = 0
        var r = 0
        while (r < len) {
          if (r + 1 < len && toks(r) == a && toks(r + 1) == b) {
            toks(w) = a + b; r += 2
          } else { toks(w) = toks(r); r += 1 }
          w += 1
        }
        len = w
      }
    }
    i = 0
    while (i < len) { out += toks(i); i += 1 }
  }

  /** Production path: heap + linked-list greedy merge, O(len log len)
    * per word. Appends the word's subword tokens to `out`; returns the
    * operation count (rank lookups + heap pushes + pops — the number
    * property-pinned linear in word length).
    */
  def encodeWord(word: String,
      out: scala.collection.mutable.ArrayBuffer[String]): Long = {
    val n = word.length
    if (n == 0) return 0L
    if (n == 1) { out += word; return 1L }
    val init = new Array[String](n)
    var i = 0
    while (i < n) { init(i) = String.valueOf(word.charAt(i)); i += 1 }
    encodeUnit(init, out)
  }

  /** The same heap merge loop over an ARBITRARY initial token array —
    * the unit seam byte-level training needs: a `[a-z0-9]+` run starts
    * from single chars ([[encodeWord]]), a non-word code point starts
    * from its `<0xNN>` UTF-8 byte tokens ([[encodeDocFull]]), and a
    * LEARNED table may carry merges over either alphabet. Committed
    * tables hold no byte pairs, so running the loop over byte units is
    * an exact no-op for them (pinned by the existing full-charset gate
    * rows staying green).
    */
  def encodeUnit(init: Array[String],
      out: scala.collection.mutable.ArrayBuffer[String]): Long = {
    val n = init.length
    if (n == 0) return 0L
    if (n == 1) { out += init(0); return 1L }
    var ops = 0L
    val toks = new Array[String](n)
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      toks(i) = init(i)
      next(i) = if (i + 1 < n) i + 1 else -1
      prev(i) = i - 1
      alive(i) = true
      i += 1
    }
    // candidate = rank << 32 | leftPos: the long ordering IS
    // (rank, position) — min-rank first, leftmost-first on ties, which
    // replays the canonical pass order (see class doc)
    val heap = new java.util.PriorityQueue[java.lang.Long](n)
    def offer(pos: Int): Unit = {
      val j = next(pos)
      if (j >= 0) {
        ops += 1
        val r = rank.get(toks(pos) + "\u0001" + toks(j))
        if (r != null) {
          heap.add(java.lang.Long.valueOf((r.longValue() << 32) | pos.toLong))
          ops += 1
        }
      }
    }
    i = 0
    while (i < n - 1) { offer(i); i += 1 }
    while (!heap.isEmpty) {
      val e = heap.poll().longValue()
      ops += 1
      val r = (e >>> 32).toInt
      val p = (e & 0xffffffffL).toInt
      // staleness check: the slot may be dead or re-paired; ranks are
      // unique per pair type, so a matching CURRENT rank means the
      // current (toks(p), toks(next(p))) is exactly pair r — valid to
      // merge regardless of when the entry was pushed
      if (alive(p)) {
        val q = next(p)
        if (q >= 0) {
          ops += 1
          val cur = rank.get(toks(p) + "\u0001" + toks(q))
          if (cur != null && cur.intValue() == r) {
            toks(p) = toks(p) + toks(q)
            alive(q) = false
            val qq = next(q)
            next(p) = qq
            if (qq >= 0) prev(qq) = p
            // the fused token forms at most two NEW candidate pairs
            val l = prev(p)
            if (l >= 0) offer(l)
            offer(p)
          }
        }
      }
    }
    i = 0
    while (i >= 0 && i < n) {
      if (alive(i)) out += toks(i)
      i = next(i)
    }
    ops
  }

  /** All subword tokens of a document, word order preserved. */
  def encodeDoc(text: String): Seq[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    encodeDocCounted(text, out)
    out.toSeq
  }

  /** encodeDoc + total operation count (for the cost property). */
  def encodeDocCounted(text: String,
      out: scala.collection.mutable.ArrayBuffer[String]): Long = {
    var ops = 0L
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = lower.length
    while (i <= n) {
      val c = if (i < n) lower.charAt(i) else ' '
      if (c >= 'a' && c <= 'z') sb.append(c)
      else if (sb.length > 0) { ops += encodeWord(sb.toString, out); sb.setLength(0) }
      i += 1
    }
    ops
  }

  /** FULL-CHARSET pre-tokenization (the GPT-2 byte-level convention,
    * Radford et al. 2019: nothing in the input is ever dropped) — the
    * fix for the `[a-z]`-only word class undercounting token budgets on
    * real web text:
    *
    *  1. ASCII-lowercase only (A-Z → a-z; everything else untouched —
    *     deliberately locale-free, so Spark and the DuckDB oracle's
    *     `translate` agree on every input).
    *  2. Maximal `[a-z0-9]+` runs are words → the same heap merge loop
    *     (digits ride through: the committed tables carry no digit
    *     pairs, so digits stay single-char tokens until a learned table
    *     includes them).
    *  3. ASCII whitespace (space, tab, LF, CR) separates and emits
    *     nothing.
    *  4. EVERY other code point falls back to its UTF-8 bytes, one
    *     `<0xNN>` token per byte (uppercase hex) — punctuation,
    *     symbols, and non-Latin scripts all count toward budgets
    *     instead of vanishing.
    *
    * Walks by code point (surrogate pairs encode as one unit), so the
    * byte fallback is exactly the UTF-8 encoding of the text. Returns
    * the op count (each code point's byte unit runs the merge loop, so
    * its cost is the unit's heap-loop op count), same contract as
    * [[encodeDocCounted]]. BpeSpec pins: losslessness (tokens rebuild
    * the full input up to ASCII case AND the removed ASCII whitespace —
    * whitespace emits no token, so it is not re-derivable), agreement
    * with [[encodeDoc]] on pure `[a-z ]` text, and linear op count.
    */
  def encodeDocFull(text: String,
      out: scala.collection.mutable.ArrayBuffer[String]): Long = {
    var ops = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = text.length
    while (i < n) {
      val c0 = text.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        sb.append(c); i += 1
      } else {
        if (sb.length > 0) { ops += encodeWord(sb.toString, out); sb.setLength(0) }
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else {
          val cp = text.codePointAt(i)
          val bytes = new String(Character.toChars(cp))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          // each non-word code point is ONE merge unit over its byte
          // tokens: learned tables may carry <0xNN>-pair merges (byte-
          // level training); committed tables have none, so this is an
          // exact no-op for them
          val unit = new Array[String](bytes.length)
          var b = 0
          while (b < bytes.length) {
            unit(b) = f"<0x${bytes(b) & 0xff}%02X>"
            b += 1
          }
          ops += encodeUnit(unit, out)
          i += Character.charCount(cp)
        }
      }
    }
    if (sb.length > 0) ops += encodeWord(sb.toString, out)
    ops
  }

  /** ROUND-TRIP (byte-exact) pre-tokenization — the fidelity every
    * production tokenizer has (GPT-2/tiktoken/SentencePiece all
    * round-trip) and [[encodeDocFull]] deliberately traded away: no
    * case folding, no whitespace dropping — EVERY byte of the input is
    * carried by exactly one token, so
    * `BpeCodec.decodeTokens(encode(s)) == s` byte-for-byte
    * (ScalaCheck-pinned over full Unicode incl. whitespace runs).
    * Packed shards built in this mode are lossless: detokenization,
    * exact-substring decontamination audits against packed data, and
    * loss-masking keyed on rendered text all become possible.
    *
    * Unit segmentation (one left-to-right pass, the regex
    * ` ?[a-z0-9]+|[^a-z0-9]` with leftmost-first alternation — shared
    * with the DuckDB oracle):
    *
    *  1. A single space immediately followed by a `[a-z0-9]+` run glues
    *     to it as one merge unit whose first token is `<0x20>` — the
    *     GPT-2 `Ġ` space-prefix convention with the byte token as the
    *     printable rendering (GPT-2's `Ġ` IS byte 0x20 under its
    *     byte-to-unicode table), so a learned table can merge
    *     space+word exactly as production BPE does. Of a whitespace
    *     RUN, only the last space before a word glues; the rest stand
    *     alone (GPT-2's pre-tokenizer does the same).
    *  2. A `[a-z0-9]+` run not preceded by a glued space is a unit of
    *     single-char tokens — the same alphabet committed tables merge
    *     over, so existing merges fire unchanged on lowercase text.
    *  3. EVERY other code point — uppercase (case is DATA here, not
    *     folded), whitespace not glued by rule 1, punctuation,
    *     non-Latin — is one unit of `<0xNN>` UTF-8 byte tokens.
    *
    * The output alphabet is a subset of [[encodeDocFull]]'s
    * ({[a-z0-9] chars} ∪ {byte tokens} ∪ {merge products}), so
    * [[BpeVocab]] ids, the packed-shard writer, and the token-budget
    * ops all take this mode with zero schema change. Same op-count
    * contract as [[encodeDocCounted]].
    */
  def encodeDocExact(text: String,
      out: scala.collection.mutable.ArrayBuffer[String]): Long = {
    var ops = 0L
    var i = 0
    val n = text.length
    def alnum(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    while (i < n) {
      val c = text.charAt(i)
      val glue = c == ' ' && i + 1 < n && alnum(text.charAt(i + 1))
      if (glue || alnum(c)) {
        val start = if (glue) i + 1 else i
        var j = start
        while (j < n && alnum(text.charAt(j))) j += 1
        val len = (j - start) + (if (glue) 1 else 0)
        val unit = new Array[String](len)
        var k = 0
        if (glue) { unit(0) = "<0x20>"; k = 1 }
        var p = start
        while (p < j) { unit(k) = String.valueOf(text.charAt(p)); k += 1; p += 1 }
        ops += encodeUnit(unit, out)
        i = j
      } else {
        val cp = text.codePointAt(i)
        val bytes = new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val unit = new Array[String](bytes.length)
        var b = 0
        while (b < bytes.length) {
          unit(b) = f"<0x${bytes(b) & 0xff}%02X>"
          b += 1
        }
        ops += encodeUnit(unit, out)
        i += Character.charCount(cp)
      }
    }
    ops
  }
}

object BpeCodec {

  /** Detokenize: rebuild the exact input bytes of a token stream. Token
    * strings are concatenations of two atom kinds — `<0xNN>` byte
    * tokens and literal `[a-z0-9]` chars (their own ASCII byte) — and
    * the grammar is prefix-unambiguous ('<' only ever occurs as the
    * head of a byte token: a literal '<' in input text encodes as
    * `<0x3C>`), so one left-to-right scan decodes any token from any
    * mode. For [[BpeCodec.encodeDocExact]] streams the result equals
    * the original text byte-for-byte (the round-trip property); for the
    * lossy modes it rebuilds what they kept.
    */
  def decodeTokens(toks: scala.collection.Seq[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    toks.foreach { t =>
      var i = 0
      val m = t.length
      while (i < m) {
        val c = t.charAt(i)
        if (c == '<' && i + 5 < m && t.charAt(i + 1) == '0' &&
            t.charAt(i + 2) == 'x' && t.charAt(i + 5) == '>') {
          bos.write(Integer.parseInt(t.substring(i + 3, i + 5), 16))
          i += 6
        } else { bos.write(c.toInt); i += 1 }
      }
    }
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}

object BpeMerges {

  /** The committed 48-entry fixture (rank = index, GPT-2 merges.txt
    * shape) — the q_bpe_encode oracle's literal table.
    */
  val table: IndexedSeq[(String, String)] = IndexedSeq(
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("d", "a"), ("da", "ta"),
    ("f", "a"), ("fa", "s"), ("fas", "t"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"),
    ("w", "i"), ("wi", "n"), ("win", "d"), ("wind", "o"), ("windo", "w"),
    ("t", "h"), ("th", "e"),
    ("g", "g"), ("e", "r"), ("o", "r"), ("i", "n"), ("r", "e"), ("s", "t"),
    ("a", "r"), ("o", "n"), ("a", "n"), ("l", "o"), ("lo", "w"), ("c", "h"),
    ("b", "a"), ("o", "w"), ("e", "y"), ("k", "ey"), ("er", "s"))

  /** Deterministic generated merge table at realistic vocabulary scale:
    * the 676 single-char pairs (a,b) in lexicographic order (ranks
    * 0..675), then (2-char, 1-char) pairs ("ab", c) in lexicographic
    * order (rank 676 + idx("ab")*26 + idx(c)) truncated to `n` — VALID
    * as a merges.txt (every fused token a pair references is formed at a
    * strictly earlier rank) and rank-computable in closed form, which is
    * what lets q_bpe_encode_big's DuckDB oracle replay the loop
    * arithmetically instead of via an n-entry literal.
    */
  def generated(n: Int): IndexedSeq[(String, String)] = {
    require(n >= 676 && n <= 676 + 26 * 26 * 26,
      s"generated table size must be in [676, ${676 + 17576}], got $n")
    val az = ('a' to 'z').map(_.toString)
    val level2 = for (a <- az; b <- az) yield (a, b)
    val level3 = for (a <- az; b <- az; c <- az) yield (a + b, c)
    (level2 ++ level3).take(n).toIndexedSeq
  }

  /** The generated-table size q_bpe_encode_big runs at. */
  val GeneratedSize = 4096

  val default: BpeCodec = new BpeCodec(table)
  lazy val big: BpeCodec = new BpeCodec(generated(GeneratedSize))

  /** Back-compat delegates to the fixture codec's production path. */
  def encodeWord(word: String,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    default.encodeWord(word, out); ()
  }

  def encodeDoc(text: String): Seq[String] = default.encodeDoc(text)
}

/** Deterministic token-id vocabulary for a merge table — the id scheme
  * the packed-shard writer (sources.PackedShards) and its DuckDB oracle
  * share: a-z → 0..25, 0-9 → 26..35, byte-fallback `<0xNN>` → 36 + NN
  * (36..291), merge rank r → 292 + r. A codec's output alphabet is
  * exactly {single base chars} ∪ {merge products} ∪ {byte tokens}, and
  * products are distinct strings in every committed table, so the map
  * is total and injective on everything the encoder can emit.
  */
final class BpeVocab(val table: IndexedSeq[(String, String)])
    extends Serializable {
  val MergeIdBase = 292

  @transient private lazy val productId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](table.size * 2)
    var i = 0
    while (i < table.size) {
      // Distinct products are REQUIRED, not assumed: a degenerate learned
      // table could contain two merges with the same product string
      // (e.g. (a,bc) and (ab,c) both yield "abc"), which would make this
      // map non-injective (and the id it assigns dependent on put order —
      // last-wins here vs the DuckDB oracles' first-position rule) AND
      // break the sequential==greedy encode equivalence the trained
      // oracles rest on. Every committed table has distinct products;
      // a learned one that doesn't must fail loudly, not drift.
      val prev = m.put(table(i)._1 + table(i)._2,
        Integer.valueOf(MergeIdBase + i))
      require(prev == null,
        s"duplicate merge product '${table(i)._1 + table(i)._2}' at ranks " +
          s"${prev.intValue() - MergeIdBase} and $i: BpeVocab ids require " +
          "distinct products")
      i += 1
    }
    m
  }

  def id(tok: String): Int = {
    if (tok.length == 1) {
      val c = tok.charAt(0)
      if (c >= 'a' && c <= 'z') return c - 'a'
      if (c >= '0' && c <= '9') return 26 + (c - '0')
    }
    if (tok.length == 6 && tok.charAt(0) == '<' && tok.charAt(1) == '0' &&
        tok.charAt(2) == 'x' && tok.charAt(5) == '>')
      return 36 + Integer.parseInt(tok.substring(3, 5), 16)
    val r = productId.get(tok)
    if (r == null)
      throw new IllegalArgumentException(s"token outside vocabulary: $tok")
    r.intValue()
  }

  /** Inverse of [[id]] — total on [0, 292 + table.size): the id map is
    * injective (distinct products REQUIRED above), so `token(id(t)) == t`
    * for every token the encoder can emit. With it a packed shard built
    * in the exact mode detokenizes: ids → tokens → BpeCodec.decodeTokens
    * rebuilds the original corpus bytes (spec-pinned end-to-end).
    */
  def token(id: Int): String = {
    if (id >= 0 && id < 26) return ('a' + id).toChar.toString
    if (id >= 26 && id < 36) return ('0' + (id - 26)).toChar.toString
    if (id >= 36 && id < MergeIdBase) return f"<0x${id - 36}%02X>"
    val r = id - MergeIdBase
    if (r >= 0 && r < table.size) return table(r)._1 + table(r)._2
    throw new IllegalArgumentException(s"id outside vocabulary: $id")
  }
}

/** Codec registry for BpeEncodeTokens: the expression serializes only the
  * id, executors re-resolve the codec (tables are deterministic, so the
  * resolution is reproducible anywhere).
  */
object BpeCodecs {
  def byId(id: String): BpeCodec = id match {
    case "fixture" => BpeMerges.default
    case "gen4096" => BpeMerges.big
    case other => throw new IllegalArgumentException(s"unknown BPE codec: $other")
  }
}

/** array<string> of BPE subword tokens of a text column — the whole
  * merge loop in ONE per-row call, codegen'd via the static-call pattern
  * (stays inside whole-stage codegen like the rest of functions/).
  */
case class BpeEncodeTokens(child: Expression, codecId: String = "fixture",
    fullCharset: Boolean = false, exact: Boolean = false)
    extends UnaryExpression {
  require(!(fullCharset && exact),
    "fullCharset and exact are distinct pre-tokenization modes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val codec = BpeCodecs.byId(codecId)

  def computeRow(s: UTF8String): ArrayData =
    if (exact) BpeEncodeTokens.computeExact(codec, s)
    else if (fullCharset) BpeEncodeTokens.computeFull(codec, s)
    else BpeEncodeTokens.compute(codec, s)

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val obj = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeTokens].getName)
      s"${ev.value} = $obj.computeRow($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode_tokens"
}

/** array<int> of BPE token IDS of a text column (the [[BpeVocab]] id
  * scheme) — the form a packed training shard stores. Same static-call
  * codegen and heap encoder as [[BpeEncodeTokens]]; the id map is one
  * hash lookup per token on top of the merge loop.
  */
case class BpeEncodeIds(child: Expression, codecId: String = "fixture",
    fullCharset: Boolean = false, exact: Boolean = false)
    extends UnaryExpression {
  require(!(fullCharset && exact),
    "fullCharset and exact are distinct pre-tokenization modes")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val codec = BpeCodecs.byId(codecId)
  @transient private lazy val vocab = new BpeVocab(codec.table)

  def computeRow(s: UTF8String): ArrayData = {
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    if (exact) codec.encodeDocExact(s.toString, toks)
    else if (fullCharset) codec.encodeDocFull(s.toString, toks)
    else codec.encodeDocCounted(s.toString, toks)
    val out = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = vocab.id(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val obj = ctx.addReferenceObj("bpeIds", this, classOf[BpeEncodeIds].getName)
      s"${ev.value} = $obj.computeRow($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode_ids"
}

object BpeEncodeIds {
  def bpeIds(c: Column, codecId: String = "fixture",
      fullCharset: Boolean = false): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeIds(org.apache.spark.sql.graft.GraftSqlShims.expression(c),
        codecId, fullCharset))

  /** Ids in the ROUND-TRIP mode ([[BpeCodec.encodeDocExact]]): packed
    * shards built with this column are byte-lossless — decode the id
    * stream back through the vocab and [[BpeCodec.decodeTokens]]
    * rebuilds the exact input (`<0x20>`-glued words mean id 68 opens
    * every space-prefixed word, the GPT-2 `Ġ` in this id scheme).
    */
  def bpeIdsExact(c: Column, codecId: String = "fixture"): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeIds(org.apache.spark.sql.graft.GraftSqlShims.expression(c),
        codecId, fullCharset = false, exact = true))

  /** Ids under an arbitrary (e.g. just-learned) merge table — the
    * train → pack seam: the learned table rides the serialized
    * expression, and its [[BpeVocab]] assigns merge rank r → 292 + r.
    */
  def bpeIdsWith(c: Column, table: Seq[(String, String)],
      fullCharset: Boolean = false): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeIdsWith(org.apache.spark.sql.graft.GraftSqlShims.expression(c),
        table, fullCharset))
}

/** [[BpeEncodeIds]] with the merge table carried in the expression
  * itself (the [[BpeEncodeTokensWith]] convention for ids).
  */
case class BpeEncodeIdsWith(child: Expression, table: Seq[(String, String)],
    fullCharset: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val codec = new BpeCodec(table.toIndexedSeq)
  @transient private lazy val vocab = new BpeVocab(codec.table)

  def computeRow(s: UTF8String): ArrayData = {
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    if (fullCharset) codec.encodeDocFull(s.toString, toks)
    else codec.encodeDocCounted(s.toString, toks)
    val out = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = vocab.id(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val obj = ctx.addReferenceObj("bpeIdsWith", this,
        classOf[BpeEncodeIdsWith].getName)
      s"${ev.value} = $obj.computeRow($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIdsWith =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode_ids_with"
}

/** Encode with an ARBITRARY merge table carried in the expression itself
  * — the q_bpe_train → encode composition seam: the table the trainer
  * just learned rides the serialized expression to executors (12 pairs
  * for the trained query; a production-sized learned table would get a
  * [[BpeCodecs]] id + broadcast instead). Same static-call codegen and
  * heap encoder as [[BpeEncodeTokens]].
  */
case class BpeEncodeTokensWith(child: Expression, table: Seq[(String, String)],
    fullCharset: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val codec = new BpeCodec(table.toIndexedSeq)

  def computeRow(s: UTF8String): ArrayData =
    if (fullCharset) BpeEncodeTokens.computeFull(codec, s)
    else BpeEncodeTokens.compute(codec, s)

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val obj = ctx.addReferenceObj("bpeWith", this, classOf[BpeEncodeTokensWith].getName)
      s"${ev.value} = $obj.computeRow($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokensWith =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode_tokens_with"
}

object BpeEncodeTokens {
  def compute(codec: BpeCodec, s: UTF8String): ArrayData = {
    val toks = codec.encodeDoc(s.toString)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def computeFull(codec: BpeCodec, s: UTF8String): ArrayData = {
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    codec.encodeDocFull(s.toString, toks)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def computeExact(codec: BpeCodec, s: UTF8String): ArrayData = {
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    codec.encodeDocExact(s.toString, toks)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper (same shims path as TextFunctions). */
  def bpeTokens(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeTokens(org.apache.spark.sql.graft.GraftSqlShims.expression(c)))

  /** Tokens under an arbitrary (e.g. just-learned) merge table. */
  def bpeTokensWith(c: Column, table: Seq[(String, String)],
      fullCharset: Boolean = false): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeTokensWith(org.apache.spark.sql.graft.GraftSqlShims.expression(c),
        table, fullCharset))

  /** Full-charset tokens (byte-fallback pre-tokenization, fixture
    * table) — the budget-accurate tokenizer for real web text.
    */
  def bpeTokensFull(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeTokens(org.apache.spark.sql.graft.GraftSqlShims.expression(c),
        fullCharset = true))

  /** Tokens under the generated 4,096-merge table (q_bpe_encode_big). */
  def bpeTokensBig(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeTokens(org.apache.spark.sql.graft.GraftSqlShims.expression(c),
        codecId = "gen4096"))

  /** ROUND-TRIP tokens ([[BpeCodec.encodeDocExact]]): byte-lossless —
    * [[bpeDecode]] of this column rebuilds the input byte-for-byte.
    */
  def bpeTokensExact(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeTokens(org.apache.spark.sql.graft.GraftSqlShims.expression(c),
        fullCharset = false, exact = true))

  /** Detokenize a token array ([[BpeCodec.decodeTokens]]). */
  def bpeDecode(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeDecodeText(org.apache.spark.sql.graft.GraftSqlShims.expression(c)))

  /** Detokenize a packed ID array ([[BpeDecodeIds]] — vocab inverse then
    * [[BpeCodec.decodeTokens]]; byte-exact for exact-mode shards).
    */
  def bpeDecodeIds(c: Column, codecId: String = "fixture"): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeDecodeIds(org.apache.spark.sql.graft.GraftSqlShims.expression(c), codecId))
}

/** string from array<string> of BPE tokens — [[BpeCodec.decodeTokens]]
  * as a codegen'd expression (static-call pattern): the read half of the
  * round-trip property, and the detokenization seam a loss-masking or
  * decontamination audit runs over packed data.
  */
case class BpeDecodeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  def computeRow(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = a.getUTF8String(i).toString; i += 1 }
    UTF8String.fromString(BpeCodec.decodeTokens(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)))
  }

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val obj = ctx.addReferenceObj("bpeDec", this, classOf[BpeDecodeText].getName)
      s"${ev.value} = $obj.computeRow($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeText =
    copy(child = newChild)

  override def prettyName: String = "bpe_decode_text"
}

/** string from array<int> of packed token IDS — [[BpeVocab.token]]
  * composed with [[BpeCodec.decodeTokens]] in one codegen'd expression:
  * the reader-side seam that turns a shipped exact-mode shard's id
  * stream back into corpus bytes without the ids ever leaving the
  * executor (q_pack_detokenize). The vocab is rebuilt from the codec
  * registry on each executor (tables are deterministic), exactly as the
  * encode expressions resolve their codec.
  */
case class BpeDecodeIds(child: Expression, codecId: String = "fixture")
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val vocab =
    new BpeVocab(BpeCodecs.byId(codecId).table)

  def computeRow(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = vocab.token(a.getInt(i)); i += 1 }
    UTF8String.fromString(BpeCodec.decodeTokens(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)))
  }

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val obj = ctx.addReferenceObj("bpeDecIds", this, classOf[BpeDecodeIds].getName)
      s"${ev.value} = $obj.computeRow($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIds =
    copy(child = newChild)

  override def prettyName: String = "bpe_decode_ids"
}

/** BPE merge-table TRAINING (Sennrich et al. 2016, the other half of the
  * tokenizer seam: [[BpeCodec]] applies a merge table, this learns one).
  *
  * The standard trainer shape — and the reason q_bpe_train's driver-side
  * loop is the DESIGNED scale path, not a shortcut: training operates on
  * the corpus's WORD HISTOGRAM (distinct word → occurrence count), never
  * on documents. The histogram is produced by one distributed
  * aggregation (map-side-combined, the only corpus pass). Its raw size
  * is NOT bounded — distinct word forms on web text (typos,
  * concatenations, romanized foreign text) run to hundreds of millions —
  * so the collect is only safe behind a count floor + top-N cap applied
  * INSIDE the aggregation (TextOps.bpeWordHistogram; [[capHistogram]] is
  * the pure form BpeSpec pins): standard practice (subword-nmt's
  * --min-frequency, HF trainers' limits), and training is invariant to
  * histogram order so the cap's sort changes nothing when nothing is
  * cut. Each merge round is then O(kept vocab) on the driver.
  *
  * Per round: count every adjacent token pair once per occurrence
  * (weighted by word count, overlaps counted per position), pick the
  * most frequent pair — ties broken by (a, b) lexicographic order so the
  * result is deterministic — record it, and apply it to every word
  * left-to-right non-overlapping. The learned table is valid for
  * [[BpeCodec]] by construction: a pair involving a fused token can
  * first be counted only after the round that created the token, so its
  * rank is strictly later (the invariant the heap encoder relies on).
  * The DuckDB oracle replays the SAME rounds as an unrolled CTE chain
  * (pair-count → argmax → list_reduce merge application, the
  * q_bpe_encode machinery), so training sits on the hard gate.
  */
object BpeTrainer {

  /** The pure form of the histogram bound (the DataFrame form lives in
    * TextOps.bpeWordHistogram where it runs inside the distributed
    * aggregation): drop words below `minCount`, keep the top `maxWords`
    * by (count DESC, word ASC) — the deterministic total order a
    * TakeOrderedAndProject realizes. BpeSpec pins that training on the
    * capped histogram equals training on the full one whenever nothing
    * is actually cut (train is order-invariant).
    */
  def capHistogram(hist: Seq[(String, Long)], minCount: Long,
      maxWords: Int): Seq[(String, Long)] =
    hist.filter(_._2 >= minCount)
      .sortBy { case (w, c) => (-c, w) }
      .take(maxWords)

  /** Left-to-right non-overlapping application of one merge. */
  def applyMerge(toks: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += a + b; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Persist a learned merge table as rank-ordered parquet — the
    * merges.txt equivalent, the artifact a training pipeline ships from
    * the tokenizer-learning job to every downstream encode job. Load
    * returns the table in rank order, ready for BpeCodec /
    * BpeEncodeTokensWith; BpeSpec pins the round trip and that encoding
    * through a reloaded table is identical.
    */
  def writeMerges(spark: org.apache.spark.sql.SparkSession, path: String,
      merges: Seq[(Int, String, String, Long)]): Unit = {
    import spark.implicits._
    merges.toDF("rank", "a", "b", "pair_count")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String)
      : IndexedSeq[(String, String)] =
    spark.read.parquet(path)
      .orderBy(org.apache.spark.sql.functions.col("rank"))
      .collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
      .toIndexedSeq

  /** First `numMerges` merges learned from a (word, count) histogram:
    * (rank, a, b, pair_count) with pair_count the weighted adjacent-pair
    * frequency at the time the merge was chosen. Stops early if no
    * adjacent pair remains (tiny corpora). Words start from single
    * chars; [[trainUnits]] is the general form over arbitrary initial
    * token arrays (the byte-level path).
    */
  def train(hist: Seq[(String, Long)], numMerges: Int)
      : Seq[(Int, String, String, Long)] =
    trainUnits(hist.iterator.map { case (w, c) =>
      (w.toCharArray.map(String.valueOf): IndexedSeq[String], c)
    }.toSeq, numMerges)

  /** [[train]] over a histogram of UNITS given as their initial token
    * arrays — the byte-level trainer: a `[a-z0-9]+` run enters as single
    * chars, a non-word code point as its `<0xNN>` byte tokens, so
    * learned merges can contain digit and byte tokens (the GPT-2 /
    * tiktoken byte-level convention the encode side already speaks).
    * Asserts the learned products are DISTINCT: the BpeVocab id map and
    * the oracle equivalence (sequential rank-order application == greedy
    * encode) both require it, and a degenerate corpus that learns two
    * merges with one product must fail loudly rather than drift.
    */
  def trainUnits(hist: Seq[(IndexedSeq[String], Long)], numMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    var words: Array[(Array[String], Long)] =
      hist.iterator.map { case (u, c) => (u.toArray, c) }.toArray
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      words.foreach { case (toks, c) =>
        var i = 0
        while (i + 1 < toks.length) {
          counts.merge((toks(i), toks(i + 1)), java.lang.Long.valueOf(c),
            (x, y) => java.lang.Long.valueOf(x.longValue() + y.longValue()))
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        counts.forEach { (k, v) =>
          val c = v.longValue()
          if (c > bestC || (c == bestC &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestC = c
          }
        }
        out += ((r, best._1, best._2, bestC))
        words = words.map { case (toks, c) =>
          (applyMerge(toks, best._1, best._2), c)
        }
        r += 1
      }
    }
    val learned = out.result()
    val products = learned.map(m => m._2 + m._3)
    require(products.distinct.size == products.size,
      s"learned merge table has duplicate products: " +
        products.diff(products.distinct).distinct.mkString(", "))
    learned
  }
}
