package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer — the GPT-2 merge loop (public
  * algorithm shape: Sennrich et al. 2016, Radford et al. 2019) over a
  * COMMITTED deterministic merge table. A real training-data pipeline
  * measures token budgets in learned subword units, not whitespace
  * words; this is the engine's subword seam. The learned merges.txt is
  * replaced by the fixed public fixture below so the Scala encoder, the
  * DuckDB oracle (q_bpe_encode mirrors the loop with a recursive CTE +
  * list_reduce fold), and the ScalaCheck properties all share one
  * source of truth — swap in a real merge table (same (a, b) rank-order
  * file shape) for production and nothing else changes.
  *
  * Algorithm, per word (canonical greedy loop): start from single
  * characters; repeatedly find the LOWEST-RANK adjacent pair present in
  * the table and merge every occurrence left-to-right non-overlapping;
  * stop when no adjacent pair is in the table. Deterministic: rank
  * totally orders pairs, and the left-to-right pass is order-fixed
  * (BpeSpec pins determinism, losslessness, and the fixed point — no
  * mergeable adjacent pair survives).
  *
  * Pre-tokenization: lowercase, words = maximal [a-z] runs (the GPT-2
  * regex's letter class, simplified to the corpus's ASCII alphabet);
  * everything else separates words and emits nothing. Subword merges
  * never cross word boundaries — encodeDoc(w1 + " " + w2) ==
  * encodeWord(w1) ++ encodeWord(w2) (property-tested).
  */
object BpeMerges {

  /** The committed merge table; rank = index (GPT-2 merges.txt shape). */
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

  // \u0001 pair-key delimiter is safe: tokens are [a-z]+ concatenations
  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](table.size * 2)
    var i = 0
    while (i < table.size) {
      m.put(table(i)._1 + "\u0001" + table(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Greedy-merge one word; appends its subword tokens to `out`. */
  def encodeWord(word: String,
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

  /** All subword tokens of a document, word order preserved. */
  def encodeDoc(text: String): Seq[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = lower.length
    while (i <= n) {
      val c = if (i < n) lower.charAt(i) else ' '
      if (c >= 'a' && c <= 'z') sb.append(c)
      else if (sb.length > 0) { encodeWord(sb.toString, out); sb.setLength(0) }
      i += 1
    }
    out.toSeq
  }
}

/** array<string> of BPE subword tokens of a text column — the whole
  * merge loop in ONE per-row call, codegen'd via the static-call pattern
  * (stays inside whole-stage codegen like the rest of functions/).
  */
case class BpeEncodeTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def computeRow(s: UTF8String): ArrayData = BpeEncodeTokens.compute(s)

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

object BpeEncodeTokens {
  def compute(s: UTF8String): ArrayData = {
    val toks = BpeMerges.encodeDoc(s.toString)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper (same shims path as TextFunctions). */
  def bpeTokens(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShims.column(
      BpeEncodeTokens(org.apache.spark.sql.graft.GraftSqlShims.expression(c)))
}
