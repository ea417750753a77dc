package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Text-analysis operators over `documents`: quality scoring, token
  * counting, language-ID voting, document fingerprinting, and
  * token-budget sharding (builder brief "text analysis"; SURVEY.md §2.2
  * string/NS rows). All per-row expressions — zero shuffles except the
  * declared final sorts and the two-phase shard offsets — so these
  * stream at input bandwidth on a cluster.
  */
object TextOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Tiny stopword list drawn from the synthetic vocabulary. */
  val stopwords: Seq[String] = Seq("the", "a")

  /** Token-budget sharding (training-data packing): documents, in doc_id
    * order, are assigned to contiguous shards of `budget` tokens by their
    * global starting token offset. The global running sum is computed in
    * the two-phase shape that survives 100 TB: per-chunk token totals
    * (one small aggregate), a prefix sum over the FEW chunk rows (the
    * only single-partition window, O(|chunks|)), broadcast back, then a
    * per-chunk window for the within-chunk offsets — no global
    * single-partition scan of the data ever happens.
    */
  def tokenShards(docs: DataFrame, budget: Long = 4096L,
      docsPerChunk: Long = 1024L,
      nTokens: org.apache.spark.sql.Column =
        size(split(col("text"), " ")).cast(LongType),
      chunksPerSuper: Long = graft.sources.PackedShards.ChunksPerSuper)
      : DataFrame = {
    // persisted: both the chunk totals and the join probe side read it,
    // and cross-subtree plans re-execute (no CSE) — without this the
    // text-splitting scan runs twice
    val sized = docs
      .select(col("doc_id"), nTokens.as("n_tokens"))
      .withColumn("chunk", floor(col("doc_id") / docsPerChunk))
      .persist()
    // two-level chunk-offset spine (PackedShards.chunkOffsetSpine): the
    // single-level global window here was a serial stage over ~10^8 rows
    // at the 10^11-doc design point
    val chunkOffsets = graft.sources.PackedShards.chunkOffsetSpine(
      sized.groupBy(col("chunk")).agg(sum(col("n_tokens")).as("cs")),
      baseOffset = 0L, chunksPerSuper = chunksPerSuper)
    val wIn = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = sized.join(broadcast(chunkOffsets), Seq("chunk"))
      .withColumn("offset",
        col("chunk_off") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("offset"),
        // integer `div`, not floor(double /): past ~2^53 total tokens a
        // double offset loses integer precision and misassigns shards —
        // the 100 TB corpus this targets crosses that line
        expr(s"offset div ${budget}L").as("shard"))
      .localCheckpoint()
    sized.unpersist()
    out
  }

  /** Token-level contamination audit of the PACKED training artifact:
    * encode the train corpus with the committed codec, lay the ids out
    * in pack order (same two-level offset spine the writer uses), and
    * find every `ngram`-token-id window that also occurs in an eval
    * doc's encoding — the audit a lab runs against the artifact it
    * actually TRAINS on, not the raw text it started from (raw-text
    * decontamination misses leaks that normalization introduces;
    * token-id grams are what the model sees). One row per contaminated
    * (shard, seq): window-hit count, distinct eval/train docs involved,
    * and the first contaminated global position — the coordinates a
    * re-pack or loss-mask pass needs. Windows are attributed to the
    * sequence their FIRST token lands in. Scale shape: eval grams are
    * tiny by construction and BROADCAST; the train side explodes to
    * (8-byte gram hash, position) pairs map-side — the corpus text
    * never shuffles — and the offset spine is the parallel two-level
    * tokenShards one.
    */
  def packDecontaminate(docs: DataFrame,
      isEval: org.apache.spark.sql.Column, ngram: Int = 5,
      budget: Long = 256L, seqsPerShard: Long = 8L): DataFrame = {
    val base = packContaminationHits(docs, isEval, ngram, budget)
      .withColumn("seq", expr(s"pos div ${budget}L"))
      .withColumn("shard", expr(s"seq div ${seqsPerShard}L"))
    // TWO countDistincts in one aggregate trigger the Expand-based
    // distinct rewrite, whose group order is session-dependent (exprId
    // hashing) — it flipped the plan fingerprint run-over-run. One
    // distinct per aggregate plans deterministically; the extra join is
    // over hit-bounded keys.
    val a1 = base.groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("eval_id")).as("n_eval_docs"),
        min(col("pos")).as("first_pos"))
    val a2 = base.groupBy(col("shard"), col("seq"))
      .agg(countDistinct(col("doc_id")).as("n_train_docs"))
    a1.join(a2, Seq("shard", "seq"))
      .select(col("shard"), col("seq"), col("n_hits"),
        col("n_eval_docs"), col("n_train_docs"), col("first_pos"))
      .orderBy(col("shard"), col("seq"))
  }

  /** The shared contamination-hit relation of [[packDecontaminate]] and
    * [[packLossMask]]: one row per (train window, eval doc) whose
    * `ngram`-token-id window occurs in both — (pos, doc_id, eval_id)
    * with pos the window's FIRST global pack position. Checkpointed so
    * callers can aggregate it freely after the encode scan unpersists.
    */
  private def packContaminationHits(docs: DataFrame,
      isEval: org.apache.spark.sql.Column, ngram: Int,
      budget: Long): DataFrame = {
    val enc = docs.withColumn("is_eval", isEval)
      .select(col("doc_id"), col("is_eval"),
        graft.functions.BpeEncodeIds.bpeIds(col("text")).as("tids"))
      .persist() // eval grams, train grams, and the offset spine read it
    val train = enc.filter(!col("is_eval"))
    // per-doc pack offsets over the TRAIN corpus in doc_id order — the
    // exact layout q_pack_shards ships
    val offs = tokenShards(train, budget,
        nTokens = size(col("tids")).cast(LongType))
      .select(col("doc_id"), col("offset"))
    // per-doc id windows; docs shorter than the window contribute none
    // (posexplode drops the empty array)
    def grams(df: DataFrame): DataFrame = df
      .select(df.columns.map(col) :+
        posexplode(expr(
          s"""CASE WHEN size(tids) >= $ngram
                THEN transform(sequence(0, size(tids) - $ngram),
                       j -> xxhash64(array_join(slice(tids, j + 1, $ngram), ':')))
                ELSE CAST(array() AS ARRAY<BIGINT>) END"""))
          .as(Seq("widx", "gh")): _*)
    val evalG = grams(enc.filter(col("is_eval")))
      .select(col("gh"), col("doc_id").as("eval_id")).distinct()
    // hit FIRST, offsets SECOND: the gram stream (computed map-side from
    // the scan) meets the broadcast eval set before anything shuffles, so
    // the doc-level offset join sees only the HIT set — at production
    // leak rates a vanishing fraction of the corpus — and the token
    // arrays never enter a shuffle (joining offsets onto the tids-bearing
    // side instead would re-shuffle the tokenized corpus at 10^11 docs)
    val out = grams(train)
      .join(broadcast(evalG), Seq("gh"))
      .select(col("doc_id"), col("widx"), col("eval_id"))
      .join(offs, Seq("doc_id"))
      .select((col("offset") + col("widx")).as("pos"),
        col("doc_id"), col("eval_id"))
      .localCheckpoint()
    enc.unpersist()
    out
  }

  /** The LOSS MASK a trainer applies instead of re-packing: every global
    * pack position covered by a contaminated `ngram` window (the
    * [[packDecontaminate]] hits, positions pos..pos+ngram-1), merged
    * into maximal intervals PER SEQUENCE (trainers mask within a
    * sequence, so an interval crossing a 256-token boundary splits) —
    * (shard, seq, mask_start, mask_end, mask_tokens) in global
    * positions. report → cut (raw text) → audit (artifact) → mask
    * (artifact-level fix without re-shipping a single shard). Covered
    * positions explode ngram-fold from the hit set (hit-bounded, tiny
    * vs the corpus); the island window partitions by seq — at most
    * `budget` rows per partition by construction.
    */
  def packLossMask(docs: DataFrame,
      isEval: org.apache.spark.sql.Column, ngram: Int = 5,
      budget: Long = 256L, seqsPerShard: Long = 8L): DataFrame = {
    val cov = packContaminationHits(docs, isEval, ngram, budget)
      .select(explode(expr(s"sequence(pos, pos + ${ngram - 1})")).as("p"))
      .distinct()
      .withColumn("seq", expr(s"p div ${budget}L"))
    val w = Window.partitionBy(col("seq")).orderBy(col("p"))
    cov
      .withColumn("prev", lag(col("p"), 1).over(w))
      .withColumn("ni",
        when(col("prev").isNull || col("p") - col("prev") > 1L, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(expr(s"seq div ${seqsPerShard}L").as("shard"), col("seq"),
        col("island"))
      .agg(min(col("p")).as("mask_start"), max(col("p")).as("mask_end"),
        count(lit(1)).as("mask_tokens"))
      .select(col("shard"), col("seq"), col("mask_start"), col("mask_end"),
        col("mask_tokens"))
      .orderBy(col("seq"), col("mask_start"))
  }

  /** Token-exact PROVENANCE of the packed artifact: how many subword
    * tokens (and contributing documents) each shard draws from each
    * source — the dataset-card-grade readout a lab publishes per
    * artifact and the input to any per-source sampling audit. A
    * document's tokens occupy the contiguous interval
    * [offset, offset+n) of the global stream, so its contribution to a
    * shard is pure interval arithmetic — no per-token rows ever
    * materialize: the corpus encodes once (codegen, map-side), the
    * two-level spine prices the offsets, and each doc explodes to only
    * the handful of shards it touches (≥1 row per doc, ~n/shardTokens
    * more for docs spanning boundaries).
    */
  def shardProvenance(docs: DataFrame, budget: Long = 256L,
      seqsPerShard: Long = 8L,
      shuffleSeed: Option[String] = None): DataFrame = {
    val S = budget * seqsPerShard // tokens per shard
    val enc = docs.select(col("doc_id"), col("source"),
      graft.functions.BpeEncodeIds.bpeIds(col("text")).as("tids"))
    // offsets in the layout under audit: doc_id order (the plain pack)
    // or the md5(seed:doc_id) epochShuffle permutation (the artifact a
    // training run actually ships)
    val offs = shuffleSeed match {
      case Some(seed) => graft.sources.PackedShards
        .shuffledOffsets(docs,
          graft.functions.BpeEncodeIds.bpeIds(col("text")), seed)
        .select(col("doc_id"), col("n_tokens"), col("offset"))
      case None => tokenShards(enc, budget,
        nTokens = size(col("tids")).cast(LongType))
    }
    offs.join(enc.select(col("doc_id"), col("source")), Seq("doc_id"))
      .filter(col("n_tokens") > 0L)
      .select(col("source"), col("offset"), col("n_tokens"),
        explode(expr(
          s"sequence(offset div ${S}L, (offset + n_tokens - 1) div ${S}L)"))
          .as("shard"))
      .groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("offset") + col("n_tokens"), (col("shard") + 1) * S) -
          greatest(col("offset"), col("shard") * S)).as("n_tokens"))
      .orderBy(col("shard"), col("source"))
  }

  /** DuckDB oracle for [[shardProvenance]]: the BPE replay once, per-doc
    * token counts, the cumulative offset sum in `orderSql` order (doc_id
    * for the plain layout; md5(seed:doc_id), doc_id for the shuffled
    * one — the q_pack_shards_shuffled convention), then the same
    * interval arithmetic per (doc, touched shard).
    */
  private def shardProvenanceOracle(shardTokens: Long,
      orderSql: String = "doc_id"): String =
    s"""$bpeCte,
       sizes AS (SELECT doc_id, CAST(SUM(len(toks)) AS BIGINT) AS nt
                 FROM fin GROUP BY 1),
       offs AS (SELECT doc_id, nt,
                       CAST(SUM(nt) OVER (ORDER BY $orderSql) - nt AS BIGINT) AS off
                FROM sizes),
       ex AS (SELECT d.source, o.off, o.nt,
                     unnest(range(o.off // $shardTokens,
                       (o.off + o.nt - 1) // $shardTokens + 1)) AS shard
              FROM offs o JOIN documents d USING (doc_id))
       SELECT CAST(shard AS BIGINT) AS shard, source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(LEAST(off + nt, (shard + 1) * $shardTokens) -
                       GREATEST(off, shard * $shardTokens)) AS BIGINT) AS n_tokens
       FROM ex GROUP BY 1, 2 ORDER BY 1, 2"""

  /** DuckDB oracle for [[packDecontaminate]]: ONE [[bpeCteOver]] replay
    * over the whole corpus, then per-doc id arrays, train-side offsets
    * as one cumulative sum in doc_id order, gram extraction on
    * ':'-joined id STRINGS (the hash-vs-string convention), the eval
    * equi-join, and the same shard/seq integer arithmetic. `fin` and
    * `darr` are hand-marked MATERIALIZED (darr feeds THREE legs — eval
    * grams, train grams, offsets — and DuckDB re-inlines
    * multiply-referenced CTEs, re-running the whole BPE replay per leg;
    * matCtes can't hint under WITH RECURSIVE, hence by hand).
    */
  private def packContaminationHitsCte(ngram: Int): String = {
    val prods = graft.functions.BpeMerges.table
      .map { case (a, b) => s"'$a$b'" }.mkString("[", ",", "]")
    val matFin = bpeCte.replace("fin AS (", "fin AS MATERIALIZED (")
    s"""$matFin,
       flat AS (SELECT doc_id, wid, generate_subscripts(toks, 1) AS ti,
                       unnest(toks) AS t
                FROM fin),
       dtok AS (SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY wid, ti) - 1 AS dpos,
                       CASE WHEN len(t) = 1 THEN ascii(t) - 97
                            ELSE 291 + list_position($prods, t) END AS tid
                FROM flat),
       darr AS MATERIALIZED (SELECT doc_id, list(tid ORDER BY dpos) AS tids
                FROM dtok GROUP BY 1),
       eg AS (SELECT DISTINCT array_to_string(tids[j+1 : j+$ngram], ':') AS gram,
                     doc_id AS eval_id
              FROM darr, LATERAL (SELECT unnest(range(0,
                     CASE WHEN len(tids) >= $ngram
                          THEN len(tids) - $ngram + 1 ELSE 0 END)) AS j)
              WHERE doc_id % 97 = 0),
       offs AS (SELECT doc_id,
                       CAST(SUM(nt) OVER (ORDER BY doc_id) - nt AS BIGINT) AS off
                FROM (SELECT doc_id, len(tids) AS nt FROM darr
                      WHERE doc_id % 97 <> 0)),
       tg AS (SELECT doc_id, j AS widx,
                     array_to_string(tids[j+1 : j+$ngram], ':') AS gram
              FROM darr, LATERAL (SELECT unnest(range(0,
                     CASE WHEN len(tids) >= $ngram
                          THEN len(tids) - $ngram + 1 ELSE 0 END)) AS j)
              WHERE doc_id % 97 <> 0),
       hit AS (SELECT o.off + t.widx AS pos, t.doc_id, e.eval_id
               FROM tg t JOIN eg e USING (gram)
                    JOIN offs o ON o.doc_id = t.doc_id)"""
  }

  private def packDecontaminateOracle(ngram: Int): String =
    s"""${packContaminationHitsCte(ngram)}
       SELECT CAST((pos // 256) // 8 AS BIGINT) AS shard,
              CAST(pos // 256 AS BIGINT) AS seq,
              CAST(count(*) AS BIGINT) AS n_hits,
              CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_docs,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_train_docs,
              CAST(min(pos) AS BIGINT) AS first_pos
       FROM hit GROUP BY 1, 2 ORDER BY 1, 2"""

  /** DuckDB oracle for [[packLossMask]]: the same hit relation, covered
    * positions expanded ngram-fold and deduped, then
    * per-sequence gaps-and-islands over consecutive positions.
    */
  private def packLossMaskOracle(ngram: Int): String =
    s"""${packContaminationHitsCte(ngram)},
       cov AS (SELECT DISTINCT CAST(p AS BIGINT) AS p
               FROM hit, LATERAL (SELECT unnest(range(pos, pos + $ngram)) AS p)),
       seqp AS (SELECT p, p // 256 AS seq FROM cov),
       misl AS (
         SELECT p, seq,
                SUM(CASE WHEN prev IS NULL OR p - prev > 1 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY seq ORDER BY p) AS island
         FROM (SELECT p, seq, lag(p) OVER (PARTITION BY seq ORDER BY p) AS prev
               FROM seqp))
       SELECT CAST(seq // 8 AS BIGINT) AS shard, CAST(seq AS BIGINT) AS seq,
              CAST(MIN(p) AS BIGINT) AS mask_start,
              CAST(MAX(p) AS BIGINT) AS mask_end,
              CAST(count(*) AS BIGINT) AS mask_tokens
       FROM misl GROUP BY seq, island ORDER BY 2, 3"""

  /** DuckDB mirror of the BPE merge loop (shared by q_bpe_encode and
    * q_pack_sequences_bpe): per (doc, word) a recursive CTE applies one
    * merge per level — the min-rank adjacent pair via list_position over
    * the SAME merge table (generated from BpeMerges.table, one source of
    * truth), the merge itself as a left-fold list_reduce which is
    * provably identical to the canonical left-to-right scan (a merged
    * token a||b is strictly longer than a, so it can never re-match as
    * the left element within the same pass). Validated against an
    * independent Python reference on all 500 sf0.01 docs before landing.
    */
  /** The merge-loop replay CTE over an ARBITRARY (doc_id, text) corpus
    * SELECT — the parameterized form that lets composed-pipeline oracles
    * (q_pipeline_pack: curate → scrub → dedup → pack) run the same BPE
    * replay over their curated survivor set instead of raw documents.
    */
  private[ops] def bpeCteOver(corpus: String): String = {
    val ml = graft.functions.BpeMerges.table
      .map { case (a, b) => s"'$a'||chr(1)||'$b'" }.mkString("[", ",", "]")
    s"""WITH RECURSIVE
       corpus_docs AS ($corpus),
       w0 AS (SELECT doc_id,
                     generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) AS wid,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
              FROM corpus_docs),
       bpe(doc_id, wid, iter, toks) AS (
         SELECT doc_id, wid, 0, regexp_extract_all(word, '.') FROM w0
         UNION ALL
         SELECT doc_id, wid, iter + 1,
           list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, t -> [t])),
             (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = sp[1] AND x[1] = sp[2]
                              THEN list_append(acc[:len(acc)-1], sp[1] || sp[2])
                              ELSE list_append(acc, x[1]) END)
         FROM (SELECT doc_id, wid, iter, toks,
                 string_split($ml[list_min(list_filter(
                    list_transform(range(1, len(toks)),
                      i -> list_position($ml, toks[i] || chr(1) || toks[i+1])),
                    r -> r > 0))], chr(1)) AS sp
               FROM bpe)
         WHERE sp IS NOT NULL
       ),
       fin AS (SELECT doc_id, wid, toks FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id, wid ORDER BY iter DESC) rn
                 FROM bpe) WHERE rn = 1)"""
  }

  private[ops] def bpeCte: String =
    bpeCteOver("SELECT doc_id, text FROM documents")

  /** The reader-side per-shard audit SQL (q_pack_shards /
    * q_pipeline_pack): global token positions from the `fin` relation of
    * a [[bpeCteOver]] replay, BpeVocab ids, then integer sequence/shard
    * arithmetic — appended after a bpeCteOver(...) prefix.
    */
  private[ops] def packShardsTailSql: String = packShardsTailSqlOrdered()

  /** `orderSql` is the global document order the pack lays tokens out
    * in — `doc_id` for the plain writer, `md5('seed:' || doc_id),
    * doc_id` for the shuffled one; within a document it is always
    * (wid, ti).
    */
  private[ops] def packShardsTailSqlOrdered(
      orderSql: String = "doc_id"): String = {
    val prods = graft.functions.BpeMerges.table
      .map { case (a, b) => s"'$a$b'" }.mkString("[", ",", "]")
    s""",
       flat AS (SELECT doc_id, wid, generate_subscripts(toks, 1) AS ti,
                       unnest(toks) AS t
                FROM fin),
       g AS (SELECT doc_id, t,
                    row_number() OVER (ORDER BY $orderSql, wid, ti) - 1 AS pos
             FROM flat),
       ids AS (SELECT doc_id, pos,
                      CASE WHEN len(t) = 1 THEN ascii(t) - 97
                           ELSE 291 + list_position($prods, t) END AS tid
               FROM g),
       seqs AS (SELECT pos // 256 AS seq,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(tid) AS BIGINT) AS ts,
                       CAST(sum(doc_id) AS BIGINT) AS sd,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
                FROM ids GROUP BY 1)
       SELECT CAST(seq // 8 AS BIGINT) AS shard,
              CAST(count(*) AS BIGINT) AS n_seqs,
              CAST(sum(n) AS BIGINT) AS n_tokens,
              CAST(sum(CASE WHEN n = 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
              CAST(sum(ts) AS BIGINT) AS tid_sum,
              CAST(sum(sd) AS BIGINT) AS span_sum,
              CAST(sum(nd) AS BIGINT) AS n_contribs
       FROM seqs GROUP BY 1 ORDER BY 1"""
  }

  /** DuckDB mirror of the BPE loop at the GENERATED ~4k-merge
    * vocabulary (q_bpe_encode_big): same recursive-CTE + list_reduce
    * replay as bpeCte, but the rank of a pair is computed ARITHMETICALLY
    * from the generated table's closed form (676 single-char pairs in
    * lex order, then (2-char, 1-char) pairs at rank
    * 676 + idx(ab)*26 + idx(c), truncated at GeneratedSize) — no
    * n-entry literal, which is the point: the oracle scales to any
    * generated vocabulary size without the CTE text exploding.
    */
  private def bpeCteBig: String = {
    val n = graft.functions.BpeMerges.GeneratedSize
    s"""WITH RECURSIVE
       w0 AS (SELECT doc_id,
                     generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) AS wid,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
              FROM documents),
       bpe(doc_id, wid, iter, toks) AS (
         SELECT doc_id, wid, 0, regexp_extract_all(word, '.') FROM w0
         UNION ALL
         SELECT doc_id, wid, iter + 1,
           list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, t -> [t])),
             (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = sp[1] AND x[1] = sp[2]
                              THEN list_append(acc[:len(acc)-1], sp[1] || sp[2])
                              ELSE list_append(acc, x[1]) END)
         FROM (SELECT doc_id, wid, iter, toks,
                 CASE WHEN mr IS NULL THEN NULL
                      WHEN mr < 676 THEN [chr(97 + mr // 26), chr(97 + mr % 26)]
                      ELSE [chr(97 + (mr - 676) // 676) || chr(97 + ((mr - 676) // 26) % 26),
                            chr(97 + (mr - 676) % 26)] END AS sp
               FROM (SELECT doc_id, wid, iter, toks,
                       list_min(list_filter(
                         list_transform(range(1, len(toks)),
                           i -> CASE
                                  WHEN len(toks[i]) = 1 AND len(toks[i+1]) = 1
                                    THEN (ascii(toks[i]) - 97) * 26 + (ascii(toks[i+1]) - 97)
                                  WHEN len(toks[i]) = 2 AND len(toks[i+1]) = 1
                                       AND 676 + ((ascii(toks[i][1]) - 97) * 26 + (ascii(toks[i][2]) - 97)) * 26
                                           + (ascii(toks[i+1]) - 97) < $n
                                    THEN 676 + ((ascii(toks[i][1]) - 97) * 26 + (ascii(toks[i][2]) - 97)) * 26
                                         + (ascii(toks[i+1]) - 97)
                                  ELSE NULL END),
                         r -> r IS NOT NULL)) AS mr
                     FROM bpe))
         WHERE sp IS NOT NULL
       ),
       fin AS (SELECT doc_id, wid, toks FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id, wid ORDER BY iter DESC) rn
                 FROM bpe) WHERE rn = 1)"""
  }

  /** The deterministic full-charset test suffix (q_bpe_encode_full):
    * appended to every document so the fixture corpus — pure `[a-z ]`
    * text — actually exercises ASCII-case folding ("Qty"), in-word and
    * standalone digits (doc_id, 42, 100), single-byte punctuation
    * (# : , % !), and multi-byte UTF-8 (ï U+00EF, é U+00E9, — U+2014).
    * One string literal shared verbatim by the Spark column and the
    * DuckDB oracle.
    */
  private val FullCharsetSuffix = " Qty:42, naïve café — 100%!"

  /** DuckDB mirror of the FULL-CHARSET BPE encode (q_bpe_encode_full —
    * BpeCodec.encodeDocFull): ASCII-lower via translate (locale-free on
    * both engines), segment the text into `[a-z0-9]+` word runs and
    * single other code points (one ordered regexp pass), run the word
    * runs through the SAME recursive merge CTE as bpeCte (tagged isf=1;
    * the old `[a-z]+`-word tokenization rides the same CTE tagged isf=0
    * so the query can report the exact undercount it fixes), drop ASCII
    * whitespace segments, and explode every remaining code point into
    * `<0xNN>` UTF-8 byte tokens — hex(encode(s)) IS the byte-fallback
    * (uppercase on both engines). Token order is reassembled by segment
    * position, so first_tokens pins the interleaving, not just counts.
    */
  private def bpeCteFull: String = {
    val ml = graft.functions.BpeMerges.table
      .map { case (a, b) => s"'$a'||chr(1)||'$b'" }.mkString("[", ",", "]")
    s"""WITH RECURSIVE
       corp AS (SELECT doc_id,
                  translate(text || ' #' || doc_id || '$FullCharsetSuffix',
                    'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                    'abcdefghijklmnopqrstuvwxyz') AS t
                FROM documents),
       seg AS (SELECT doc_id,
                 generate_subscripts(regexp_extract_all(t, '[a-z0-9]+|[^a-z0-9]'), 1) AS sid,
                 unnest(regexp_extract_all(t, '[a-z0-9]+|[^a-z0-9]')) AS s
               FROM corp),
       w0 AS (SELECT doc_id, 1 AS isf, sid, s AS word FROM seg
              WHERE regexp_matches(s, '^[a-z0-9]+$$')
              UNION ALL
              SELECT doc_id, 0 AS isf,
                     generate_subscripts(regexp_extract_all(t, '[a-z]+'), 1) AS sid,
                     unnest(regexp_extract_all(t, '[a-z]+')) AS word
              FROM corp),
       bpe(doc_id, isf, sid, iter, toks) AS (
         SELECT doc_id, isf, sid, 0, regexp_extract_all(word, '.') FROM w0
         UNION ALL
         SELECT doc_id, isf, sid, iter + 1,
           list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, t -> [t])),
             (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = sp[1] AND x[1] = sp[2]
                              THEN list_append(acc[:len(acc)-1], sp[1] || sp[2])
                              ELSE list_append(acc, x[1]) END)
         FROM (SELECT doc_id, isf, sid, iter, toks,
                 string_split($ml[list_min(list_filter(
                    list_transform(range(1, len(toks)),
                      i -> list_position($ml, toks[i] || chr(1) || toks[i+1])),
                    r -> r > 0))], chr(1)) AS sp
               FROM bpe)
         WHERE sp IS NOT NULL
       ),
       fin AS (SELECT doc_id, isf, sid, toks FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id, isf, sid ORDER BY iter DESC) rn
                 FROM bpe) WHERE rn = 1),
       fb AS (SELECT doc_id, sid,
                list_transform(range(1, octet_length(encode(s)) + 1),
                  i -> '<0x' || substr(hex(encode(s)), 2*i - 1, 2) || '>') AS toks
              FROM seg
              WHERE NOT regexp_matches(s, '^[a-z0-9]+$$')
                AND s NOT IN (' ', chr(9), chr(10), chr(13))),
       strm AS (SELECT doc_id, sid, toks FROM fin WHERE isf = 1
                UNION ALL SELECT doc_id, sid, toks FROM fb),
       agg AS (SELECT doc_id, flatten(list(toks ORDER BY sid)) AS tk
               FROM strm GROUP BY doc_id),
       oldc AS (SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n_letters
                FROM fin WHERE isf = 0 GROUP BY doc_id)"""
  }

  /** The deterministic ROUND-TRIP test suffix (q_bpe_encode_roundtrip):
    * exercises everything the exact mode must carry byte-for-byte that
    * the lossy modes drop — preserved CASE ("Qty", "A B"), a tab, a
    * newline, a double space (only the LAST space of a run glues to the
    * following word), an apostrophe (SQL-literal escaping), a literal
    * '<' (the byte-token head char — pins the decode grammar's
    * disambiguation), and multi-byte UTF-8. One string shared verbatim
    * by the Spark column and the DuckDB oracle (via [[sqlStr]]).
    */
  private val RoundTripSuffix = " Qty:42,\tnaïve's  café —\n100%! <A B>"

  /** A Scala string as a DuckDB E'...' escape-string literal. */
  private def sqlStr(s: String): String =
    "E'" + s.flatMap {
      case '\'' => "''"
      case '\\' => "\\\\"
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    } + "'"

  /** DuckDB mirror of the ROUND-TRIP BPE encode (q_bpe_encode_roundtrip
    * — BpeCodec.encodeDocExact): NO case folding, NO whitespace
    * dropping. Segmentation is one regex pass with leftmost-first
    * alternation (` ?[a-z0-9]+|[^a-z0-9]`, RE2 on both engines): a
    * single space glues to a following alnum run as one unit whose
    * initial token list is '<0x20>' prepended to the run's chars (the
    * GPT-2 Ġ space-prefix convention, byte-token rendering); every
    * other code point — uppercase, ungummed whitespace, punctuation,
    * non-Latin — explodes to its `<0xNN>` UTF-8 byte tokens. Word units
    * run the same recursive merge CTE as bpeCte ('<0x20>' never merges
    * under the fixture table, exactly as in Scala where the committed
    * tables hold no byte pairs).
    */
  private def bpeCteExact: String =
    bpeCteExactOver(
      s"SELECT doc_id, text || ' #' || doc_id || ${sqlStr(RoundTripSuffix)} AS t" +
        " FROM documents")

  /** [[bpeCteExact]] over an arbitrary `(doc_id, t)` corpus SELECT — the
    * parameterized form, so the exact-mode PACK oracle can replay the
    * raw documents while the round-trip row keeps its planted suffix.
    */
  private def bpeCteExactOver(corpus: String): String = {
    val ml = graft.functions.BpeMerges.table
      .map { case (a, b) => s"'$a'||chr(1)||'$b'" }.mkString("[", ",", "]")
    s"""WITH RECURSIVE
       corp AS ($corpus),
       seg AS (SELECT doc_id,
                 generate_subscripts(regexp_extract_all(t, ' ?[a-z0-9]+|[^a-z0-9]'), 1) AS sid,
                 unnest(regexp_extract_all(t, ' ?[a-z0-9]+|[^a-z0-9]')) AS s
               FROM corp),
       w0 AS (SELECT doc_id, sid,
                CASE WHEN s LIKE ' %' THEN substr(s, 2) ELSE s END AS word,
                (s LIKE ' %') AS glue
              FROM seg WHERE regexp_matches(s, '^ ?[a-z0-9]+$$')),
       bpe(doc_id, sid, iter, toks) AS (
         SELECT doc_id, sid, 0,
           CASE WHEN glue THEN list_prepend('<0x20>', regexp_extract_all(word, '.'))
                ELSE regexp_extract_all(word, '.') END
         FROM w0
         UNION ALL
         SELECT doc_id, sid, iter + 1,
           list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, t -> [t])),
             (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = sp[1] AND x[1] = sp[2]
                              THEN list_append(acc[:len(acc)-1], sp[1] || sp[2])
                              ELSE list_append(acc, x[1]) END)
         FROM (SELECT doc_id, sid, iter, toks,
                 string_split($ml[list_min(list_filter(
                    list_transform(range(1, len(toks)),
                      i -> list_position($ml, toks[i] || chr(1) || toks[i+1])),
                    r -> r > 0))], chr(1)) AS sp
               FROM bpe)
         WHERE sp IS NOT NULL
       ),
       fin AS (SELECT doc_id, sid, toks FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id, sid ORDER BY iter DESC) rn
                 FROM bpe) WHERE rn = 1),
       fb AS (SELECT doc_id, sid,
                list_transform(range(1, octet_length(encode(s)) + 1),
                  i -> '<0x' || substr(hex(encode(s)), 2*i - 1, 2) || '>') AS toks
              FROM seg WHERE NOT regexp_matches(s, '^ ?[a-z0-9]+$$')),
       strm AS (SELECT doc_id, sid, toks FROM fin
                UNION ALL SELECT doc_id, sid, toks FROM fb),
       agg AS (SELECT doc_id, flatten(list(toks ORDER BY sid)) AS tk
               FROM strm GROUP BY doc_id)"""
  }

  /** Reader-side audit tail for the EXACT-mode pack
    * (q_pack_shards_exact): global positions from [[bpeCteExactOver]]'s
    * strm relation (doc_id, sid, ti — word units and byte units share
    * one sid space), ids via the exact BpeVocab scheme (a-z → 0..25,
    * 0-9 → 26..35, `<0xNN>` → 36+NN, merge products → 292+rank), then
    * the same integer seq/shard arithmetic as [[packShardsTailSql]].
    */
  private def packShardsExactTailSql: String = {
    val prods = graft.functions.BpeMerges.table
      .map { case (a, b) => s"'$a$b'" }.mkString("[", ",", "]")
    s""",
       flatx AS (SELECT doc_id, sid, generate_subscripts(toks, 1) AS ti,
                        unnest(toks) AS t
                 FROM strm),
       g AS (SELECT doc_id, t,
                    row_number() OVER (ORDER BY doc_id, sid, ti) - 1 AS pos
             FROM flatx),
       ids AS (SELECT doc_id, pos,
                      CASE WHEN len(t) = 1 AND t BETWEEN 'a' AND 'z'
                             THEN ascii(t) - 97
                           WHEN len(t) = 1 THEN 26 + ascii(t) - 48
                           WHEN len(t) = 6 AND t LIKE '<0x%'
                             THEN 36 + 16 * (strpos('0123456789ABCDEF', substr(t, 4, 1)) - 1)
                                     + (strpos('0123456789ABCDEF', substr(t, 5, 1)) - 1)
                           ELSE 291 + list_position($prods, t) END AS tid
               FROM g),
       seqs AS (SELECT pos // 256 AS seq,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(tid) AS BIGINT) AS ts,
                       CAST(sum(doc_id) AS BIGINT) AS sd,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
                FROM ids GROUP BY 1)
       SELECT CAST(seq // 8 AS BIGINT) AS shard,
              CAST(count(*) AS BIGINT) AS n_seqs,
              CAST(sum(n) AS BIGINT) AS n_tokens,
              CAST(sum(CASE WHEN n = 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
              CAST(sum(ts) AS BIGINT) AS tid_sum,
              CAST(sum(sd) AS BIGINT) AS span_sum,
              CAST(sum(nd) AS BIGINT) AS n_contribs
       FROM seqs GROUP BY 1 ORDER BY 1"""
  }

  /** Merges learned by q_bpe_train (and unrolled by its oracle). */
  private val NumTrainMerges = 12

  /** Merges learned by the FULL-CHARSET trainer (q_bpe_train_full /
    * q_bpe_train_encode_full): deep enough that the fixture corpus
    * learns merges past the frequent letter pairs into the digit and
    * byte-token alphabet (BpeSpec pins that at least one learned merge
    * contains a non-letter token on the gate fixture) — the property
    * round-10's letters-only trainer could never exhibit.
    */
  private val NumTrainMergesFull = 48

  /** The full-charset UNIT segmentation both trainer sides share —
    * exactly BpeCodec.encodeDocFull's pre-tokenization as a regex:
    * maximal `[a-z0-9]+` runs, or ONE non-whitespace other code point
    * (ASCII space/tab/LF/CR excluded; the corpus and fixture are BMP, so
    * Java's code-unit and RE2's code-point semantics agree). Units are
    * the merge boundaries: training and encode both operate per unit.
    */
  private val UnitRe = "[a-z0-9]+|[^a-z0-9 \\t\\n\\r]"

  /** Driver-side initial tokens of one unit — the trainUnits input: a
    * word run starts from single chars, anything else is one code
    * point's `<0xNN>` UTF-8 byte tokens (the encodeDocFull convention).
    */
  private def unitTokens(u: String): IndexedSeq[String] =
    if (u.forall(ch => (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')))
      u.map(String.valueOf)
    else
      u.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"<0x${b & 0xff}%02X>").toIndexedSeq

  /** The ASCII-folded derived corpus both full-charset trainer engines
    * read, as Spark column / DuckDB SQL — the q_bpe_encode_full fixture
    * with the suffix planted TWICE: at ×1 the suffix's digit/byte pair
    * counts (~1 per doc) sit below the corpus's ~2-per-doc letter-pair
    * band for 48+ rounds and the trainer never exhibits a non-letter
    * merge; at ×2 they land at rank 12-17 (measured: (1,0), (4,2),
    * (10,0), and the é/ï/em-dash UTF-8 byte pairs), which is the
    * property this fixture exists to pin.
    */
  private def foldedDerivedCol: org.apache.spark.sql.Column =
    translate(
      concat(col("text"), lit(" #"), col("doc_id").cast(StringType),
        lit(FullCharsetSuffix), lit(FullCharsetSuffix)),
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

  private def foldedDerivedSql: String =
    s"""translate(text || ' #' || doc_id || '$FullCharsetSuffix$FullCharsetSuffix',
       'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"""

  /** Bounds on the training word histogram (q_bpe_train /
    * q_bpe_train_encode): distinct `[a-z]+` forms on real web text run
    * to hundreds of millions (typos, concatenations, romanized foreign
    * text), so an unbounded collect() of the histogram is a driver OOM
    * at 100 TB. Standard tokenizer-training practice (subword-nmt's
    * --min-frequency, HF tokenizers' vocab limits) bounds it INSIDE the
    * aggregation: a count floor plus a top-N-by-(count, word) cap — the
    * cap runs as a distributed TakeOrderedAndProject, so only the kept
    * rows ever reach the driver. Training is invariant to histogram
    * ORDER (BpeSpec pins this, plus capped==full when nothing is cut),
    * and at the gate's corpus (31 distinct forms at sf0.01) nothing is
    * cut, so the bounded path IS the gate path.
    */
  private val TrainMinWordCount = 1L
  private val TrainMaxVocabWords = 100000

  /** Reader-side reassembly + decode of a written pack artifact
    * (q_pack_detokenize / q_pack_detokenize_shuffled): spans slice each
    * document's ids out of its sequences map-side, the one groupBy
    * shuffle carries exactly the corpus' token ids (the inverse of the
    * pack shuffle), and BpeDecodeIds rebuilds text executor-side so
    * only 16-byte md5s leave.
    */
  private def detokenizeArtifact(artifact: DataFrame): DataFrame =
    artifact
      .select(col("seq"), col("tokens"), explode(col("doc_spans")).as("sp"))
      .select(col("sp.doc_id").as("doc_id"), col("seq"),
        expr("slice(tokens, sp.start + 1, sp.len)").as("ids"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "flatten(transform(array_sort(collect_list(struct(seq, ids))), x -> x.ids))")
        .as("ids"))
      .select(col("doc_id"),
        md5(graft.functions.BpeEncodeTokens.bpeDecodeIds(col("ids"))
          .cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"))

  /** The reader-side per-shard audit (q_pack_shards / q_pipeline_pack):
    * write `docs` (doc_id, text) as packed shards into a scratch dir,
    * read the ARTIFACT back, and report per-shard sequence/token/full
    * counts plus the token-id sum — the numbers [[packShardsTailSql]]
    * rebuilds arithmetically without ever seeing the writer.
    */
  private[ops] def packShardsAudit(s: SparkSession, docs: DataFrame,
      fullCharset: Boolean = false,
      idsExpr: Option[org.apache.spark.sql.Column] = None,
      resumable: Boolean = false,
      shuffleSeed: Option[String] = None): DataFrame = {
    val out = graft.sources.Scratch.tempDir("graft_pack_shards") + "/shards"
    (if (shuffleSeed.isDefined)
      graft.sources.PackedShards.writeBatchShuffled(s, docs, out,
        shuffleSeed.get, fullCharset = fullCharset, idsExpr = idsExpr)
    else if (resumable)
      // the RESUMABLE writer with ranges sized to CYCLE the manifest
      // path at gate SF (2 ranges at sf0.01, ~12 at sf0.1) without
      // paying per-range job overhead 90× (the first cut at 4
      // shards/range cost 34 s at sf0.1 — a production range is hours
      // of work, so the fixed cost amortizes there, not at toy SF)
      // maxConcurrentRanges = 4: ranges are independent (disjoint shard
      // partitions, per-job staging dirs, spec-pinned byte-identical to
      // the serial loop) — the bounded pool the writeBatchResumable
      // docstring prescribes at scale, where a strictly serial driver
      // loop wastes the cluster between range jobs
      graft.sources.PackedShards.writeBatchResumable(s, docs, out,
        shardsPerRange = 32L, fullCharset = fullCharset, idsExpr = idsExpr,
        maxConcurrentRanges = 4)
    else graft.sources.PackedShards.writeBatch(s, docs, out,
        fullCharset = fullCharset, idsExpr = idsExpr))
      .select(col("shard").cast(LongType).as("shard"), col("n_tokens"),
        col("n_docs"),
        expr("aggregate(tokens, 0L, (acc, x) -> acc + x)").as("tid_sum"),
        // lineage checksum over the span map: Σ doc_id·len equals the
        // oracle's Σ doc_id over token rows, so a span that points at
        // the wrong document or misstates its length moves it
        expr("aggregate(doc_spans, 0L, (acc, x) -> acc + x.doc_id * x.len)")
          .as("span_sum"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("n_tokens") === 256L, 1L).otherwise(0L)).as("n_full"),
        sum(col("tid_sum")).as("tid_sum"),
        sum(col("span_sum")).as("span_sum"),
        sum(col("n_docs")).as("n_contribs"))
      .orderBy(col("shard"))
  }

  /** The bounded training histogram: one map-side-combined aggregation,
    * floor + deterministic top-N cap pushed into the plan, then a
    * driver collect of at most `maxWords` rows.
    */
  def bpeWordHistogram(docs: DataFrame,
      minCount: Long = TrainMinWordCount,
      maxWords: Int = TrainMaxVocabWords,
      wordsExpr: org.apache.spark.sql.Column =
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
      : Seq[(String, Long)] =
    docs
      .select(explode(wordsExpr).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** DuckDB mirror of BPE TRAINING (q_bpe_train): t0 is the word
    * histogram split to characters; each unrolled round counts weighted
    * adjacent pairs (every position, overlaps included), picks the
    * (count DESC, a, b) argmax, and applies it to every word with the
    * same left-fold list_reduce the encode oracle uses. b$i rows are the
    * learned merges — the query's output — so Spark's driver-side rounds
    * and DuckDB's CTE rounds must agree merge-for-merge to hash-match.
    */
  /** `wordsSql` is the word extraction the trainer histograms —
    * parameterized so q_bpe_train (letters only) and q_bpe_train_full
    * (the full-charset `[a-z0-9]+` class over the ASCII-folded derived
    * corpus) share the unrolled-round machinery verbatim.
    */
  private def bpeTrainOracle(
      wordsSql: String = "regexp_extract_all(lower(text), '[a-z]+')")
      : String = {
    // AS MATERIALIZED on every chain CTE: DuckDB inlines CTEs by default,
    // and each t$i is referenced TWICE (p$i and t${i+1}), so an inlined
    // 12-round chain re-evaluates t0 up to 2^12 times — measured ~124 s
    // at sf0.01 for a histogram of a few hundred words. Materialized,
    // each round runs once.
    val iters = (0 until NumTrainMerges).map { i =>
      s"""p$i AS MATERIALIZED (
            SELECT pr.a AS a, pr.b AS b, SUM(cnt) AS c FROM (
              SELECT cnt, unnest(list_transform(range(1, len(toks)),
                x -> {'a': toks[x], 'b': toks[x+1]})) AS pr
              FROM t$i) GROUP BY 1, 2),
          b$i AS MATERIALIZED (SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1),
          t${i + 1} AS MATERIALIZED (
            SELECT list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, t -> [t])),
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.ma AND x[1] = m.mb
                               THEN list_append(acc[:len(acc)-1], m.ma || m.mb)
                               ELSE list_append(acc, x[1]) END) AS toks, cnt
            FROM t$i CROSS JOIN (SELECT a AS ma, b AS mb FROM b$i) m)"""
    }.mkString(",\n")
    val unions = (0 until NumTrainMerges).map { i =>
      s"SELECT CAST($i AS INT) AS rank, a, b, CAST(c AS BIGINT) AS pair_count FROM b$i"
    }.mkString("\nUNION ALL\n")
    s"""WITH t0 AS MATERIALIZED (
          SELECT regexp_extract_all(word, '.') AS toks, cnt FROM (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
              SELECT unnest($wordsSql) AS word
              FROM documents) GROUP BY word)),
        $iters
        SELECT * FROM ($unions) ORDER BY rank"""
  }

  /** DuckDB mirror of q_bpe_train_encode: the SAME unrolled training
    * rounds as bpeTrainOracle, assembled into a rank-ordered merge list
    * (mlist), then the bpeCte recursive encode loop runs against that
    * LEARNED list instead of a committed table literal — train → encode
    * end-to-end in one SQL statement, the composition the Spark side
    * performs with BpeTrainer + BpeEncodeTokensWith.
    */
  /** The unrolled train-then-encode CTE prefix (through `fin`, the
    * per-(doc, word) tokens under the LEARNED table) plus the learned-
    * merge union — shared by q_bpe_train_encode and the train → pack
    * composition (q_pack_shards_trained).
    *
    * The encode half is a JOIN, not a recursive CTE: the training chain's
    * final relation t{N} already holds every distinct word's tokenization
    * after applying merges 0..N-1 in rank order, and for a table LEARNED
    * by BPE training with distinct products, sequential rank-order
    * application equals the encoder's greedy lowest-rank-first loop —
    * a new adjacency created by applying merge k always involves
    * product(k), so it can only match a merge j whose operand is
    * product(k); a learned table forms operands strictly before the
    * merges that consume them, so (with distinct products, which
    * BpeVocab asserts) j > k always, and no earlier-rank opportunity is
    * ever created after its round has run. So fin = w0 ⋈ t{N} on word,
    * and the oracle never re-encodes per document. (The first cut ran a
    * per-document recursive-CTE greedy encode against the learned list;
    * DuckDB priced q_pack_shards_trained's instance of it at ~25-30 min
    * single-threaded at sf0.01 — ~10× the Spark wall-time of the entire
    * 254-query surface, which is what emptied the driver's round-10
    * correctness artifact. The join form prices the same semantics in
    * milliseconds.)
    */
  private def bpeTrainEncodeCtes(pred: String = "TRUE"): (String, String) = {
    // AS MATERIALIZED throughout, same reason as bpeTrainOracle: inlined,
    // the doubly-referenced chain re-evaluates exponentially in rounds.
    val iters = (0 until NumTrainMerges).map { i =>
      s"""p$i AS MATERIALIZED (
            SELECT pr.a AS a, pr.b AS b, SUM(cnt) AS c FROM (
              SELECT cnt, unnest(list_transform(range(1, len(toks)),
                x -> {'a': toks[x], 'b': toks[x+1]})) AS pr
              FROM t$i) GROUP BY 1, 2),
          b$i AS MATERIALIZED (SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1),
          t${i + 1} AS MATERIALIZED (
            SELECT word,
              list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, t -> [t])),
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.ma AND x[1] = m.mb
                               THEN list_append(acc[:len(acc)-1], m.ma || m.mb)
                               ELSE list_append(acc, x[1]) END) AS toks, cnt
            FROM t$i CROSS JOIN (SELECT a AS ma, b AS mb FROM b$i) m)"""
    }.mkString(",\n")
    val mlUnion = (0 until NumTrainMerges).map(i =>
      s"SELECT $i AS rank, a, b FROM b$i").mkString(" UNION ALL ")
    (s"""WITH t0 AS MATERIALIZED (
          SELECT word, regexp_extract_all(word, '.') AS toks, cnt FROM (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
              FROM documents WHERE $pred) GROUP BY word)),
        $iters,
        w0 AS (SELECT doc_id,
                      generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) AS wid,
                      unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
               FROM documents WHERE $pred),
        fin AS (SELECT w0.doc_id, w0.wid, t.toks
                FROM w0 JOIN t$NumTrainMerges t USING (word))""", mlUnion)
  }

  private def bpeTrainEncodeOracle: String = {
    val (ctes, _) = bpeTrainEncodeCtes()
    s"""$ctes,
        agg AS (SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_words,
                       CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS n_tokens_learned,
                       string_agg(array_to_string(toks, ' '), ' ' ORDER BY wid) AS full
                FROM fin GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(a.n_tokens_learned, 0) AS BIGINT) AS n_tokens_learned,
               array_to_string((string_split(coalesce(a.full, ''), ' '))[:8], ' ') AS first_tokens
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id"""
  }

  /** Oracle of the TRAIN → PACK composition: the learned-table encode
    * prefix, ids via the learned products (rank r → 292 + r, the
    * BpeVocab rule), then the standard pack-audit arithmetic.
    */
  private def packShardsTrainedOracle: String = {
    // 1-in-5 corpus slice on both sides (the exact-regime-anchor
    // convention; the full-corpus composition is the same code with the
    // filter removed). With the join-form encode in bpeTrainEncodeCtes
    // the oracle now runs in seconds — the recursive form it replaced
    // cost ~25-30 min in DuckDB and blew the driver's round-10
    // correctness budget.
    val (ctes, mlUnion) = bpeTrainEncodeCtes(pred = "doc_id % 5 = 0")
    s"""$ctes,
       prods AS (SELECT list(a || b ORDER BY rank) AS pl FROM ($mlUnion)),
       flat AS (SELECT doc_id, wid, generate_subscripts(toks, 1) AS ti,
                       unnest(toks) AS t
                FROM fin),
       g AS (SELECT doc_id, t,
                    row_number() OVER (ORDER BY doc_id, wid, ti) - 1 AS pos
             FROM flat),
       ids AS (SELECT doc_id, pos,
                      CASE WHEN len(t) = 1 THEN ascii(t) - 97
                           ELSE 291 + list_position(p.pl, t)
                      END AS tid
               FROM g CROSS JOIN prods p),
       seqs AS (SELECT pos // 256 AS seq,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(tid) AS BIGINT) AS ts,
                       CAST(sum(doc_id) AS BIGINT) AS sd,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
                FROM ids GROUP BY 1)
       SELECT CAST(seq // 8 AS BIGINT) AS shard,
              CAST(count(*) AS BIGINT) AS n_seqs,
              CAST(sum(n) AS BIGINT) AS n_tokens,
              CAST(sum(CASE WHEN n = 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
              CAST(sum(ts) AS BIGINT) AS tid_sum,
              CAST(sum(sd) AS BIGINT) AS span_sum,
              CAST(sum(nd) AS BIGINT) AS n_contribs
       FROM seqs GROUP BY 1 ORDER BY 1"""
  }

  /** Unrolled BYTE-LEVEL training rounds (q_bpe_train_full /
    * q_bpe_train_encode_full): t0 is the full-charset UNIT histogram of
    * the ASCII-folded derived corpus — a `[a-z0-9]+` run splits to
    * chars, any other code point to its `<0xNN>` UTF-8 byte tokens
    * (hex(encode(u)) IS the byte fallback) — so the learned merges range
    * over letters, digits, AND byte tokens. The chain carries the unit
    * string `u` so the encode oracle is a seg ⋈ t{N} join (the
    * bpeTrainEncodeCtes equivalence argument, per unit). All
    * MATERIALIZED: inlined, the doubly-referenced 48-round chain would
    * re-evaluate exponentially.
    */
  private def bpeTrainUnitsCtes: String = {
    val iters = (0 until NumTrainMergesFull).map { i =>
      s"""p$i AS MATERIALIZED (
            SELECT pr.a AS a, pr.b AS b, SUM(cnt) AS c FROM (
              SELECT cnt, unnest(list_transform(range(1, len(toks)),
                x -> {'a': toks[x], 'b': toks[x+1]})) AS pr
              FROM t$i) GROUP BY 1, 2),
          b$i AS MATERIALIZED (SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1),
          t${i + 1} AS MATERIALIZED (
            SELECT u,
              list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, t -> [t])),
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.ma AND x[1] = m.mb
                               THEN list_append(acc[:len(acc)-1], m.ma || m.mb)
                               ELSE list_append(acc, x[1]) END) AS toks, cnt
            FROM t$i CROSS JOIN (SELECT a AS ma, b AS mb FROM b$i) m)"""
    }.mkString(",\n")
    s"""WITH corp AS MATERIALIZED (
          SELECT doc_id, $foldedDerivedSql AS t FROM documents),
        t0 AS MATERIALIZED (
          SELECT u,
            CASE WHEN regexp_matches(u, '^[a-z0-9]+$$')
                 THEN regexp_extract_all(u, '.')
                 ELSE list_transform(range(1, octet_length(encode(u)) + 1),
                        i -> '<0x' || substr(hex(encode(u)), 2*i - 1, 2) || '>')
            END AS toks, cnt FROM (
            SELECT u, CAST(count(*) AS BIGINT) AS cnt FROM (
              SELECT unnest(regexp_extract_all(t, '$UnitRe')) AS u FROM corp)
            GROUP BY u)),
        $iters"""
  }

  private def bpeTrainFullOracle: String = {
    val unions = (0 until NumTrainMergesFull).map { i =>
      s"SELECT CAST($i AS INT) AS rank, a, b, CAST(c AS BIGINT) AS pair_count FROM b$i"
    }.mkString("\nUNION ALL\n")
    s"""$bpeTrainUnitsCtes
        SELECT * FROM ($unions) ORDER BY rank"""
  }

  /** Oracle of the BYTE-LEVEL train → pack composition
    * (q_pack_shards_trained_full): the units training chain, the
    * seg ⋈ t{N} learned encode, then BpeVocab id arithmetic extended
    * with the learned-products map (rank r → 292 + r; letters/digits/
    * byte tokens keep their base ids — a learned product is ≥2 tokens
    * concatenated, so it can never collide with the 6-char `<0xNN>`
    * shape), then the standard pack arithmetic over positions ordered
    * by (doc, segment, token).
    */
  private def packShardsTrainedFullOracle: String = {
    val mlUnion = (0 until NumTrainMergesFull).map(i =>
      s"SELECT $i AS rank, a, b FROM b$i").mkString(" UNION ALL ")
    s"""$bpeTrainUnitsCtes,
       prods AS (SELECT list(a || b ORDER BY rank) AS pl FROM ($mlUnion)),
       seg AS (SELECT doc_id,
                 generate_subscripts(regexp_extract_all(t, '$UnitRe'), 1) AS sid,
                 unnest(regexp_extract_all(t, '$UnitRe')) AS u
               FROM corp),
       fin AS (SELECT seg.doc_id, seg.sid, tk.toks
               FROM seg JOIN t$NumTrainMergesFull tk USING (u)),
       flat AS (SELECT doc_id, sid, generate_subscripts(toks, 1) AS ti,
                       unnest(toks) AS tok
                FROM fin),
       g AS (SELECT doc_id, tok,
                    row_number() OVER (ORDER BY doc_id, sid, ti) - 1 AS pos
             FROM flat),
       ids AS (SELECT doc_id, pos,
                 CASE WHEN len(tok) = 1 AND tok >= 'a' AND tok <= 'z'
                        THEN ascii(tok) - 97
                      WHEN len(tok) = 1 AND tok >= '0' AND tok <= '9'
                        THEN 26 + ascii(tok) - 48
                      WHEN len(tok) = 6 AND tok[1:3] = '<0x'
                        THEN 36 + (strpos('0123456789ABCDEF', tok[4]) - 1) * 16
                                + (strpos('0123456789ABCDEF', tok[5]) - 1)
                      ELSE 291 + list_position(p.pl, tok) END AS tid
               FROM g CROSS JOIN prods p),
       seqs AS (SELECT pos // 256 AS seq,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(tid) AS BIGINT) AS ts,
                       CAST(sum(doc_id) AS BIGINT) AS sd,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
                FROM ids GROUP BY 1)
       SELECT CAST(seq // 8 AS BIGINT) AS shard,
              CAST(count(*) AS BIGINT) AS n_seqs,
              CAST(sum(n) AS BIGINT) AS n_tokens,
              CAST(sum(CASE WHEN n = 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
              CAST(sum(ts) AS BIGINT) AS tid_sum,
              CAST(sum(sd) AS BIGINT) AS span_sum,
              CAST(sum(nd) AS BIGINT) AS n_contribs
       FROM seqs GROUP BY 1 ORDER BY 1"""
  }

  private def bpeTrainEncodeFullOracle: String =
    s"""$bpeTrainUnitsCtes,
        seg AS (SELECT doc_id,
                  generate_subscripts(regexp_extract_all(t, '$UnitRe'), 1) AS sid,
                  unnest(regexp_extract_all(t, '$UnitRe')) AS u
                FROM corp),
        fin AS (SELECT seg.doc_id, seg.sid, tk.toks
                FROM seg JOIN t$NumTrainMergesFull tk USING (u)),
        agg AS (SELECT doc_id, flatten(list(toks ORDER BY sid)) AS tk
                FROM fin GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(len(a.tk) AS BIGINT) AS n_tokens_learned,
               array_to_string(a.tk[:8], ' ') AS first_tokens
        FROM documents d JOIN agg a USING (doc_id)
        ORDER BY d.doc_id"""

  /** The Spark half the two full-charset trainer queries share: the
    * bounded unit histogram (one distributed aggregation over the folded
    * derived corpus) mapped to initial-token arrays, then the driver
    * rounds over units.
    */
  private def trainFullMerges(s: SparkSession, dir: String)
      : Seq[(Int, String, String, Long)] = {
    val corpus = t(s, dir, "documents")
      .select(col("doc_id"), foldedDerivedCol.as("text"))
    val hist = bpeWordHistogram(corpus,
      wordsExpr = expr(s"regexp_extract_all(text, '$UnitRe', 0)"))
    graft.functions.BpeTrainer.trainUnits(
      hist.map { case (u, c) => (unitTokens(u), c) }, NumTrainMergesFull)
  }

  val queries: Seq[Q] = Seq(

    // Token-budget packing: global offsets via the two-phase running sum.
    Q("q_token_shards",
      (s, dir) => tokenShards(t(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset,
                     CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096 AS BIGINT) AS shard
              FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
              ORDER BY doc_id""")),

    // Training-data chunking: overlapping 32-token windows at stride 16
    // (context-length packing with overlap). One codegen pass builds the
    // window slices per document (graft.functions.WordWindows); posexplode
    // flattens — per-row work, no shuffle before the declared sort.
    Q("q_chunk_windows",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(graft.functions.TextFunctions.wordWindows(col("text"), 32, 16)))
          .select(col("doc_id"), col("pos").cast(LongType).as("win"),
            col("col").as("chunk"))
          .orderBy(col("doc_id"), col("win")),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
                   x AS (SELECT doc_id, ws, len(ws) AS n FROM w)
              SELECT doc_id, j AS win,
                     array_to_string(ws[j*16+1 : j*16+32], ' ') AS chunk
              FROM x, LATERAL (SELECT unnest(range(0,
                CASE WHEN n <= 32 THEN 1
                     ELSE CAST(ceil((n - 32) / 16.0) AS BIGINT) + 1 END)) AS j)
              ORDER BY doc_id, win""")),

    // Scalar string functions (P1/P2 analogues + LIKE search surface).
    Q("q_string_fns",
      (s, dir) =>
        t(s, dir, "documents")
          .filter(col("text").like("%spark%"))
          .select(col("doc_id"),
            upper(substring(col("text"), 1, 12)).as("head"),
            length(col("text")).cast(LongType).as("len"),
            concat(col("source"), lit("/"), col("lang")).as("tag"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, upper(substring(text, 1, 12)) AS head,
                     length(text) AS len, source || '/' || lang AS tag
              FROM documents WHERE text LIKE '%spark%' ORDER BY doc_id""")),

    // Quality scoring: token counts, uniqueness, mean token length,
    // stopword ratio — the heuristics a pretraining filter computes per
    // document.
    Q("q_text_quality",
      (s, dir) =>
        // one codegen byte pass per document (graft.functions.WordStats)
        // replacing four interpreted HOF lambdas — field-equal by the
        // WordStatsSpec property, same oracle
        t(s, dir, "documents")
          .withColumn("st",
            graft.functions.TextFunctions.wordStats(col("text"), stopwords))
          .select(col("doc_id"),
            col("st.n_tokens").as("n_tokens"),
            col("st.n_uniq").as("n_uniq"),
            (col("st.sum_len").cast(DoubleType) / col("st.n_tokens"))
              .as("avg_token_len"),
            (col("st.stop_hits").cast(DoubleType) / col("st.n_tokens"))
              .as("stop_ratio"),
            (col("st.n_uniq").cast(DoubleType) / col("st.n_tokens"))
              .as("uniq_ratio"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     len(ws) AS n_tokens,
                     len(list_distinct(ws)) AS n_uniq,
                     CAST(list_reduce(list_prepend(0::BIGINT, list_transform(ws, w -> length(w)::BIGINT)), (acc, x) -> acc + x) AS DOUBLE) / len(ws) AS avg_token_len,
                     CAST(len(list_filter(ws, w -> list_contains(['the', 'a'], w))) AS DOUBLE) / len(ws) AS stop_ratio,
                     CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS uniq_ratio
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
              ORDER BY doc_id""")),

    // Gopher-style quality rules (Rae et al. 2021 §A1.1 shape): per-doc
    // rule flags + composite keep, everything from ONE WordStats byte
    // pass. Thresholds tuned so the synthetic corpus genuinely splits
    // (not all-keep / all-drop).
    Q("q_gopher_rules",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("st",
            graft.functions.TextFunctions.wordStats(col("text"), stopwords))
          .select(col("doc_id"),
            col("st.n_tokens").as("nt"),
            col("st.n_uniq").as("nu"),
            (col("st.sum_len").cast(DoubleType) / col("st.n_tokens")).as("mwl"),
            col("st.stop_hits").as("sh"))
          .select(col("doc_id"),
            when(col("nt").between(40, 100000), 1L).otherwise(0L).as("r_wordcount"),
            when(col("mwl").between(3.0, 6.0), 1L).otherwise(0L).as("r_meanlen"),
            when(col("sh") >= 1, 1L).otherwise(0L).as("r_stopword"),
            when(col("nu").cast(DoubleType) / col("nt") >= 0.5, 1L).otherwise(0L)
              .as("r_uniq"))
          .withColumn("keep",
            col("r_wordcount") * col("r_meanlen") * col("r_stopword") * col("r_uniq"))
          .orderBy(col("doc_id")),
      Some("""WITH s AS (
                SELECT doc_id, len(ws) AS nt, len(list_distinct(ws)) AS nu,
                       CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws) AS mwl,
                       len(list_filter(ws, w -> list_contains(['the', 'a'], w))) AS sh
                FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
              SELECT doc_id,
                     CAST(CASE WHEN nt BETWEEN 40 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_wordcount,
                     CAST(CASE WHEN mwl BETWEEN 3.0 AND 6.0 THEN 1 ELSE 0 END AS BIGINT) AS r_meanlen,
                     CAST(CASE WHEN sh >= 1 THEN 1 ELSE 0 END AS BIGINT) AS r_stopword,
                     CAST(CASE WHEN CAST(nu AS DOUBLE) / nt >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS r_uniq,
                     CAST(CASE WHEN nt BETWEEN 40 AND 100000 THEN 1 ELSE 0 END
                        * CASE WHEN mwl BETWEEN 3.0 AND 6.0 THEN 1 ELSE 0 END
                        * CASE WHEN sh >= 1 THEN 1 ELSE 0 END
                        * CASE WHEN CAST(nu AS DOUBLE) / nt >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS keep
              FROM s ORDER BY doc_id""")),

    // Within-document repetition (the Gopher duplicate-n-gram signal): the
    // fraction of a doc's 3-word shingles that are repeats of an earlier
    // one. Distinct count comes from the codegen shingling pass; short
    // texts (< 3 words) are one whole-text shingle, ratio 0.
    Q("q_repetition",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.wordStats(col("text"), Nil)
              .getField("n_tokens").as("nt"),
            size(graft.functions.TextFunctions.shingleHashes(col("text")))
              .cast(LongType).as("n_uniq"))
          .withColumn("n_total",
            when(col("nt") >= 3, col("nt") - 2).otherwise(lit(1L)))
          .select(col("doc_id"), col("n_total"), col("n_uniq"),
            ((col("n_total") - col("n_uniq")).cast(DoubleType) / col("n_total"))
              .as("dup_shingle_ratio"))
          .orderBy(col("doc_id")),
      Some("""WITH s AS (
                SELECT doc_id,
                       CASE WHEN len(ws) >= 3 THEN len(ws) - 2 ELSE 1 END AS n_total,
                       CASE WHEN len(ws) >= 3
                            THEN len(list_distinct(list_transform(range(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
                            ELSE 1 END AS n_uniq
                FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
              SELECT doc_id, CAST(n_total AS BIGINT) AS n_total,
                     CAST(n_uniq AS BIGINT) AS n_uniq,
                     CAST(n_total - n_uniq AS DOUBLE) / n_total AS dup_shingle_ratio
              FROM s ORDER BY doc_id""")),

    // Token counting with a BPE-ish regex (word pieces | digits | other
    // symbol), the cheap proxy for tokenizer cost estimation.
    Q("q_token_count",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast(LongType).as("n_bpe_tokens"),
            length(col("text")).cast(LongType).as("n_chars"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
                     length(text) AS n_chars
              FROM documents ORDER BY doc_id""")),

    // Language-ID by stopword-profile voting: count hits from per-language
    // marker-word lists, predict the argmax (alphabetical tie-break). The
    // char-n-gram variant (graft.functions.LangId) is spec'd in ScalaTest;
    // this SQL-expressible vote is the oracle-able form.
    Q("q_langid",
      (s, dir) => {
        // deterministic marker lists over the synthetic vocabulary
        val profiles = Seq(
          "de" -> Seq("der", "und", "nicht"),
          "en" -> Seq("the", "a", "fast"),
          "es" -> Seq("el", "la", "slow"),
          "fr" -> Seq("le", "les", "small"),
          "zh" -> Seq("big", "key", "hash"))
        // ALL per-language marker hits from ONE codegen byte pass
        // (graft.functions.MarkerHits) — slot i counts tokens in
        // profile i's list, with multiplicity (the size(filter(...))
        // convention the oracle uses)
        val hits = graft.functions.TextFunctions
          .markerHits(col("text"), profiles.map(_._2))
        val scoreCols = profiles.zipWithIndex.map { case ((lang, _), i) =>
          element_at(hits, i + 1).as(s"s_$lang")
        }
        // argmax with alphabetical tie-break: foldRight below makes the
        // first (alphabetical) language hitting the max win.
        val d = t(s, dir, "documents")
          .select(col("doc_id") +: col("lang").as("declared_lang") +: scoreCols: _*)
        val langs = profiles.map(_._1)
        val bestScore = greatest(langs.map(l => col(s"s_$l")): _*)
        val predicted = langs.foldRight(lit(null).cast(StringType)) { (l, acc) =>
          when(col(s"s_$l") === bestScore, lit(l)).otherwise(acc)
        } // foldRight => first alphabetical max wins (lists are sorted)
        d.select(col("doc_id"), col("declared_lang"), predicted.as("predicted_lang"),
            bestScore.cast(LongType).as("best_score"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (
                SELECT doc_id, lang AS declared_lang,
                       len(list_filter(ws, w -> list_contains(['der','und','nicht'], w))) AS s_de,
                       len(list_filter(ws, w -> list_contains(['the','a','fast'], w))) AS s_en,
                       len(list_filter(ws, w -> list_contains(['el','la','slow'], w))) AS s_es,
                       len(list_filter(ws, w -> list_contains(['le','les','small'], w))) AS s_fr,
                       len(list_filter(ws, w -> list_contains(['big','key','hash'], w))) AS s_zh
                FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents))
              SELECT doc_id, declared_lang,
                     CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                          WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                          WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                          WHEN s_fr >= s_zh THEN 'fr'
                          ELSE 'zh' END AS predicted_lang,
                     greatest(s_de, s_en, s_es, s_fr, s_zh) AS best_score
              FROM s ORDER BY doc_id""")),

    // Corpus profile per declared language — exact bigint/ratio stats.
    Q("q_lang_profile",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
          .orderBy(col("lang")),
      Some("""SELECT lang, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS total_chars,
                     CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
              FROM documents GROUP BY lang ORDER BY lang""")),

    // regexp_extract with a capture group (string-function surface).
    Q("q_regexp_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("k_str"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str
              FROM events ORDER BY event_id""")),

    // Pretraining-style text normalization: lowercase, strip non-alnum,
    // collapse whitespace, trim — plus before/after lengths. Simple char
    // classes keep Java-regex and RE2 semantics identical.
    Q("q_text_normalize",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .withColumn("norm", trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
          .select(col("doc_id"), length(col("text")).cast(LongType).as("len_raw"),
            length(col("norm")).cast(LongType).as("len_norm"),
            substring(col("norm"), 1, 20).as("head"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, length(text) AS len_raw,
                     length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS len_norm,
                     substring(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), 1, 20) AS head
              FROM documents ORDER BY doc_id""")),

    // Rolling polynomial fingerprint (Karp-Rabin over the char stream,
    // mod 1e9+7) — content-defined identity that survives re-encoding,
    // computed as a sequential fold in BOTH engines so values agree.
    Q("q_fingerprint",
      (s, dir) =>
        // codegen single byte pass (graft.functions.KarpRabinFingerprint);
        // the interpreted per-char HOF fold it replaces benched at 6.09 s
        // for sf0.1 — the same recurrence, same oracle
        t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.karpRabinFingerprint(col("text"))
              .as("fingerprint"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
                       (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
              FROM documents ORDER BY doc_id""")),

    // Markup stripping (crawl boilerplate removal): documents carry no
    // HTML, so a deterministic wrapper is synthesized per row (the
    // q_url_parse fixture pattern — the synthesis IS the fixture), then
    // stripped with one tag-regex pass + entity unescape. Pure per-row
    // codegen — streams at input bandwidth; the synthesized tags exercise
    // attribute quoting, nesting, and an entity in one shape.
    Q("q_html_strip",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val html = concat(lit("<div id=\"d"), col("doc_id").cast(StringType),
          lit("\"><p>"),
          expr("replace(text, 'table', '<b>table</b>')"),
          lit(" &amp; more</p></div>"))
        val clean = expr(
          "replace(regexp_replace(html, '<[^>]+>', ''), '&amp;', '&')")
        docs.withColumn("html", html)
          .select(col("doc_id"),
            length(col("html")).cast(LongType).as("len_html"),
            clean.as("clean"),
            length(clean).cast(LongType).as("len_clean"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id,
                     '<div id="d' || doc_id || '"><p>' ||
                       replace(text, 'table', '<b>table</b>') ||
                       ' &amp; more</p></div>' AS html
              FROM documents)
              SELECT doc_id, CAST(length(html) AS BIGINT) AS len_html,
                     replace(regexp_replace(html, '<[^>]+>', '', 'g'), '&amp;', '&') AS clean,
                     CAST(length(replace(regexp_replace(html, '<[^>]+>', '', 'g'), '&amp;', '&')) AS BIGINT) AS len_clean
              FROM h ORDER BY doc_id""")),

    // Sentence segmentation stats: a deterministic terminator is
    // synthesized (every ' row ' becomes '. '), then the per-document
    // sentence list is analyzed entirely with array HOFs — count, total
    // and max words, mean sentence length — zero explode, zero shuffle
    // before the declared sort. Integer totals; the mean is one IEEE
    // division so both engines agree bitwise.
    Q("q_sentences",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("sents",
            split(expr("replace(text, ' row ', '. ')"), "\\. "))
          .select(col("doc_id"),
            size(col("sents")).cast(LongType).as("n_sentences"),
            expr("aggregate(sents, 0L, (a, x) -> a + size(split(x, ' ')))")
              .as("total_words"),
            expr("array_max(transform(sents, x -> size(split(x, ' '))))")
              .cast(LongType).as("max_words"))
          .withColumn("avg_words",
            col("total_words").cast(DoubleType) / col("n_sentences"))
          .orderBy(col("doc_id")),
      Some("""WITH s AS (SELECT doc_id,
                     regexp_split_to_array(replace(text, ' row ', '. '), '\. ') AS ls
              FROM documents)
              SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_sentences,
                     CAST(list_sum(list_transform(ls, x -> len(string_split(x, ' ')))) AS BIGINT) AS total_words,
                     CAST(list_max(list_transform(ls, x -> len(string_split(x, ' ')))) AS BIGINT) AS max_words,
                     CAST(list_sum(list_transform(ls, x -> len(string_split(x, ' ')))) AS DOUBLE) / len(ls) AS avg_words
              FROM s ORDER BY doc_id""")),

    // Flesch-style readability: words, synthesized sentences (same ' row '
    // terminator as q_sentences), and a vowel-group syllable heuristic via
    // one regexp_count pass. The score is a fixed left-associated double
    // expression — two IEEE divisions, two multiplies, two subtractions —
    // identical trees on both engines, so no rounding is needed.
    Q("q_readability",
      (s, dir) => {
        val words = size(split(col("text"), " ")).cast(LongType)
        val sents = size(split(expr("replace(text, ' row ', '. ')"), "\\. "))
          .cast(LongType)
        val vg = regexp_count(col("text"), lit("[aeiou]+")).cast(LongType)
        t(s, dir, "documents")
          .select(col("doc_id"), words.as("words"), sents.as("sentences"),
            vg.as("vowel_groups"))
          .withColumn("flesch",
            lit(206.835)
              - lit(1.015) * (col("words").cast(DoubleType) / col("sentences"))
              - lit(84.6) * (col("vowel_groups").cast(DoubleType) / col("words")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
                     CAST(len(regexp_split_to_array(replace(text, ' row ', '. '), '\. ')) AS BIGINT) AS sentences,
                     CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS vowel_groups
              FROM documents)
              SELECT doc_id, words, sentences, vowel_groups,
                     206.835::DOUBLE
                       - 1.015::DOUBLE * (CAST(words AS DOUBLE) / sentences)
                       - 84.6::DOUBLE * (CAST(vowel_groups AS DOUBLE) / words) AS flesch
              FROM w ORDER BY doc_id""")),

    // Sequence packing composition map (GPT-style document concatenation):
    // documents are laid end-to-end in doc_id order and cut into fixed
    // 256-token training sequences; each output row is one (document,
    // sequence) overlap with its token count — the lineage map a trainer
    // needs to attribute a loss spike back to source documents. Offsets
    // come from the two-phase running sum (tokenShards, budget=256), so
    // no global single-partition scan; the explode is O(total_tokens/256).
    Q("q_pack_sequences",
      (s, dir) => {
        val L = 256L
        tokenShards(t(s, dir, "documents"), budget = L)
          // integer div (see tokenShards): exact past 2^53 total tokens
          .withColumn("seq_last", expr(s"(offset + n_tokens - 1) div ${L}L"))
          .withColumn("seq", explode(sequence(col("shard"), col("seq_last"))))
          .select(col("doc_id"), col("seq"),
            (least(col("offset") + col("n_tokens"), (col("seq") + 1) * L)
              - greatest(col("offset"), col("seq") * L)).as("tok_in_seq"))
          .orderBy(col("doc_id"), col("seq"))
      },
      Some("""WITH o AS (SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
              FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)),
              b AS (SELECT doc_id, off, n_tokens,
                     CAST(off // 256 AS BIGINT) AS s0,
                     CAST((off + n_tokens - 1) // 256 AS BIGINT) AS s1
              FROM o)
              SELECT doc_id, seq,
                     CAST(least(off + n_tokens, (seq + 1) * 256) - greatest(off, seq * 256) AS BIGINT) AS tok_in_seq
              FROM (SELECT doc_id, off, n_tokens, unnest(range(s0, s1 + 1)) AS seq FROM b)
              ORDER BY doc_id, seq""")),

    // BPE subword tokenization (the GPT-2 greedy merge loop over the
    // committed BpeMerges.table — see functions/Bpe.scala): the ONE
    // first-class LLM-pipeline operator a whitespace tokenizer can't
    // stand in for — token budgets measured in whitespace words misprice
    // CJK/code/URL-heavy documents. The whole merge loop runs as ONE
    // codegen'd per-row call (BpeEncodeTokens, static-call pattern), so
    // at 100 TB this is a pure map that streams at input bandwidth; the
    // oracle replays the identical loop in DuckDB (bpeCte). Output is
    // scalar-only: token count, word count, and the first 8 subword
    // tokens space-joined (tokens are [a-z]+, so the join is lossless).
    Q("q_bpe_encode",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.BpeEncodeTokens.bpeTokens(col("text")).as("toks"),
            size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
              .cast(LongType).as("n_words"))
          .select(col("doc_id"), col("n_words"),
            size(col("toks")).cast(LongType).as("n_bpe_tokens"),
            array_join(slice(col("toks"), 1, 8), " ").as("first_tokens"))
          .orderBy(col("doc_id")),
      Some(s"""$bpeCte,
              agg AS (SELECT doc_id,
                            CAST(count(*) AS BIGINT) AS n_words,
                            CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS n_bpe_tokens,
                            string_agg(array_to_string(toks, ' '), ' ' ORDER BY wid) AS full
                     FROM fin GROUP BY doc_id)
              SELECT d.doc_id,
                     CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
                     CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
                     array_to_string((string_split(coalesce(a.full, ''), ' '))[:8], ' ') AS first_tokens
              FROM documents d LEFT JOIN agg a USING (doc_id)
              ORDER BY d.doc_id""")),

    // BPE at REALISTIC VOCABULARY SCALE: the same encoder expression
    // bound to the generated 4,096-merge table (BpeMerges.generated —
    // closed-form ranks, so the DuckDB mirror computes them
    // arithmetically instead of carrying a 4k-entry literal). This row
    // prices the merge loop where it matters: the heap + linked-list
    // encode is O(len log len) per word with a property-pinned LINEAR
    // op count (BpeSpec), so the bench line for this query IS the
    // measured per-row cost at realistic vocab — still one codegen'd
    // per-row call, a pure map at input bandwidth.
    Q("q_bpe_encode_big",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.BpeEncodeTokens.bpeTokensBig(col("text")).as("toks"),
            size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
              .cast(LongType).as("n_words"))
          .select(col("doc_id"), col("n_words"),
            size(col("toks")).cast(LongType).as("n_bpe_tokens"),
            array_join(slice(col("toks"), 1, 8), " ").as("first_tokens"))
          .orderBy(col("doc_id")),
      Some(s"""$bpeCteBig,
              agg AS (SELECT doc_id,
                            CAST(count(*) AS BIGINT) AS n_words,
                            CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS n_bpe_tokens,
                            string_agg(array_to_string(toks, ' '), ' ' ORDER BY wid) AS full
                     FROM fin GROUP BY doc_id)
              SELECT d.doc_id,
                     CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
                     CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
                     array_to_string((string_split(coalesce(a.full, ''), ' '))[:8], ' ') AS first_tokens
              FROM documents d LEFT JOIN agg a USING (doc_id)
              ORDER BY d.doc_id""")),

    // FULL-CHARSET BPE (BpeCodec.encodeDocFull — the GPT-2 byte-level
    // convention): digits join words, ASCII case folds, and every other
    // code point falls back to <0xNN> UTF-8 byte tokens, so NOTHING in
    // the input stops counting toward token budgets — the fix for the
    // [a-z]-only word class silently dropping digits, punctuation, and
    // non-Latin scripts on real web text. The fixture corpus is pure
    // [a-z ], so a deterministic suffix (FullCharsetSuffix + doc_id,
    // shared verbatim with the oracle) plants case/digit/punct/
    // multi-byte content per document; the query reports the
    // letters-only count beside the full count, making the measured
    // undercount (the fertility delta) a hash-checked column. Still ONE
    // codegen per-row call — a pure map at input bandwidth at 100 TB.
    Q("q_bpe_encode_full",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"), lit(" #"), col("doc_id").cast(StringType),
              lit(FullCharsetSuffix)).as("tf"))
          .select(col("doc_id"),
            graft.functions.BpeEncodeTokens.bpeTokensFull(col("tf")).as("toks"),
            graft.functions.BpeEncodeTokens.bpeTokens(col("tf")).as("toks_l"))
          .select(col("doc_id"),
            size(col("toks")).cast(LongType).as("n_tokens_full"),
            size(col("toks_l")).cast(LongType).as("n_tokens_letters"),
            (size(col("toks")) - size(col("toks_l"))).cast(LongType)
              .as("undercount"),
            array_join(slice(col("toks"), 1, 8), " ").as("first_tokens"))
          .orderBy(col("doc_id")),
      Some(s"""$bpeCteFull
              SELECT a.doc_id,
                     CAST(len(a.tk) AS BIGINT) AS n_tokens_full,
                     CAST(coalesce(o.n_letters, 0) AS BIGINT) AS n_tokens_letters,
                     CAST(len(a.tk) - coalesce(o.n_letters, 0) AS BIGINT) AS undercount,
                     array_to_string(a.tk[:8], ' ') AS first_tokens
              FROM agg a LEFT JOIN oldc o USING (doc_id)
              ORDER BY a.doc_id""")),

    // ROUND-TRIP BPE (BpeCodec.encodeDocExact + BpeCodec.decodeTokens —
    // the fidelity every production tokenizer has and the lossy modes
    // trade away): no case folding, no whitespace dropping, every input
    // byte carried by exactly one token, so decode(encode(s)) == s
    // byte-for-byte. Packed shards built in this mode (bpeIdsExact /
    // writeBatch(exact = true)) are detokenizable artifacts. The pin is
    // two-sided: n_tokens/first_tokens hash-pin the tokenization (the
    // oracle replays segmentation + merges), while text_md5 is computed
    // by Spark THROUGH encode→decode but by DuckDB directly on the raw
    // suffixed text — a hash match IS an independent round-trip proof on
    // every gate document (a lossy encode cannot fake it). The suffix
    // plants case, tab, newline, a double space, '<', an apostrophe and
    // multi-byte UTF-8 per doc. Still ONE codegen per-row call per side.
    Q("q_bpe_encode_roundtrip",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"), lit(" #"), col("doc_id").cast(StringType),
              lit(RoundTripSuffix)).as("tf"))
          .select(col("doc_id"),
            graft.functions.BpeEncodeTokens.bpeTokensExact(col("tf")).as("toks"))
          .select(col("doc_id"), col("toks"),
            graft.functions.BpeEncodeTokens.bpeDecode(col("toks")).as("dec"))
          .select(col("doc_id"),
            size(col("toks")).cast(LongType).as("n_tokens"),
            array_join(slice(col("toks"), 1, 8), " ").as("first_tokens"),
            md5(col("dec").cast(BinaryType)).as("text_md5"),
            octet_length(col("dec")).cast(LongType).as("n_bytes"))
          .orderBy(col("doc_id")),
      Some(s"""$bpeCteExact
              SELECT c.doc_id,
                     CAST(len(a.tk) AS BIGINT) AS n_tokens,
                     array_to_string(a.tk[:8], ' ') AS first_tokens,
                     md5(c.t) AS text_md5,
                     CAST(octet_length(encode(c.t)) AS BIGINT) AS n_bytes
              FROM corp c JOIN agg a USING (doc_id)
              ORDER BY c.doc_id""")),

    // Sequence packing re-pointed at BPE counts — budget-accurate
    // packing: the 256-token training sequences are cut in SUBWORD
    // units, so the (document, sequence) lineage map prices every
    // document by what the trainer actually consumes. Same two-phase
    // offset machinery (tokenShards with the BPE count column); docs
    // with zero [a-z] words carry zero tokens and pack nothing (both
    // sides filter n_tokens > 0 — a zero-length span has no sequence).
    Q("q_pack_sequences_bpe",
      (s, dir) => {
        val L = 256L
        tokenShards(t(s, dir, "documents"), budget = L,
          nTokens = size(
            graft.functions.BpeEncodeTokens.bpeTokens(col("text")))
            .cast(LongType))
          .filter(col("n_tokens") > 0)
          .withColumn("seq_last", expr(s"(offset + n_tokens - 1) div ${L}L"))
          .withColumn("seq", explode(sequence(col("shard"), col("seq_last"))))
          .select(col("doc_id"), col("seq"),
            (least(col("offset") + col("n_tokens"), (col("seq") + 1) * L)
              - greatest(col("offset"), col("seq") * L)).as("tok_in_seq"))
          .orderBy(col("doc_id"), col("seq"))
      },
      Some(s"""$bpeCte,
              cnt AS (SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
                      FROM fin GROUP BY doc_id),
              o AS (SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
                    FROM cnt),
              b AS (SELECT doc_id, off, n_tokens,
                     CAST(off // 256 AS BIGINT) AS s0,
                     CAST((off + n_tokens - 1) // 256 AS BIGINT) AS s1
                    FROM o WHERE n_tokens > 0)
              SELECT doc_id, seq,
                     CAST(least(off + n_tokens, (seq + 1) * 256) - greatest(off, seq * 256) AS BIGINT) AS tok_in_seq
              FROM (SELECT doc_id, off, n_tokens, unnest(range(s0, s1 + 1)) AS seq FROM b)
              ORDER BY doc_id, seq""")),

    // PACKED SHARDS ON THE GATE — the reader-side audit of the
    // packed-training-shard writer (sources.PackedShards): pack the
    // corpus into 256-token-id sequences, WRITE them as shard-partitioned
    // parquet, read the artifact back, and report per-shard totals —
    // sequence count, token count, full-sequence count, the SUM OF TOKEN
    // IDS (a content checksum: any dropped/duplicated/misordered-across-
    // boundary token moves it), and contributing-doc count. The oracle
    // never sees the writer: it rebuilds the expected numbers
    // arithmetically from the same BPE token stream (bpeCte) + the
    // BpeVocab id scheme + integer offset arithmetic, so a hash match
    // proves the MATERIALIZED artifact carries exactly the right ids in
    // exactly the right sequences. Writer scale shape: one codegen
    // id-encode pass, two-phase offsets, one grouped shuffle of output
    // bytes (see PackedShards doc); budget exactness + replay idempotence
    // of the streaming form are spec-pinned (PackedShardsSpec).
    Q("q_pack_shards",
      (s, dir) => packShardsAudit(s, t(s, dir, "documents")),
      Some(s"$bpeCte$packShardsTailSql")),

    // The RESUMABLE writer on the gate: the range-committed pack
    // (PackedShards.writeBatchResumable at 32 shards per range — ~2
    // ranges at gate SF, so the manifest/commit path genuinely cycles)
    // must ship a byte-identical artifact to the one-shot writer, so it
    // shares q_pack_shards' reader-side audit AND its oracle verbatim.
    // The kill/resume semantics themselves are spec-pinned
    // (StreamingPackedShardsSpec); this row pins the shipped bytes.
    Q("q_pack_shards_resumable",
      (s, dir) => packShardsAudit(s, t(s, dir, "documents"),
        resumable = true),
      Some(s"$bpeCte$packShardsTailSql")),

    // SHUFFLED pack — training-order randomization as a SORT KEY, not a
    // job: documents lay out in md5('epoch1:' || doc_id) order (the
    // epochShuffle convention, so the data-loader sharding and the pack
    // layout agree on one permutation — spec-pinned), sequences cut in
    // that order, same one-shuffle writer. The oracle is the plain pack
    // audit with ONE changed ORDER BY — the whole feature is the order.
    // Per-shard sums differ completely from q_pack_shards (the
    // permutation re-seats every boundary), so the hash match pins the
    // exact shuffled layout, not just conservation.
    Q("q_pack_shards_shuffled",
      (s, dir) => packShardsAudit(s, t(s, dir, "documents"),
        shuffleSeed = Some("epoch1")),
      Some(s"$bpeCte${packShardsTailSqlOrdered(
        "md5('epoch1:' || CAST(doc_id AS VARCHAR)), doc_id")}")),

    // The EXACT-mode shipped artifact: the byte-LOSSLESS pack
    // (writeBatch(exact = true) / bpeIdsExact — GPT-2 Ġ-style space
    // gluing, no case folding, no whitespace dropping) written by the
    // REAL writer, read back, every token id folded into the checksum.
    // Detokenizability (decode == corpus bytes) is spec-pinned; this
    // row hash-pins the artifact's exact id stream against an
    // arithmetic oracle replaying segmentation, merges, the exact
    // vocab (a-z/0-9/<0xNN>/products), and the pack arithmetic — the
    // last pack variant that was spec-only.
    Q("q_pack_shards_exact",
      (s, dir) => packShardsAudit(s, t(s, dir, "documents"),
        idsExpr = Some(
          graft.functions.BpeEncodeIds.bpeIdsExact(col("text")))),
      Some(s"${bpeCteExactOver(
        "SELECT doc_id, text AS t FROM documents")}$packShardsExactTailSql")),

    // ARTIFACT-LEVEL detokenization round-trip — the strongest proof in
    // the pack family: the corpus goes text → exact encode → pack →
    // WRITE (real parquet shards) → READ BACK → per-doc reassembly from
    // the span maps → vocab-inverse decode → md5, while the oracle never
    // touches the artifact at all: it md5s the RAW documents. A hash
    // match means the shipped shards carry every byte of every document
    // and the (doc_id, start, len) span maps are exact — one wrong
    // boundary, dropped token, or id collision anywhere in the
    // write/read path moves some document's md5. Reader-side scale
    // shape: spans slice each doc's ids out of its 1-2 sequences
    // map-side; the groupBy(doc_id) shuffle carries exactly the corpus'
    // token ids once — the inverse of the pack shuffle, which IS the
    // detokenize semantics — and decode runs as one codegen call
    // (BpeDecodeIds) so text is rebuilt executor-side and only the
    // 16-byte md5 leaves.
    Q("q_pack_detokenize",
      (s, dir) => {
        val out = graft.sources.Scratch.tempDir("graft_pack_detok") + "/shards"
        detokenizeArtifact(
          graft.sources.PackedShards.writeBatch(s, t(s, dir, "documents"),
            out, exact = true))
      },
      Some("SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id")),

    // The same round-trip over the SHUFFLED artifact — the layout a
    // training run actually ships (md5(seed:doc_id) permutation,
    // q_pack_shards_shuffled). Detokenization is LAYOUT-INVARIANT by
    // construction (the span maps name their documents, whatever order
    // the stream packed them in), so the oracle is IDENTICAL to the
    // plain row's: md5 of the raw documents. A hash match here pins
    // that the permuted artifact, too, carries every byte — and that
    // the reassembly path depends on nothing but the span maps.
    Q("q_pack_detokenize_shuffled",
      (s, dir) => {
        val out = graft.sources.Scratch.tempDir("graft_pack_detok_sh") + "/shards"
        detokenizeArtifact(
          graft.sources.PackedShards.writeBatchShuffled(s,
            t(s, dir, "documents"), out, "epoch1", exact = true))
      },
      Some("SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id")),

    // Token-level decontamination of the packed ARTIFACT: eval docs
    // (doc_id % 97 == 0) are held out of the pack; every 5-token-id
    // window of the packed train stream that also occurs in an eval
    // doc's encoding is reported at its (shard, seq) coordinates with
    // eval/train attribution and the first contaminated position. The
    // raw-text twin is q_decontaminate/q_decontaminate_spans; this one
    // runs on what the model actually sees. Oracle: one MATERIALIZED
    // BPE replay, per-doc id arrays, a cumulative train-offset sum,
    // ':'-joined gram strings vs Spark's xxhash64 of the same strings.
    Q("q_pack_decontaminate",
      (s, dir) => packDecontaminate(t(s, dir, "documents"),
        col("doc_id") % 97 === 0, ngram = 5),
      Some(packDecontaminateOracle(5))),

    // The LOSS MASK over those hits: every covered position
    // (pos..pos+4 per hit window), merged into maximal intervals per
    // 256-token sequence — what a trainer applies to neutralize the
    // leak WITHOUT re-shipping shards. Same hit relation; the mask
    // arithmetic (coverage, dedup, per-seq islands) replays in full.
    Q("q_pack_loss_mask",
      (s, dir) => packLossMask(t(s, dir, "documents"),
        col("doc_id") % 97 === 0, ngram = 5),
      Some(packLossMaskOracle(5))),

    // Pack AFTER the decontamination kill — the composed form a lab
    // actually ships: eval docs (doc_id % 97 == 0) held out, training
    // docs sharing >= 2 distinct shingles with any eval doc dropped
    // (q_decontaminate's exact rule), survivors packed by the real
    // writer and audited per shard. Every shard boundary re-seats when
    // the kill set changes, so the hash match pins the composed
    // decontaminate -> pack arithmetic end to end. The oracle inlines
    // the q_decontaminate flag test as the pack replay's corpus filter.
    Q("q_pack_decontaminated",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val flagged = graft.ops.PipelineOps.decontaminate(docs,
          col("doc_id") % 97 === 0, 2).select(col("doc_id"))
        val survivors = docs.filter(col("doc_id") % 97 =!= 0)
          .join(flagged, Seq("doc_id"), "left_anti")
        packShardsAudit(s, survivors)
      },
      Some(s"${bpeCteOver(
        """SELECT doc_id, text FROM documents
           WHERE doc_id % 97 <> 0 AND doc_id NOT IN (
             SELECT doc_id FROM (
               SELECT a.doc_id, b.doc_id AS eval_id, count(*) AS c
               FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                        range(1, CASE WHEN len(ws) >= 3 THEN len(ws) - 1 ELSE 2 END),
                        i -> CASE WHEN len(ws) >= 3
                                  THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                  ELSE text END))) AS s
                     FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
                           FROM documents)) a
                 JOIN (SELECT doc_id, unnest(list_distinct(list_transform(
                        range(1, CASE WHEN len(ws) >= 3 THEN len(ws) - 1 ELSE 2 END),
                        i -> CASE WHEN len(ws) >= 3
                                  THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                  ELSE text END))) AS s
                     FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
                           FROM documents)) b ON a.s = b.s
               WHERE b.doc_id % 97 = 0 AND a.doc_id % 97 <> 0
               GROUP BY 1, 2)
             GROUP BY doc_id HAVING max(c) >= 2)""")}$packShardsTailSql")),

    // Token-exact per-shard source composition of the packed artifact
    // (dataset-card provenance): interval arithmetic over per-doc
    // [offset, offset+n) spans — no per-token rows on either engine.
    Q("q_shard_provenance",
      (s, dir) => shardProvenance(t(s, dir, "documents")),
      Some(shardProvenanceOracle(2048L))),

    // Provenance of the SHUFFLED artifact — the layout a training run
    // actually ships (q_pack_shards_shuffled's permutation): the same
    // interval arithmetic over offsets in md5(seed:doc_id) order. The
    // permutation re-seats every doc, so per-shard compositions differ
    // completely from the plain layout — a shuffle that silently
    // changed the layout would move every row of this readout.
    Q("q_shard_provenance_shuffled",
      (s, dir) => shardProvenance(t(s, dir, "documents"),
        shuffleSeed = Some("epoch1")),
      Some(shardProvenanceOracle(2048L,
        "md5('epoch1:' || CAST(doc_id AS VARCHAR)), doc_id"))),

    // The BYTE-LEVEL shipped artifact: the same pack-and-audit pass under
    // the full-charset tokenizer over the derived mixed-content corpus
    // (the q_bpe_encode_full fixture), so the sequences carry word
    // subwords, digit tokens, AND <0xNN> byte-fallback ids — what a real
    // web-text training shard holds. The oracle extends the full-charset
    // encode replay (bpeCteFull) with the BpeVocab id arithmetic
    // including hex-parsed byte-token ids (36 + NN), then the same
    // integer sequence/shard math — the shipped bytes of the byte-level
    // pipeline, hash-pinned.
    Q("q_pack_shards_full",
      (s, dir) => packShardsAudit(s,
        t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"), lit(" #"), col("doc_id").cast(StringType),
            lit(FullCharsetSuffix)).as("text")),
        fullCharset = true),
      Some {
        val prods = graft.functions.BpeMerges.table
          .map { case (a, b) => s"'$a$b'" }.mkString("[", ",", "]")
        s"""$bpeCteFull,
           tflat AS (SELECT doc_id, generate_subscripts(tk, 1) AS ti,
                            unnest(tk) AS t
                     FROM agg),
           gf AS (SELECT doc_id, t,
                         row_number() OVER (ORDER BY doc_id, ti) - 1 AS pos
                  FROM tflat),
           idsf AS (SELECT doc_id, pos,
                      CASE WHEN len(t) = 6 AND t[1:3] = '<0x'
                             THEN 36 + (strpos('0123456789ABCDEF', t[4]) - 1) * 16
                                     + (strpos('0123456789ABCDEF', t[5]) - 1)
                           WHEN len(t) = 1 AND t >= 'a' AND t <= 'z'
                             THEN ascii(t) - 97
                           WHEN len(t) = 1 AND t >= '0' AND t <= '9'
                             THEN 26 + ascii(t) - 48
                           ELSE 291 + list_position($prods, t) END AS tid
                    FROM gf),
           seqsf AS (SELECT pos // 256 AS seq,
                            CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(tid) AS BIGINT) AS ts,
                            CAST(sum(doc_id) AS BIGINT) AS sd,
                            CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
                     FROM idsf GROUP BY 1)
           SELECT CAST(seq // 8 AS BIGINT) AS shard,
                  CAST(count(*) AS BIGINT) AS n_seqs,
                  CAST(sum(n) AS BIGINT) AS n_tokens,
                  CAST(sum(CASE WHEN n = 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
                  CAST(sum(ts) AS BIGINT) AS tid_sum,
                  CAST(sum(sd) AS BIGINT) AS span_sum,
                  CAST(sum(nd) AS BIGINT) AS n_contribs
           FROM seqsf GROUP BY 1 ORDER BY 1"""
      }),

    // TRAIN → PACK: learn the merge table from the corpus (the bounded
    // q_bpe_train histogram + driver rounds), then ship shards priced in
    // the LEARNED vocabulary — the actual production flow, where the
    // tokenizer is a product of the corpus rather than a committed
    // fixture. The learned table rides the serialized BpeEncodeIdsWith
    // expression to executors (its BpeVocab assigns rank r -> 292 + r);
    // the oracle chains the unrolled training rounds, the learned-table
    // encode (a word-level join against the training chain's final
    // relation — see bpeTrainEncodeCtes for why that equals the greedy
    // encoder), the learned-products id map, and the pack arithmetic
    // into ONE SQL statement — training, tokenization, and the shipped
    // artifact hash-pinned end-to-end.
    Q("q_pack_shards_trained",
      (s, dir) => {
        // 1-in-5 corpus slice on BOTH sides — the exact-regime-anchor
        // convention (q_dedup_minhash); the full-corpus composition is
        // the identical code minus the filter
        val docs5 = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        val hist = bpeWordHistogram(docs5)
        val learned = graft.functions.BpeTrainer.train(hist, NumTrainMerges)
          .map(m => (m._2, m._3))
        packShardsAudit(s, docs5,
          idsExpr = Some(graft.functions.BpeEncodeIds
            .bpeIdsWith(col("text"), learned)))
      },
      Some(packShardsTrainedOracle)),

    // The BYTE-LEVEL train → pack composition — the full production
    // matrix closed in one hash: learn the merge table over full-charset
    // UNITS (q_bpe_train_full's trainer, digit + byte-token merges
    // included), encode the derived corpus with the LEARNED table under
    // the byte-fallback convention, pack into shards, read the artifact
    // back. The shipped ids mix base ids (letters/digits/<0xNN>) with
    // learned-product ids (292 + rank), so the hash pins the learned
    // byte-level tokenizer all the way into the training-shard bytes.
    Q("q_pack_shards_trained_full",
      (s, dir) => {
        val learned = trainFullMerges(s, dir).map(m => (m._2, m._3))
        packShardsAudit(s,
          t(s, dir, "documents")
            .select(col("doc_id"), foldedDerivedCol.as("text")),
          idsExpr = Some(graft.functions.BpeEncodeIds
            .bpeIdsWith(col("text"), learned, fullCharset = true)))
      },
      Some(packShardsTrainedFullOracle)),

    // PII scrubbing (the redaction pass every public-web training corpus
    // runs before anything else): emails, NANP-style phone numbers and
    // IPv4 addresses are counted and replaced with typed placeholder
    // tokens. The corpus has no organic PII, so a deterministic fixture
    // is synthesized per doc_id (the q_html_strip convention — both
    // engines build the identical wrapper, so the scrub is exercised on
    // real matches, not vacuous zero counts): every 3rd doc gains an
    // email, every 5th a phone, every 7th an IP. Scrub order
    // email → ip → phone is fixed and non-overlapping on these
    // patterns. One codegen regex pass per pattern, no shuffle before
    // the declared sort — at 100 TB this streams at input bandwidth.
    // The scrubbed text is pinned by md5 (scalar output; DuckDB and
    // Spark md5 agree bytewise) rather than shipping megabyte strings.
    Q("q_pii_scrub",
      (s, dir) => {
        val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
        val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val withPii = concat(
          when(col("doc_id") % 3 === 0,
            concat(lit("contact user"), col("doc_id").cast(StringType),
              lit("@example.com "))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit("call 555-"),
              lpad((col("doc_id") % 1000).cast(StringType), 3, "0"),
              lit("-4321 "))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit("from 10.0."), (col("doc_id") % 256).cast(StringType),
              lit("."), (col("doc_id") % 100).cast(StringType), lit(" ")))
            .otherwise(lit("")),
          col("text"))
        val scrubbed = regexp_replace(
          regexp_replace(regexp_replace(withPii, lit(email), lit("[EMAIL]")),
            lit(ip), lit("[IP]")),
          lit(phone), lit("[PHONE]"))
        t(s, dir, "documents")
          .select(col("doc_id"),
            regexp_count(withPii, lit(email)).cast(LongType).as("n_email"),
            regexp_count(withPii, lit(phone)).cast(LongType).as("n_phone"),
            regexp_count(withPii, lit(ip)).cast(LongType).as("n_ip"),
            length(scrubbed).cast(LongType).as("len_scrubbed"),
            md5(scrubbed.cast("binary")).as("scrub_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (SELECT doc_id,
                     (CASE WHEN doc_id % 3 = 0
                           THEN 'contact user' || doc_id || '@example.com ' ELSE '' END) ||
                     (CASE WHEN doc_id % 5 = 0
                           THEN 'call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4321 ' ELSE '' END) ||
                     (CASE WHEN doc_id % 7 = 0
                           THEN 'from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) || ' ' ELSE '' END) ||
                     text AS t
              FROM documents),
              s AS (SELECT doc_id, t,
                     regexp_replace(regexp_replace(regexp_replace(t,
                       '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                       '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS scrubbed
              FROM p)
              SELECT doc_id,
                     CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
                     CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
                     CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
                     CAST(length(scrubbed) AS BIGINT) AS len_scrubbed,
                     md5(scrubbed) AS scrub_md5
              FROM s ORDER BY doc_id""")),

    // Subword vocabulary distribution — the tokenizer-health readout
    // (fertility / coverage): corpus-wide BPE token frequencies, top 25
    // by count. One codegen encode pass + explode + one count shuffle on
    // the (small) subword vocabulary, TakeOrdered for the top-k — the
    // aggregate is O(|vocab|) however large the corpus.
    Q("q_bpe_token_freq",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(
            graft.functions.BpeEncodeTokens.bpeTokens(col("text"))).as("tok"))
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .limit(25),
      Some(s"""$bpeCte,
              flat AS (SELECT unnest(toks) AS tok FROM fin)
              SELECT tok, CAST(count(*) AS BIGINT) AS n
              FROM flat GROUP BY tok
              ORDER BY n DESC, tok LIMIT 25""")),

    // Tokenizer fertility by document-length bucket — the health metric
    // a tokenizer team tracks per domain: subword tokens per word and
    // letters per subword token, bucketed short/medium/long. All inputs
    // are integer sums (letters, words, BPE tokens — one codegen encode
    // pass); the two fertility ratios are single double divisions of
    // those exact totals, so both engines agree bitwise. An upstream
    // vocabulary change shows up here first: fertility rising on one
    // bucket means that slice of the corpus is being priced wrongly.
    Q("q_bpe_fertility",
      (s, dir) => {
        val nW = size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .cast(LongType)
        val nL = length(expr("regexp_replace(lower(text), '[^a-z]', '')"))
          .cast(LongType)
        val nB = size(
          graft.functions.BpeEncodeTokens.bpeTokens(col("text"))).cast(LongType)
        t(s, dir, "documents")
          .select(
            when(nW < 30, "short").when(nW < 60, "medium")
              .otherwise("long").as("bucket"),
            nW.as("w"), nL.as("l"), nB.as("b"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("w")).as("n_words"),
            sum(col("b")).as("n_bpe_tokens"),
            (sum(col("b")).cast(DoubleType) / sum(col("w")))
              .as("tokens_per_word"),
            (sum(col("l")).cast(DoubleType) / sum(col("b")))
              .as("chars_per_token"))
          .orderBy(col("bucket"))
      },
      Some(s"""$bpeCte,
              per AS (SELECT doc_id,
                            CAST(count(*) AS BIGINT) AS w,
                            CAST(sum(len(toks)) AS BIGINT) AS b,
                            CAST(sum(len(array_to_string(toks, ''))) AS BIGINT) AS l
                      FROM fin GROUP BY doc_id),
              bk AS (SELECT d.doc_id,
                            CASE WHEN coalesce(p.w, 0) < 30 THEN 'short'
                                 WHEN coalesce(p.w, 0) < 60 THEN 'medium'
                                 ELSE 'long' END AS bucket,
                            coalesce(p.w, 0) AS w, coalesce(p.b, 0) AS b,
                            coalesce(p.l, 0) AS l
                     FROM documents d LEFT JOIN per p USING (doc_id))
              SELECT bucket, COUNT(*) AS n_docs,
                     CAST(SUM(w) AS BIGINT) AS n_words,
                     CAST(SUM(b) AS BIGINT) AS n_bpe_tokens,
                     CAST(SUM(b) AS DOUBLE) / SUM(w) AS tokens_per_word,
                     CAST(SUM(l) AS DOUBLE) / SUM(b) AS chars_per_token
              FROM bk GROUP BY bucket ORDER BY bucket""")),

    // BPE tokenizer TRAINING on the hard gate — the other half of the
    // subword seam (encode applies a merge table; this LEARNS one from
    // the corpus). Scale shape is the standard trainer's (subword-nmt /
    // HF tokenizers): ONE distributed map-side-combined aggregation
    // builds the word histogram — the only corpus pass — bounded by a
    // count floor + top-N cap INSIDE the plan (bpeWordHistogram above;
    // distinct word forms are NOT bounded on web text, so the cap is
    // what makes the driver collect safe at 100 TB), and the merge
    // rounds then run on the driver over the capped histogram (see
    // functions.BpeTrainer). Each round: weighted adjacent-pair count,
    // argmax with (count DESC, a, b) deterministic tie-break, left-to-
    // right non-overlapping application. The oracle replays the
    // identical rounds as an unrolled CTE chain built from the same
    // NumTrainMerges constant.
    Q("q_bpe_train",
      (s, dir) => {
        val hist = bpeWordHistogram(t(s, dir, "documents"))
        val merges = graft.functions.BpeTrainer.train(hist, NumTrainMerges)
        import s.implicits._
        merges.toDF("rank", "a", "b", "pair_count").orderBy(col("rank"))
      },
      Some(bpeTrainOracle())),

    // BYTE-LEVEL TRAINING — the full-charset sibling of q_bpe_train,
    // learning merges over the SAME alphabet the full-charset encoder
    // emits: the unit histogram of the ASCII-folded derived corpus
    // ([a-z0-9]+ runs as chars, every other code point as its <0xNN>
    // UTF-8 byte tokens), so punctuation, digits, and non-Latin bytes
    // CAN become merges — the round-10 letters-only trainer could never
    // learn them, so a learned table on real web text under-compressed
    // exactly the content the full charset admitted. 48 rounds: deep
    // enough that the fixture's digit ("42", "100", doc ids) and
    // multi-byte (ï é —) pairs enter after the frequent letter pairs
    // (BpeSpec pins ≥1 non-letter merge). Same bounded histogram (floor
    // + top-N INSIDE the aggregation), same driver rounds over units,
    // unrolled-CTE oracle with the unit decomposition in SQL.
    Q("q_bpe_train_full",
      (s, dir) => {
        import s.implicits._
        trainFullMerges(s, dir)
          .toDF("rank", "a", "b", "pair_count").orderBy(col("rank"))
      },
      Some(bpeTrainFullOracle)),

    // Byte-level TRAIN → ENCODE composition: price the derived corpus in
    // the just-learned byte-level vocabulary — the full-charset twin of
    // q_bpe_train_encode, proving the learned digit/byte merges actually
    // fire at encode time (n_tokens_learned < the untrained full encode
    // wherever a learned merge applies). The learned table rides the
    // serialized BpeEncodeTokensWith(fullCharset) expression; the oracle
    // joins the segment stream against the training chain's final
    // relation and reassembles per document by segment position.
    Q("q_bpe_train_encode_full",
      (s, dir) => {
        val learned = trainFullMerges(s, dir).map(m => (m._2, m._3))
        t(s, dir, "documents")
          .select(col("doc_id"), foldedDerivedCol.as("tf"))
          .select(col("doc_id"),
            graft.functions.BpeEncodeTokens
              .bpeTokensWith(col("tf"), learned, fullCharset = true)
              .as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast(LongType).as("n_tokens_learned"),
            array_join(slice(col("toks"), 1, 8), " ").as("first_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(bpeTrainEncodeFullOracle)),

    // Train → encode COMPOSITION: learn the merge table from the corpus
    // (one histogram pass + driver rounds, as q_bpe_train), then
    // immediately re-price the corpus with the LEARNED tokenizer — the
    // table rides the serialized BpeEncodeTokensWith expression to
    // executors, and the encode pass is the same codegen'd heap loop as
    // the committed-table queries. The oracle chains the unrolled
    // training rounds into a rank-ordered merge list and runs the
    // recursive encode CTE against it: train → encode end-to-end in one
    // SQL statement, hash-matched.
    Q("q_bpe_train_encode",
      (s, dir) => {
        val hist = bpeWordHistogram(t(s, dir, "documents"))
        val learned = graft.functions.BpeTrainer.train(hist, NumTrainMerges)
          .map(m => (m._2, m._3))
        t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.BpeEncodeTokens.bpeTokensWith(col("text"), learned)
              .as("toks"),
            size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
              .cast(LongType).as("n_words"))
          .select(col("doc_id"), col("n_words"),
            size(col("toks")).cast(LongType).as("n_tokens_learned"),
            array_join(slice(col("toks"), 1, 8), " ").as("first_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(bpeTrainEncodeOracle)),

    // Model-based quality scoring (the fasttext-style curation
    // classifier): a 256-feature hashed linear model with a fixed public
    // weight scheme, evaluated in ONE codegen byte pass per document
    // (functions.LinearTextScore — per-word Karp-Rabin fold -> bucket ->
    // Knuth-hash weight, integer sum). The only double op is the final
    // normalization division, so both engines agree bitwise; the keep
    // decision is the score sign. At 100 TB this is a pure map —
    // streams at input bandwidth, no shuffle before the declared sort.
    Q("q_quality_classifier",
      (s, dir) => {
        val nWords = size(split(col("text"), " ")).cast(LongType)
        t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.linearTextScore(col("text"))
              .as("score_int"),
            nWords.as("n_words"))
          .withColumn("score",
            col("score_int").cast(DoubleType) / (lit(1000.0) * col("n_words")))
          .withColumn("keep", col("score_int") > 0L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH sc AS (SELECT doc_id,
                     CAST(list_sum(list_transform(
                       list_filter(string_split(text, ' '), w -> w <> ''),
                       w -> ((list_reduce(list_prepend(0::BIGINT,
                               list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                             (a, x) -> (a * 31 + x) % 1000000007) % 256)
                             * 2654435761) % 2001 - 1000)) AS BIGINT) AS score_int,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
              FROM documents)
              SELECT doc_id, score_int, n_words,
                     CAST(score_int AS DOUBLE) / (1000.0::DOUBLE * n_words) AS score,
                     score_int > 0 AS keep
              FROM sc ORDER BY doc_id"""))
  )
}
