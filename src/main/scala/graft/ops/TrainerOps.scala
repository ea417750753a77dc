package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Trainer-side dataset-preparation operators: the transforms a training
  * run applies between the curated corpus and the batches the model
  * actually consumes. The reference stops at the partitioned lake
  * (`processor_stock_quotes.py:84-91` writes hive-partitioned parquet and
  * leaves consumption to Athena); these rows are the NS continuation of
  * that artifact boundary — packing-efficiency accounting, length-sorted
  * batch scheduling, repetition loss-masking over the packed stream, and
  * the fill-in-the-middle reordering code models train with.
  *
  * Scale shape shared by all four: per-doc arithmetic is one codegen map
  * over the scan; every global coordinate (pack offsets, curriculum
  * ranks) comes from a two-phase spine (per-group totals, a prefix sum
  * over the FEW group rows, broadcast back) — no single-partition pass
  * over the corpus anywhere.
  */
object TrainerOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Padding-waste audit of the three packing strategies a trainer
    * chooses between, over the same corpus and the same sequence length:
    *
    *   - `concat`  — GPT-style: documents laid end-to-end, cut every L
    *     tokens. Zero intra-corpus padding (only the final sequence pads)
    *     but sequences mix documents (`n_mixed_seqs` counts them — the
    *     cross-document-attention cost of the strategy).
    *   - `pad_max` — each document cut into ceil(n/L) sequences, the tail
    *     padded to L. No document mixing, worst padding.
    *   - `bucket_pow2` — the tail pads only to the next power-of-two
    *     bucket (dynamic-shape batching): the middle ground serving
    *     stacks use.
    *
    * One row per strategy: sequence count, mixed-sequence count, pad
    * tokens, corpus tokens, and efficiency = tokens/(tokens+pad). The
    * corpus is scanned once for sizes; `concat`'s mixed count rides the
    * [[TextOps.tokenShards]] offset spine (the boundary arithmetic
    * q_pack_sequences ships), so the whole audit is aggregate-only —
    * nothing wider than one row per document ever shuffles.
    */
  def packEfficiency(docs: DataFrame, budget: Long = 256L): DataFrame = {
    val L = budget
    val offs = TextOps.tokenShards(docs, budget = L)
    // tokenShards localCheckpoints its output, so the three aggregate
    // legs below re-read a materialized relation, not the text scan
    val tot = offs.agg(sum(col("n_tokens")).as("total_tokens"))
    val concatRow = tot
      .withColumn("n_sequences", expr(s"(total_tokens + ${L - 1}) div ${L}L"))
      .withColumn("pad_tokens", col("n_sequences") * L - col("total_tokens"))
    // sequences holding >= 2 documents: each doc explodes to only the
    // sequences it touches (O(tokens/L) rows corpus-wide)
    val mixed = offs
      .select(explode(expr(
        s"sequence(offset div ${L}L, (offset + n_tokens - 1) div ${L}L)"))
        .as("seq"))
      .groupBy(col("seq")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") >= 2L, 1L).otherwise(0L)), lit(0L))
        .as("n_mixed_seqs"))
    val concatF = concatRow.crossJoin(mixed)
      .select(lit("concat").as("strategy"), col("n_sequences"),
        col("n_mixed_seqs"), col("pad_tokens"), col("total_tokens"))
    val padMaxF = offs
      .agg(sum(expr(s"(n_tokens + ${L - 1}) div ${L}L")).as("n_sequences"),
        sum(expr(s"((n_tokens + ${L - 1}) div ${L}L) * ${L}L - n_tokens"))
          .as("pad_tokens"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(lit("pad_max").as("strategy"), col("n_sequences"),
        lit(0L).as("n_mixed_seqs"), col("pad_tokens"), col("total_tokens"))
    // next power of two >= tail, tail in 1..L: a fixed CASE chain (no
    // float log2 — exactness at the 2^k boundaries must not depend on
    // libm), generated for the L the caller picked
    require(L >= 2 && (L & (L - 1)) == 0, s"budget must be a power of two, got $L")
    val steps = Iterator.iterate(1L)(_ * 2).takeWhile(_ <= L).toSeq
    val pow2Tail = steps.init.foldRight(lit(L): org.apache.spark.sql.Column) {
      (s, rest) => when(col("tail") <= s, s).otherwise(rest)
    }
    val bucketF = offs
      .withColumn("tail", col("n_tokens") % L)
      .withColumn("pad",
        when(col("tail") === 0L, 0L).otherwise(pow2Tail - col("tail")))
      .agg(sum(expr(s"n_tokens div ${L}L") +
          when(col("tail") === 0L, 0L).otherwise(1L)).as("n_sequences"),
        sum(col("pad")).as("pad_tokens"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(lit("bucket_pow2").as("strategy"), col("n_sequences"),
        lit(0L).as("n_mixed_seqs"), col("pad_tokens"), col("total_tokens"))
    concatF.union(padMaxF).union(bucketF)
      .withColumn("efficiency",
        col("total_tokens").cast(DoubleType) /
          (col("total_tokens") + col("pad_tokens")).cast(DoubleType))
      .orderBy(col("strategy"))
  }

  private def pow2CaseSql(L: Long): String = {
    val steps = Iterator.iterate(1L)(_ * 2).takeWhile(_ <= L).toSeq
    steps.init.map(s => s"WHEN t <= $s THEN $s").mkString(
      "CASE ", " ", s" ELSE $L END")
  }

  /** DuckDB oracle for [[packEfficiency]] at budget 256. */
  private val packEfficiencyOracle: String = {
    val p2 = pow2CaseSql(256L).replace("t <=", "(n % 256) <=")
    s"""WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents),
       o AS (SELECT doc_id, n,
                    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             FROM s),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM s),
       mix AS (SELECT CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m
               FROM (SELECT seq, count(*) AS c
                     FROM (SELECT unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS seq
                           FROM o) GROUP BY 1)),
       u AS (
         SELECT 'concat' AS strategy,
                CAST((total + 255) // 256 AS BIGINT) AS n_sequences,
                m AS n_mixed_seqs,
                CAST((total + 255) // 256 * 256 - total AS BIGINT) AS pad_tokens,
                total AS total_tokens
         FROM tot, mix
         UNION ALL
         SELECT 'pad_max',
                CAST(SUM((n + 255) // 256) AS BIGINT),
                0,
                CAST(SUM(((n + 255) // 256) * 256 - n) AS BIGINT),
                (SELECT total FROM tot)
         FROM s
         UNION ALL
         SELECT 'bucket_pow2',
                CAST(SUM(n // 256 + CASE WHEN n % 256 = 0 THEN 0 ELSE 1 END) AS BIGINT),
                0,
                CAST(SUM(CASE WHEN n % 256 = 0 THEN 0
                              ELSE ($p2) - n % 256 END) AS BIGINT),
                (SELECT total FROM tot)
         FROM s)
       SELECT strategy, n_sequences, n_mixed_seqs, pad_tokens, total_tokens,
              CAST(total_tokens AS DOUBLE) / CAST(total_tokens + pad_tokens AS DOUBLE) AS efficiency
       FROM u ORDER BY strategy"""
  }

  /** Length-sorted batch scheduling (the curriculum/bucketing pass that
    * cuts attention-padding waste): documents ranked by (token count,
    * doc_id) form fixed-size batches; each batch pads to its own max.
    * Output compares the `curriculum` schedule against `arrival`
    * (doc_id-order batches of the same size) — one row per (schedule,
    * batch) with its padding bill, the A/B a training team runs before
    * switching the loader to length-bucketed sampling.
    *
    * The curriculum rank is two-phase like [[TextOps.tokenShards]]:
    * per-LENGTH counts aggregate first, a prefix sum runs over the few
    * distinct length values (the only single-partition window — O(max
    * doc length), not O(docs)), and docs rank within their length group.
    * The arrival rank IS tokenShards with nTokens=1 (offset = number of
    * docs before, in doc_id order).
    */
  def lengthCurriculum(docs: DataFrame, batchSize: Long = 32L): DataFrame = {
    val sized = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("n"))
    val lenBase = sized.groupBy(col("n")).agg(count(lit(1)).as("c"))
      .withColumn("base",
        coalesce(sum(col("c")).over(Window.orderBy(col("n"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("n"), col("base"))
    val cur = sized.join(broadcast(lenBase), Seq("n"))
      .withColumn("rank", col("base") +
        row_number().over(Window.partitionBy(col("n")).orderBy(col("doc_id")))
          .cast(LongType) - 1L)
      .select(lit("curriculum").as("schedule"), col("n"),
        expr(s"rank div ${batchSize}L").as("batch_id"))
    val arr = TextOps.tokenShards(docs, budget = batchSize, nTokens = lit(1L))
      .join(sized, Seq("doc_id"))
      .select(lit("arrival").as("schedule"), col("n"),
        col("shard").as("batch_id"))
    cur.union(arr)
      .groupBy(col("schedule"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"),
        sum(col("n")).as("sum_tokens"),
        (max(col("n")) * count(lit(1)) - sum(col("n"))).as("pad_tokens"))
      .orderBy(col("schedule"), col("batch_id"))
  }

  private val lengthCurriculumOracle: String =
    """WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents),
       r AS (SELECT 'curriculum' AS schedule, n,
                    CAST((row_number() OVER (ORDER BY n, doc_id) - 1) // 32 AS BIGINT) AS batch_id
             FROM s
             UNION ALL
             SELECT 'arrival', n,
                    CAST((row_number() OVER (ORDER BY doc_id) - 1) // 32 AS BIGINT)
             FROM s)
       SELECT schedule, batch_id,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(min(n) AS BIGINT) AS min_tokens,
              CAST(max(n) AS BIGINT) AS max_tokens,
              CAST(sum(n) AS BIGINT) AS sum_tokens,
              CAST(max(n) * count(*) - sum(n) AS BIGINT) AS pad_tokens
       FROM r GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Repetition LOSS MASK over the packed stream: every pack position
    * covered by a cross-document repeated span (the
    * [[TextDedup.repeatedSpans]] corpus-granularity cut,
    * q_repeated_spans_corpus) becomes a maskable interval in the
    * q_pack_sequences layout — the artifact-level alternative to cutting
    * the spans out and re-packing, exactly as [[TextOps.packLossMask]]
    * is to [[TextOps.packDecontaminate]]. Output (shard, seq,
    * mask_start, mask_end, mask_tokens) in global positions, intervals
    * split at sequence boundaries (trainers mask within sequences).
    *
    * Scale shape: the span relation is hit-bounded (boilerplate, tiny vs
    * the corpus); positions explode from SPANS, never from documents;
    * islands partition by sequence — at most `budget` rows per
    * partition by construction. Span positions are globally unique
    * (per-doc spans are disjoint islands; documents occupy disjoint
    * offset intervals), so no dedup pass is needed before the merge.
    */
  def packRepetitionMask(docs: DataFrame, k: Int = 10, budget: Long = 256L,
      seqsPerShard: Long = 8L): DataFrame = {
    val spans = TextDedup.repeatedSpans(docs, k, crossDocOnly = true)
    val offs = TextOps.tokenShards(docs, budget)
      .select(col("doc_id"), col("offset"))
    val cov = spans.join(offs, Seq("doc_id"))
      .select(explode(expr("sequence(offset + span_start, offset + span_end)"))
        .as("p"))
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

  /** DuckDB oracle for [[packRepetitionMask]]: the q_repeated_spans_corpus
    * span relation verbatim, the whitespace-token offset cumsum, interval
    * expansion, and the per-sequence island replay (the
    * packLossMaskOracle shape).
    */
  private val packRepetitionMaskOracle: String =
    """WITH x AS (
         SELECT doc_id, ws, len(ws) AS n
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       win AS (
         SELECT doc_id, n, j AS win,
                CASE WHEN n <= 10 THEN array_to_string(ws, ' ')
                     ELSE array_to_string(ws[j+1 : j+10], ' ') END AS chunk
         FROM x, LATERAL (SELECT unnest(range(0,
                CASE WHEN n <= 10 THEN 1 ELSE n - 10 + 1 END)) AS j)),
       dup AS (SELECT chunk FROM win GROUP BY chunk
               HAVING count(DISTINCT doc_id) >= 2),
       hit AS (SELECT doc_id, n, win FROM win
               WHERE chunk IN (SELECT chunk FROM dup)),
       isl AS (
         SELECT doc_id, n, win,
                SUM(CASE WHEN prev IS NULL OR win - prev > 9 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY win) AS island
         FROM (SELECT doc_id, n, win,
                      lag(win) OVER (PARTITION BY doc_id ORDER BY win) AS prev
               FROM hit)),
       spans AS (
         SELECT doc_id, MIN(win) AS span_start,
                LEAST(MAX(win) + 9, n - 1) AS span_end
         FROM isl GROUP BY doc_id, island, n),
       offs AS (
         SELECT doc_id,
                CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM documents)),
       cov AS (SELECT unnest(range(o.off + sp.span_start,
                                   o.off + sp.span_end + 1)) AS p
               FROM spans sp JOIN offs o USING (doc_id)),
       seqp AS (SELECT CAST(p AS BIGINT) AS p, CAST(p // 256 AS BIGINT) AS seq
                FROM cov),
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

  /** Fill-in-the-middle transform (the PSM reordering code models train
    * with): a deterministic md5 coin applies FIM to half the corpus; cut
    * points (a, b) derive from two more md5 draws over the whitespace
    * token count, and the document re-renders as
    * `<PRE> prefix <SUF> suffix <MID> middle` — the model learns to
    * infill. Non-applied documents pass through (the whole text is
    * "prefix"). Output is scalar-only: the segment lengths and the md5
    * of the rendered text, so the gate compare pins every byte without
    * shipping text. Pure per-row map — streams at input bandwidth; the
    * md5 coin is the repo's replay-stable sampling convention
    * (q_hash_sample / epochShuffle).
    */
  def fimTransform(docs: DataFrame): DataFrame = {
    def h(tag: String) =
      conv(substring(md5(concat(lit(tag + ":"),
        col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")).cast(LongType))
      .withColumn("par", h("fim") % 2L)
      .withColumn("a", pmod(h("fima"), col("n") + 1L))
      .withColumn("b", col("a") + pmod(h("fimb"), col("n") - col("a") + 1L))
      .withColumn("psm", concat(lit("<PRE> "),
        expr("array_join(slice(ws, 1, CAST(a AS INT)), ' ')"),
        lit(" <SUF> "),
        expr("array_join(slice(ws, CAST(b AS INT) + 1, CAST(n - b AS INT)), ' ')"),
        lit(" <MID> "),
        expr("array_join(slice(ws, CAST(a AS INT) + 1, CAST(b - a AS INT)), ' ')")))
      .select(col("doc_id"),
        when(col("par") === 0L, 1L).otherwise(0L).as("fim_applied"),
        when(col("par") === 0L, col("a")).otherwise(col("n")).as("n_prefix"),
        when(col("par") === 0L, col("b") - col("a")).otherwise(0L).as("n_middle"),
        when(col("par") === 0L, col("n") - col("b")).otherwise(0L).as("n_suffix"),
        when(col("par") === 0L, md5(col("psm").cast(BinaryType)))
          .otherwise(md5(col("text").cast(BinaryType))).as("out_md5"))
      .orderBy(col("doc_id"))
  }

  private val fimTransformOracle: String =
    """WITH s AS (SELECT doc_id, text, string_split(text, ' ') AS ws,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             FROM documents),
       h AS (SELECT doc_id, text, ws, n,
                    CAST(('0x' || substr(md5('fim:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS par,
                    CAST(('0x' || substr(md5('fima:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % (n + 1) AS a,
                    CAST(('0x' || substr(md5('fimb:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hb
             FROM s),
       ab AS (SELECT doc_id, text, ws, n, par, a, a + hb % (n - a + 1) AS b FROM h),
       -- COALESCE each segment: DuckDB's array_to_string is string_agg
       -- underneath, so an EMPTY segment (a=0, b=n, or b=a) yields NULL
       -- and would poison the whole concat; Spark's array_join gives ''
       r AS (SELECT doc_id, par, a, b, n,
                    '<PRE> ' || COALESCE(array_to_string(ws[1 : a], ' '), '') ||
                    ' <SUF> ' || COALESCE(array_to_string(ws[b + 1 : n], ' '), '') ||
                    ' <MID> ' || COALESCE(array_to_string(ws[a + 1 : b], ' '), '') AS psm,
                    text
             FROM ab)
       SELECT doc_id,
              CAST(CASE WHEN par = 0 THEN 1 ELSE 0 END AS BIGINT) AS fim_applied,
              CAST(CASE WHEN par = 0 THEN a ELSE n END AS BIGINT) AS n_prefix,
              CAST(CASE WHEN par = 0 THEN b - a ELSE 0 END AS BIGINT) AS n_middle,
              CAST(CASE WHEN par = 0 THEN n - b ELSE 0 END AS BIGINT) AS n_suffix,
              CASE WHEN par = 0 THEN md5(psm) ELSE md5(text) END AS out_md5
       FROM r ORDER BY doc_id"""

  /** First-fit-decreasing bin packing (packing WITHOUT splitting — the
    * finetuning form: each sequence holds whole documents, padded to the
    * cap). A truly global FFD is inherently sequential, so the honest
    * distributed shape is FFD WITHIN deterministic md5 buckets: parallel
    * across buckets, one bounded in-memory fold within each (the same
    * parallel-across/sequential-within discipline as the union-find and
    * O(1)-heap folds). `hexPrefix` sizes the buckets exactly like the
    * epochShuffle layout knob — 16^hexPrefix buckets, so at the 10^11-doc
    * design point hexPrefix=6 holds ~10^4 docs per fold. Docs longer
    * than the cap truncate to it (one bin each). Output is one row per
    * (bucket, bin) with its fill and padding — the sequence manifest a
    * loader materializes. The DuckDB oracle replays the exact fold as a
    * recursive CTE over per-bucket doc lists, so the greedy placement is
    * hash-pinned end to end, not just sampled.
    */
  def packFirstFit(docs: DataFrame, cap: Long = 256L,
      hexPrefix: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    packBucketed(docs, cap, hexPrefix)
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("n"), col("doc_id"))).as("ds"))
      .as[(String, Seq[(Long, Long)])]
      .flatMap { case (bucket, ds) =>
        // sort INSIDE the fold: the collect_list build order is
        // partition-dependent, the (n desc, doc_id) fold order is not
        val sorted = ds.sortBy { case (n, id) => (-n, id) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.foreach { case (n, _) =>
          val idx = fills.indexWhere(_ + n <= cap)
          if (idx < 0) { fills += n; counts += 1L }
          else { fills(idx) += n; counts(idx) += 1L }
        }
        fills.indices.map(i =>
          (bucket, i.toLong, counts(i), fills(i), cap - fills(i)))
      }
      .toDF("bucket", "bin", "n_docs", "fill_tokens", "pad_tokens")
      .orderBy(col("bucket"), col("bin"))
  }

  /** The shared (bucket, doc_id, n) projection of the bin-packing pair
    * ([[packFirstFit]] and `streaming.StreamingBinPack`): the md5
    * hex-prefix bucket (16^hexPrefix keys) and the whitespace token
    * count truncated to the cap — ONE definition, so the batch and
    * streaming twins cannot desynchronize on the convention their
    * specs pin as agreeing. The guards live here so both forms fail at
    * declaration, not deep inside an executor task: hexPrefix <= 0
    * would silently collapse every document into one bucket (the
    * single-task corpus fold the bucketing exists to prevent), and
    * md5 has only 32 hex chars.
    */
  def packBucketed(docs: DataFrame, cap: Long, hexPrefix: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(hexPrefix >= 1 && hexPrefix <= 32,
      s"hexPrefix must be in [1, 32], got $hexPrefix")
    docs.select(
      substring(md5(col("doc_id").cast(StringType)), 1, hexPrefix).as("bucket"),
      col("doc_id"),
      least(size(split(col("text"), " ")).cast(LongType), lit(cap)).as("n"))
  }

  /** DuckDB oracle for [[packFirstFit]] at cap 256, hexPrefix 1: the FFD
    * fold as a recursive CTE — per-bucket doc lists in (n desc, doc_id)
    * order, one placement per iteration. `list_position` returns 0 (not
    * NULL) on no-match in DuckDB, hence the `= 0` open-new-bin test; the
    * first fitting bin's index comes from list_position over a boolean
    * list_transform, and the in-place bin update is an indexed
    * list_transform. Iteration count = largest bucket (~corpus/16),
    * state rows = 16 buckets — sub-second at both gate SFs.
    */
  private val packFirstFitOracle: String =
    """WITH RECURSIVE
       s AS (SELECT doc_id, LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 256) AS n,
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
             FROM documents),
       barr AS (SELECT bucket, list(n ORDER BY n DESC, doc_id) AS docs FROM s GROUP BY 1),
       rec(bucket, i, fills, counts) AS (
         SELECT bucket, 0, CAST([] AS BIGINT[]), CAST([] AS BIGINT[]) FROM barr
         UNION ALL
         SELECT rr.bucket, rr.i + 1,
                CASE WHEN list_position(list_transform(rr.fills, f -> f + b.docs[rr.i + 1] <= 256), true) = 0
                     THEN list_append(rr.fills, b.docs[rr.i + 1])
                     ELSE list_transform(rr.fills,
                            (f, j) -> CASE WHEN j = list_position(list_transform(rr.fills, g -> g + b.docs[rr.i + 1] <= 256), true)
                                           THEN f + b.docs[rr.i + 1] ELSE f END) END,
                CASE WHEN list_position(list_transform(rr.fills, f -> f + b.docs[rr.i + 1] <= 256), true) = 0
                     THEN list_append(rr.counts, 1)
                     ELSE list_transform(rr.counts,
                            (c, j) -> CASE WHEN j = list_position(list_transform(rr.fills, g -> g + b.docs[rr.i + 1] <= 256), true)
                                           THEN c + 1 ELSE c END) END
         FROM rec rr JOIN barr b USING (bucket)
         WHERE rr.i < len(b.docs)
       ),
       fin AS (SELECT r.bucket, r.fills, r.counts FROM rec r JOIN barr b USING (bucket)
               WHERE r.i = len(b.docs))
       SELECT bucket, CAST(bin - 1 AS BIGINT) AS bin, CAST(counts[bin] AS BIGINT) AS n_docs,
              CAST(fills[bin] AS BIGINT) AS fill_tokens, CAST(256 - fills[bin] AS BIGINT) AS pad_tokens
       FROM fin, LATERAL (SELECT unnest(range(1, len(fills) + 1)) AS bin)
       ORDER BY bucket, bin"""

  /** SFT prompt LOSS MASK over the packed stream: in instruction-tuning
    * packs the prompt tokens of every example are masked out of the loss
    * and only the response tokens train. Each document's prompt length
    * is an md5-deterministic fraction (0.2–0.8) of its tokens (the
    * fixture has no prompt/response field; the ARITHMETIC — interval
    * placement, boundary splits, adjacent-interval merges — is the
    * operator); its prompt occupies [offset, offset+p) of the
    * q_pack_sequences layout, split at sequence boundaries and merged
    * with adjacent neighbors. Unlike the hit-bounded contamination
    * masks, prompt intervals cover ~half the corpus — so this NEVER
    * explodes per-position rows: a doc emits one interval per touched
    * sequence (O(docs + prompt_tokens/L) rows), and the island merge
    * runs over INTERVALS (lag of the previous end), not positions.
    */
  def packSftMask(docs: DataFrame, budget: Long = 256L,
      seqsPerShard: Long = 8L): DataFrame = {
    val h = conv(substring(md5(concat(lit("sft:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    val withP = TextOps.tokenShards(docs, budget)
      .withColumn("f", lit(0.2) + lit(0.6) *
        (h.cast(DoubleType) / lit(4294967296.0)))
      .withColumn("p", lit(1L) +
        floor((col("n_tokens") - 1L).cast(DoubleType) * col("f")).cast(LongType))
    val iv = withP.select(col("offset"), col("p"),
        explode(expr(s"sequence(offset div ${budget}L, (offset + p - 1) div ${budget}L)"))
          .as("seq"))
      .select(col("seq"),
        greatest(col("offset"), col("seq") * budget).as("s"),
        least(col("offset") + col("p") - 1L, (col("seq") + 1L) * budget - 1L).as("e"))
    val w = Window.partitionBy(col("seq")).orderBy(col("s"))
    iv
      .withColumn("pe", lag(col("e"), 1).over(w))
      .withColumn("ni",
        when(col("pe").isNull || col("s") > col("pe") + 1L, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(expr(s"seq div ${seqsPerShard}L").as("shard"), col("seq"),
        col("island"))
      .agg(min(col("s")).as("mask_start"), max(col("e")).as("mask_end"))
      .select(col("shard"), col("seq"), col("mask_start"), col("mask_end"),
        (col("mask_end") - col("mask_start") + 1L).as("mask_tokens"))
      .orderBy(col("seq"), col("mask_start"))
  }

  /** DuckDB oracle for [[packSftMask]]: offsets cumsum, the same
    * one-multiply-one-floor prompt length, per-touched-sequence interval
    * clamps, and the interval-granularity island merge.
    */
  private val packSftMaskOracle: String =
    """WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents),
       o AS (SELECT doc_id, n,
                    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             FROM s),
       p AS (SELECT doc_id, n, off,
                    1 + CAST(floor(CAST(n - 1 AS DOUBLE) *
                      (0.2 + 0.6 * (CAST(('0x' || substr(md5('sft:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0))) AS BIGINT) AS p
             FROM o),
       iv AS (SELECT CAST(seq AS BIGINT) AS seq,
                     CAST(GREATEST(off, seq * 256) AS BIGINT) AS st,
                     CAST(LEAST(off + p - 1, (seq + 1) * 256 - 1) AS BIGINT) AS e
              FROM (SELECT off, p, unnest(range(off // 256, (off + p - 1) // 256 + 1)) AS seq
                    FROM p)),
       isl AS (SELECT seq, st, e,
                      SUM(CASE WHEN pe IS NULL OR st > pe + 1 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY seq ORDER BY st) AS island
               FROM (SELECT seq, st, e, lag(e) OVER (PARTITION BY seq ORDER BY st) AS pe
                     FROM iv))
       SELECT CAST(seq // 8 AS BIGINT) AS shard, seq,
              CAST(MIN(st) AS BIGINT) AS mask_start,
              CAST(MAX(e) AS BIGINT) AS mask_end,
              CAST(MAX(e) - MIN(st) + 1 AS BIGINT) AS mask_tokens
       FROM isl GROUP BY seq, island ORDER BY 2, 3"""

  /** Cross-document ATTENTION audit of concat packing: in a GPT-style
    * pack a causal-attention sequence mixes documents, and every
    * (query token, key token) pair that crosses a document boundary is
    * attention the model spends on unrelated context — the cost
    * q_pack_efficiency counts sequences for, priced here in PAIRS. Per
    * sequence: resident doc count, tokens, and
    * cross_frac = (T² − Σtᵢ²)/T² where tᵢ are the per-doc token counts
    * in the sequence — the fraction of attention pairs that are
    * cross-document, the number a block-diagonal attention mask (or
    * doc-boundary resets) would reclaim. Rides the q_pack_sequences
    * overlap arithmetic: O(tokens/L) exploded rows, aggregate-only.
    */
  def packAttentionMix(docs: DataFrame, budget: Long = 256L): DataFrame = {
    val L = budget
    TextOps.tokenShards(docs, budget = L)
      .withColumn("seq_last", expr(s"(offset + n_tokens - 1) div ${L}L"))
      .withColumn("seq", explode(expr("sequence(shard, seq_last)")))
      .select(col("seq"),
        (least(col("offset") + col("n_tokens"), (col("seq") + 1) * L)
          - greatest(col("offset"), col("seq") * L)).as("t"))
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("seq_tokens"),
        sum(col("t") * col("t")).as("ss"))
      .withColumn("cross_pairs",
        col("seq_tokens") * col("seq_tokens") - col("ss"))
      .select(col("seq"), col("n_docs"), col("seq_tokens"), col("cross_pairs"),
        (col("cross_pairs").cast(DoubleType) /
          (col("seq_tokens") * col("seq_tokens")).cast(DoubleType))
          .as("cross_frac"))
      .orderBy(col("seq"))
  }

  private val packAttentionMixOracle: String =
    """WITH o AS (SELECT doc_id, n,
                    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                   FROM documents)),
       ex AS (SELECT CAST(seq AS BIGINT) AS seq,
                     CAST(LEAST(off + n, (seq + 1) * 256) - GREATEST(off, seq * 256) AS BIGINT) AS t
              FROM (SELECT off, n, unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS seq
                    FROM o)),
       a AS (SELECT seq, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(SUM(t) AS BIGINT) AS seq_tokens,
                    CAST(SUM(t * t) AS BIGINT) AS ss
             FROM ex GROUP BY 1)
       SELECT seq, n_docs, seq_tokens,
              CAST(seq_tokens * seq_tokens - ss AS BIGINT) AS cross_pairs,
              CAST(seq_tokens * seq_tokens - ss AS DOUBLE) /
                CAST(seq_tokens * seq_tokens AS DOUBLE) AS cross_frac
       FROM a ORDER BY seq"""

  /** Interleaved MULTIMODAL pack accounting (the VLM training form):
    * image-bearing documents charge the sequence budget with a fixed
    * block of image-patch placeholder tokens (`imageTokens`, e.g. a
    * 224² image at patch 28 → 64) PREPENDED to their text, and packing
    * lays out the combined stream. Media attachment follows the
    * multimodal fixture convention (doc_id % 3 == 0 carries an image —
    * `multimodal.Multimodal.mediaTable`). One row per sequence: resident
    * docs and the image/text token split — the modality-budget readout
    * a VLM data pipeline publishes per shard. The image block is a pure
    * function of doc_id, so no join touches the corpus: offsets ride
    * the tokenShards spine with the combined count, and each doc emits
    * one clamped interval pair per touched sequence.
    */
  def packMultimodal(docs: DataFrame, budget: Long = 256L,
      imageTokens: Long = 64L): DataFrame = {
    val L = budget
    val imgOf = (c: org.apache.spark.sql.Column) =>
      when(c % 3 === 0, lit(imageTokens)).otherwise(lit(0L))
    TextOps.tokenShards(docs, budget = L,
        nTokens = size(split(col("text"), " ")).cast(LongType)
          + imgOf(col("doc_id")))
      .withColumn("img", imgOf(col("doc_id")))
      .withColumn("seq", explode(expr(
        s"sequence(offset div ${L}L, (offset + n_tokens - 1) div ${L}L)")))
      .select(col("seq"),
        greatest(least(col("offset") + col("img"), (col("seq") + 1) * L)
          - greatest(col("offset"), col("seq") * L), lit(0L)).as("img_t"),
        greatest(least(col("offset") + col("n_tokens"), (col("seq") + 1) * L)
          - greatest(col("offset") + col("img"), col("seq") * L), lit(0L)).as("txt_t"))
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("img_t")).as("image_tokens"),
        sum(col("txt_t")).as("text_tokens"))
      .select(col("seq"), col("n_docs"), col("image_tokens"), col("text_tokens"),
        (col("image_tokens").cast(DoubleType) /
          (col("image_tokens") + col("text_tokens")).cast(DoubleType))
          .as("image_frac"))
      .orderBy(col("seq"))
  }

  private val packMultimodalOracle: String =
    """WITH s AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                    CASE WHEN doc_id % 3 = 0 THEN 64 ELSE 0 END AS img
             FROM documents),
       o AS (SELECT doc_id, nt, img, nt + img AS ne,
                    CAST(COALESCE(SUM(nt + img) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             FROM s),
       ex AS (SELECT CAST(seq AS BIGINT) AS seq,
                     CAST(GREATEST(LEAST(off + img, (seq + 1) * 256) - GREATEST(off, seq * 256), 0) AS BIGINT) AS img_t,
                     CAST(GREATEST(LEAST(off + ne, (seq + 1) * 256) - GREATEST(off + img, seq * 256), 0) AS BIGINT) AS txt_t
              FROM (SELECT off, img, ne, unnest(range(off // 256, (off + ne - 1) // 256 + 1)) AS seq
                    FROM o)),
       a AS (SELECT seq, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(SUM(img_t) AS BIGINT) AS image_tokens,
                    CAST(SUM(txt_t) AS BIGINT) AS text_tokens
             FROM ex GROUP BY 1)
       SELECT seq, n_docs, image_tokens, text_tokens,
              CAST(image_tokens AS DOUBLE) / CAST(image_tokens + text_tokens AS DOUBLE) AS image_frac
       FROM a ORDER BY seq"""

  /** Per-source EPOCH accounting under a token budget: given temperature
    * mixture weights (the q_temperature_mix sqrt/floor long-weight
    * convention — no float pow parity risk) and a training budget of
    * half the corpus tokens, how many epochs of each source will the
    * run consume? epochs > 1 means the source repeats (the
    * "4-epochs-of-wikipedia" accounting a mixture design publishes);
    * epochs < 1 means subsampling. Source-cardinality aggregates only —
    * one scan, broadcast totals, five output rows.
    */
  def sourceEpochs(docs: DataFrame): DataFrame = {
    val stats = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
      .withColumn("w",
        floor(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e6)).cast(LongType))
    val tots = stats.agg(sum(col("w")).as("tw"), sum(col("n_tokens")).as("tt"))
    stats.crossJoin(broadcast(tots))
      .withColumn("share", col("w").cast(DoubleType) / col("tw").cast(DoubleType))
      .withColumn("budget_tokens",
        floor(expr("tt div 2L").cast(DoubleType) * col("share")).cast(LongType))
      .withColumn("epochs",
        col("budget_tokens").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
        col("budget_tokens"), col("epochs"))
      .orderBy(col("source"))
  }

  private val sourceEpochsOracle: String =
    """WITH stats AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                      FROM documents GROUP BY 1),
       w AS (SELECT source, n_docs, n_tokens,
                    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS w
             FROM stats),
       tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw, CAST(SUM(n_tokens) AS BIGINT) AS tt FROM w)
       SELECT source, n_docs, n_tokens,
              CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) AS share,
              CAST(floor(CAST(tt // 2 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))) AS BIGINT) AS budget_tokens,
              CAST(floor(CAST(tt // 2 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))) AS BIGINT) / CAST(n_tokens AS DOUBLE) AS epochs
       FROM w, tot ORDER BY source"""

  /** TWO-PHASE (pretrain → anneal) mixture schedule — the staged data
    * plan published two-stage pretraining recipes run (proportional
    * sampling for the bulk of training, then a final anneal phase that
    * FLATTENS the mixture so small curated sources get their epochs
    * late in training where they matter most): phase budgets split the
    * half-corpus token budget 80/20 by integer arithmetic
    * (b1 = (tt div 2) · 4 div 5, b2 = rest); phase `pretrain` weights
    * sources proportionally (w = n_tokens — temperature 1), phase
    * `anneal` flattens with the q_temperature_mix sqrt/floor long-weight
    * convention (w = ⌊√n_tokens · 10⁶⌋ — temperature 0.5). Output one
    * row per (source, phase): share, phase budget, epochs — the
    * schedule a trainer fixes before launch, with the same
    * parity-safe arithmetic as [[sourceEpochs]] (integer weights,
    * floor'd budgets, the only doubles are final ratios of exact
    * integers). Source-cardinality aggregates + broadcast totals; zero
    * corpus shuffles.
    */
  def annealMix(docs: DataFrame): DataFrame = {
    // localCheckpoint: the totals and BOTH phase legs read this tiny
    // source-cardinality relation — without it each leg of the union
    // re-runs the corpus scan (3x the only expensive stage)
    val stats = docs.groupBy(col("source")).agg(
      sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
      .withColumn("w1", col("n_tokens"))
      .withColumn("w2",
        floor(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e6)).cast(LongType))
      .localCheckpoint()
    val tots = stats.agg(sum(col("w1")).as("tw1"), sum(col("w2")).as("tw2"),
      sum(col("n_tokens")).as("tt"))
    val base = stats.crossJoin(broadcast(tots))
      .withColumn("b1", expr("(tt div 2L) * 4L div 5L"))
      .withColumn("b2", expr("tt div 2L - (tt div 2L) * 4L div 5L"))
    val p1 = base
      .withColumn("phase", lit("pretrain"))
      .withColumn("share", col("w1").cast(DoubleType) / col("tw1").cast(DoubleType))
      .withColumn("budget_tokens",
        floor(col("b1").cast(DoubleType) * col("share")).cast(LongType))
    val p2 = base
      .withColumn("phase", lit("anneal"))
      .withColumn("share", col("w2").cast(DoubleType) / col("tw2").cast(DoubleType))
      .withColumn("budget_tokens",
        floor(col("b2").cast(DoubleType) * col("share")).cast(LongType))
    p1.unionAll(p2)
      .withColumn("epochs",
        col("budget_tokens").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .select(col("source"), col("phase"), col("n_tokens"), col("share"),
        col("budget_tokens"), col("epochs"))
      .orderBy(col("source"), col("phase"))
  }

  private val annealMixOracle: String =
    """WITH stats AS (SELECT source,
                             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                      FROM documents GROUP BY 1),
       w AS (SELECT source, n_tokens, n_tokens AS w1,
                    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS w2
             FROM stats),
       tot AS (SELECT CAST(SUM(w1) AS BIGINT) AS tw1, CAST(SUM(w2) AS BIGINT) AS tw2,
                      CAST(SUM(n_tokens) AS BIGINT) AS tt FROM w),
       b AS (SELECT (tt // 2) * 4 // 5 AS b1, tt // 2 - (tt // 2) * 4 // 5 AS b2 FROM tot),
       p1 AS (SELECT source, 'pretrain' AS phase, n_tokens,
                     CAST(w1 AS DOUBLE) / CAST(tw1 AS DOUBLE) AS share,
                     CAST(floor(CAST(b1 AS DOUBLE) * (CAST(w1 AS DOUBLE) / CAST(tw1 AS DOUBLE))) AS BIGINT) AS budget_tokens
              FROM w, tot, b),
       p2 AS (SELECT source, 'anneal' AS phase, n_tokens,
                     CAST(w2 AS DOUBLE) / CAST(tw2 AS DOUBLE) AS share,
                     CAST(floor(CAST(b2 AS DOUBLE) * (CAST(w2 AS DOUBLE) / CAST(tw2 AS DOUBLE))) AS BIGINT) AS budget_tokens
              FROM w, tot, b)
       SELECT source, phase, n_tokens, share, budget_tokens,
              CAST(budget_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs
       FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
       ORDER BY source, phase"""

  /** DOREMI-STYLE mixture reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
    * public paper, semantics only): one multiplicative-weights
    * (Group-DRO) update step over the per-source EXCESS LOSS. DoReMi's
    * excess loss is loss(proxy) − loss(reference) per domain; the
    * static-data analog this engine can compute exactly is the
    * per-source unigram cross-entropy under the CORPUS LM minus under
    * the source's OWN LM — which is precisely KL(p_source ‖ p_corpus),
    * the relation q_kl_sources already declares
    * ([[StatsOps.klBySource]]). A source whose distribution the corpus
    * mix models badly (high KL = high excess loss) gets upweighted:
    *
    *   w_s ∝ n_s · exp(η · KL_s),  normalized over sources
    *
    * Determinism discipline (the q_temperature_mix quantizer): the
    * boosted weight is floor-quantized to a LONG — w = floor(n_s ·
    * exp(η·KL_s) · 1e3) — so the normalizing sum is integer-exact and
    * order-independent; `weight` is then a single IEEE division and
    * `budget_tokens` pure integer arithmetic ((w · half) div tw). The
    * exp input KL_s is itself deterministic (decimal-rounded term sums),
    * and JVM Math.exp and DuckDB exp were verified bit-identical over
    * the fixture's KL range. The 1e3 quantizer scale bounds w at
    * n_s·e^(η·KL)·1e3 — at petatoken-scale sources drop the scale (or
    * pre-divide n_s) to stay inside the long; the arithmetic is
    * otherwise source-cardinality only.
    *
    * Scale shape: everything after the exploded token pass is
    * source-cardinality (tiny) — the KL pass is the only corpus-sized
    * stage, one explode + two aggregates with map-side partials.
    */
  def doremiMix(s: SparkSession, docs: DataFrame, eta: Double = 10.0): DataFrame = {
    val kl = StatsOps.klBySource(s, docs)
    val terms = kl.withColumn("w",
      floor(col("n_tokens").cast(DoubleType) * exp(lit(eta) * col("kl_nats"))
        * lit(1e3)).cast(LongType))
    val tots = terms.agg(sum(col("w")).as("tw"),
      sum(col("n_tokens")).as("tn"))
    terms.crossJoin(broadcast(tots))
      .withColumn("weight",
        col("w").cast(DoubleType) / col("tw").cast(DoubleType))
      .withColumn("budget_tokens", expr("(w * (tn div 2L)) div tw"))
      .select(col("source"), col("n_tokens"), col("kl_nats"), col("weight"),
        col("budget_tokens"))
      .orderBy(col("source"))
  }

  private def doremiMixOracle(eta: Double): String =
    s"""WITH ${StatsOps.klCte},
       terms AS (SELECT source, n_tokens, kl_nats,
                        CAST(floor(CAST(n_tokens AS DOUBLE) * exp($eta * kl_nats)
                          * 1e3) AS BIGINT) AS w
                 FROM kl),
       dtot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw,
                       CAST(SUM(n_tokens) AS BIGINT) AS tn FROM terms)
       SELECT source, n_tokens, kl_nats,
              CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) AS weight,
              (w * (tn // 2)) // tw AS budget_tokens
       FROM terms, dtot ORDER BY source"""

  /** DATA-CONSTRAINED mixture allocation (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models" — public paper,
    * semantics only): when the compute budget exceeds the corpus, data
    * REPEATS — and repeated tokens decay in value, so each source gets
    * an EPOCH CAP and the budget waterfills across sources up to their
    * caps. The cap here is derived from the hygiene signal the engine
    * already measures: a source full of unique content tolerates more
    * epochs than a syndicated one —
    *
    *   cap_s = 1 + 4·uniq_frac_s epochs   (1000–5000 milli-epochs,
    *   floor-quantized; the paper's ~4-epoch near-free-repeat window)
    *
    * EXACT waterfill, not one redistribution round: sources sorted by
    * cap ascending; the first k* where B·1000 − C(k*−1) ≤ cap_k*·R(k*−1)
    * (all longs — C = cumulative cap·tokens, R = suffix tokens) marks
    * the water level θ = (B·1000 − C(k*−1)) div R(k*−1); sources below
    * θ cap out, the rest train θ milli-epochs. Every decision is an
    * integer comparison — no float water level until the reported
    * epochs column. Budget B = 3× the corpus (the regime where the
    * paper's caps bind). All arithmetic is source-cardinality; the one
    * ordered window runs over |sources| rows. Long-arithmetic bound:
    * B·1000 and cap·n·1000 must fit in 63 bits — fine to ~10^15 tokens;
    * past that, scale milli to centi-epochs.
    */
  def epochCapMix(s: SparkSession, docs: DataFrame,
      budgetMilliEpochs: Long = 2500L): DataFrame = {
    val stats = docs.groupBy(col("source")).agg(
      sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
    val uniq = graft.ops.CorpusOps.sourceUniqueness(docs)
      .select(col("source"), col("uniq_frac"))
    val src = stats.join(uniq, Seq("source"))
      .withColumn("cap_m",
        floor(lit(1000.0) + lit(4000.0) * col("uniq_frac")).cast(LongType))
    val tot = src.agg(sum(col("n_tokens")).as("nt"))
    val w = Window.orderBy(col("cap_m"), col("source"))
    val wc = w.rowsBetween(Window.unboundedPreceding, 0)
    val ordered = src.crossJoin(broadcast(tot))
      .withColumn("b1000", expr(s"nt * ${budgetMilliEpochs}L"))
      .withColumn("cum_cn", sum(col("cap_m") * col("n_tokens")).over(wc))
      .withColumn("cum_n", sum(col("n_tokens")).over(wc))
      .withColumn("prev_c", col("cum_cn") - col("cap_m") * col("n_tokens"))
      .withColumn("prev_r", col("nt") - col("cum_n") + col("n_tokens"))
      // source k uncapped iff the water level before capping it already
      // sits at or below its cap: B·1000 − C(k−1) ≤ cap_k · R(k−1)
      .withColumn("uncapped",
        col("b1000") - col("prev_c") <= col("cap_m") * col("prev_r"))
    // the FIRST uncapped source in (cap, source) order fixes the level:
    // one aggregate argmin over the (already tiny) source relation
    val theta = ordered.filter(col("uncapped"))
      .withColumn("th", expr("(b1000 - prev_c) div prev_r"))
      .agg(min(struct(col("cap_m"), col("source"), col("th"))).as("f"))
      .select(col("f.th").as("th"))
      .filter(col("th").isNotNull)
    val out = ordered.join(broadcast(theta), lit(true), "left")
      .withColumn("alloc_m",
        when(col("th").isNull, col("cap_m")) // budget exceeds every cap
          .otherwise(least(col("cap_m"), col("th"))))
      .select(col("source"), col("n_tokens"), col("uniq_frac"),
        col("cap_m").as("cap_milliepochs"),
        col("alloc_m").as("alloc_milliepochs"),
        expr("n_tokens * alloc_m div 1000L").as("alloc_tokens"),
        (col("alloc_m").cast(DoubleType) / 1000.0).as("alloc_epochs"))
      .orderBy(col("source"))
    out
  }

  private def epochCapMixOracle(budgetMilli: Long): String =
    s"""WITH ${graft.ops.CorpusOps.sourceUniquenessCtes},
       stats AS (SELECT source,
                        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY 1),
       srcs AS (SELECT s.source, s.n_tokens, su.uniq_frac,
                       CAST(floor(1000.0 + 4000.0 * su.uniq_frac) AS BIGINT) AS cap_m
                FROM stats s JOIN su USING (source)),
       tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS nt FROM srcs),
       o AS (SELECT srcs.*, tot.nt, CAST(tot.nt * $budgetMilli AS BIGINT) AS b1000,
                    CAST(SUM(cap_m * n_tokens) OVER win AS BIGINT) AS cum_cn,
                    CAST(SUM(n_tokens) OVER win AS BIGINT) AS cum_n
             FROM srcs, tot
             WINDOW win AS (ORDER BY cap_m, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       o2 AS (SELECT *, cum_cn - cap_m * n_tokens AS prev_c,
                     nt - cum_n + n_tokens AS prev_r,
                     b1000 - (cum_cn - cap_m * n_tokens)
                       <= cap_m * (nt - cum_n + n_tokens) AS uncapped
              FROM o),
       th AS (SELECT (b1000 - prev_c) // prev_r AS th FROM o2
              WHERE uncapped ORDER BY cap_m, source LIMIT 1)
       SELECT source, n_tokens, uniq_frac,
              cap_m AS cap_milliepochs,
              CASE WHEN (SELECT count(*) FROM th) = 0 THEN cap_m
                   ELSE LEAST(cap_m, (SELECT th FROM th)) END AS alloc_milliepochs,
              n_tokens * (CASE WHEN (SELECT count(*) FROM th) = 0 THEN cap_m
                   ELSE LEAST(cap_m, (SELECT th FROM th)) END) // 1000 AS alloc_tokens,
              CAST(CASE WHEN (SELECT count(*) FROM th) = 0 THEN cap_m
                   ELSE LEAST(cap_m, (SELECT th FROM th)) END AS DOUBLE) / 1000.0
                AS alloc_epochs
       FROM o2 ORDER BY source"""

  /** LONG-CONTEXT UPSAMPLING mix (Fu et al. 2024, "Data Engineering for
    * Scaling Language Models to 128K Context" — public paper, semantics
    * only): context extension wants MORE long documents, but the paper's
    * finding is to upsample long docs WITHIN each source and keep the
    * domain mixture unchanged — naively filtering to long docs skews the
    * domain mix and hurts short-context ability. This is the per-source
    * accounting of that transform: docs ≥ `minLong` tokens get an
    * integer repeat `factor`, and the per-source acceptance rate
    * rescales the upsampled stream back to the source's ORIGINAL token
    * budget (domain shares preserved by construction):
    *
    *   rate_s = tokens_s / (short_tokens_s + factor · long_tokens_s)
    *
    * All aggregates are longs (exact, order-independent); the three
    * reported ratios are single IEEE divisions of exact integers.
    */
  def longCtxMix(docs: DataFrame, minLong: Long = 80L,
      factor: Int = 3): DataFrame = {
    val sized = docs.select(col("source"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
    sized.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") >= minLong, 1L).otherwise(0L)).cast(LongType)
          .as("n_long"),
        sum(col("n_tokens")).cast(LongType).as("tokens_total"),
        sum(when(col("n_tokens") >= minLong, col("n_tokens")).otherwise(0L))
          .cast(LongType).as("tokens_long"))
      .withColumn("upsampled",
        col("tokens_total") - col("tokens_long")
          + lit(factor.toLong) * col("tokens_long"))
      .select(col("source"), col("n_docs"), col("n_long"),
        col("tokens_total"), col("tokens_long"),
        (col("tokens_long").cast(DoubleType)
          / col("tokens_total").cast(DoubleType)).as("long_share_before"),
        ((lit(factor.toLong) * col("tokens_long")).cast(DoubleType)
          / col("upsampled").cast(DoubleType)).as("long_share_after"),
        (col("tokens_total").cast(DoubleType)
          / col("upsampled").cast(DoubleType)).as("rate"))
      .orderBy(col("source"))
  }

  private def longCtxMixOracle(minLong: Long, factor: Int): String =
    s"""WITH sized AS (SELECT source,
                              CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                       FROM documents),
       a AS (SELECT source, COUNT(*) AS n_docs,
                    CAST(SUM(CASE WHEN n >= $minLong THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
                    CAST(SUM(n) AS BIGINT) AS tokens_total,
                    CAST(SUM(CASE WHEN n >= $minLong THEN n ELSE 0 END) AS BIGINT) AS tokens_long
             FROM sized GROUP BY 1)
       SELECT source, n_docs, n_long, tokens_total, tokens_long,
              CAST(tokens_long AS DOUBLE) / CAST(tokens_total AS DOUBLE)
                AS long_share_before,
              CAST($factor * tokens_long AS DOUBLE)
                / CAST(tokens_total - tokens_long + $factor * tokens_long AS DOUBLE)
                AS long_share_after,
              CAST(tokens_total AS DOUBLE)
                / CAST(tokens_total - tokens_long + $factor * tokens_long AS DOUBLE)
                AS rate
       FROM a ORDER BY source"""

  /** The long-context layout itself, composed with the pack spine: the
    * upsampled stream (each long doc repeated `factor` times, epoch
    * index carried) laid out in (doc_id, epoch) order with REAL global
    * token offsets and `budget`-token context-window assignment — what
    * the shard writer consumes for a context-extension run. The global
    * order key is gid = doc_id·factor + epoch (gaps are fine: the spine
    * needs order, not density), and the offsets ride the two-level
    * tokenShards spine — no global single-partition window.
    */
  def packLongCtx(docs: DataFrame, minLong: Long = 80L, factor: Int = 3,
      budget: Long = 1024L): DataFrame = {
    val rep = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("f",
        when(col("n_tokens") >= minLong, lit(factor)).otherwise(lit(1)))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0), col("f") - 1)).as("epoch"))
    val stream = rep.select(
      (col("doc_id") * factor + col("epoch")).as("doc_id"),
      col("n_tokens"))
    TextOps.tokenShards(stream, budget, nTokens = col("n_tokens"))
      .select(expr(s"doc_id div $factor").as("doc_id"),
        (col("doc_id") % factor).as("epoch"),
        col("n_tokens"), col("offset"), col("shard"))
      .orderBy(col("offset"))
  }

  private def packLongCtxOracle(minLong: Long, factor: Int,
      budget: Long): String =
    s"""WITH sized AS (SELECT doc_id,
                              CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                              CASE WHEN len(string_split(text, ' ')) >= $minLong
                                   THEN $factor ELSE 1 END AS f
                       FROM documents),
       rep AS (SELECT doc_id, n, CAST(u.e AS BIGINT) AS epoch
               FROM sized, LATERAL unnest(range(0, f)) AS u(e)),
       o AS (SELECT doc_id, epoch, n,
                    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id * $factor + epoch
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS off
             FROM rep)
       SELECT doc_id, epoch, n AS n_tokens, off AS offset,
              off // $budget AS shard
       FROM o ORDER BY 4"""

  /** Span-corruption selection (the T5/UL2 denoising objective's data
    * transform, completing the objective family next to [[fimTransform]]
    * and [[packSftMask]]): each token position flips an independent
    * md5-deterministic coin at `rate`, and adjacent corrupted positions
    * merge into spans — the sentinel-replaced regions a denoising
    * trainer reconstructs. Output per document (docs with ≥1 span):
    * token count, corrupted count, span count, mean span length — the
    * corruption-geometry readout (rate and mean span length are THE two
    * knobs of the objective). Per-position coins need the exploded
    * token index — O(tokens) rows, one pass, the q_explode_tokens
    * class; islands partition per document.
    */
  def spanCorruption(docs: DataFrame, rate: Double = 0.15): DataFrame = {
    val u = conv(substring(md5(concat(lit("corrupt:"),
        col("doc_id").cast(StringType), lit(":"), col("i").cast(StringType))),
        1, 8), 16, 10).cast(LongType).cast(DoubleType) / lit(4294967296.0)
    val hits = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n"))
      .select(col("doc_id"), col("n"), explode(expr("sequence(0L, n - 1L)")).as("i"))
      .withColumn("u", u)
      .filter(col("u") < rate)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    hits
      .withColumn("prev", lag(col("i"), 1).over(w))
      .withColumn("ni",
        when(col("prev").isNull || col("i") - col("prev") > 1L, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("n"))
      .agg(count(lit(1)).as("n_corrupted"),
        countDistinct(col("island")).as("n_spans"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_corrupted"),
        col("n_spans"),
        (col("n_corrupted").cast(DoubleType) / col("n_spans").cast(DoubleType))
          .as("mean_span_len"))
      .orderBy(col("doc_id"))
  }

  private def spanCorruptionOracle(rate: Double): String =
    s"""WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents),
       pos AS (SELECT doc_id, n, CAST(i AS BIGINT) AS i
               FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM s)),
       hit AS (SELECT doc_id, n, i FROM pos
               WHERE CAST(('0x' || substr(md5('corrupt:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 < $rate),
       isl AS (SELECT doc_id, n, i,
                      SUM(CASE WHEN prev IS NULL OR i - prev > 1 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY i) AS island
               FROM (SELECT doc_id, n, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                     FROM hit))
       SELECT doc_id, n AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_corrupted,
              CAST(count(DISTINCT island) AS BIGINT) AS n_spans,
              CAST(count(*) AS DOUBLE) / count(DISTINCT island) AS mean_span_len
       FROM isl GROUP BY doc_id, n ORDER BY doc_id"""

  /** MULTI-TURN conversation SFT (the production generalization of
    * [[packSftMask]]'s single prompt/response boundary): a chat-formatted
    * document is a sequence of role-alternating turns, each rendered
    * inside a chat template, and the loss trains ONLY on assistant
    * CONTENT tokens plus the assistant turn's end-of-turn token — user
    * turns and every template header are masked.
    *
    * Deterministic turn synthesis from the fixture (it has no chat
    * field; the ARITHMETIC — per-turn template overhead, role-dependent
    * mask intervals over the pack layout, boundary splits, adjacent-turn
    * merges — is the operator): doc d has T = 2·(1 + md5("sft2:"+d) % 3)
    * turns (2/4/6, user first, alternating); turn i's content is the
    * word slice [⌊i·n/T⌋, ⌊(i+1)·n/T⌋) — integer `div` on both engines,
    * no floats. The template charges 3 tokens per turn
    * (<|im_start|>, role, <|im_end|>), so the doc occupies
    * 3T + n tokens of the [[TextOps.tokenShards]] layout.
    *
    * Masked (loss = 0) intervals, doc-local: a user turn masks WHOLLY
    * ([o_i, o_i + c_i + 2]); an assistant turn masks only its header
    * ([o_i, o_i + 1]) — its content and <|im_end|> train. A user turn's
    * mask is ADJACENT to the next assistant header's, so the island
    * merge fuses them (per-turn intervals never explode per-position
    * rows — the packSftMask interval discipline; O(docs·turns +
    * masked_tokens/L) rows corpus-wide).
    */
  def packSftMaskMultiturn(docs: DataFrame, budget: Long = 256L,
      seqsPerShard: Long = 8L): DataFrame = {
    val h = conv(substring(md5(concat(lit("sft2:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    val turnsCol = lit(2L) * (lit(1L) + (h % 3))
    val base = TextOps.tokenShards(docs, budget = budget,
        nTokens = lit(3L) * turnsCol +
          size(split(col("text"), " ")).cast(LongType))
      .withColumn("t", turnsCol) // md5-recomputable from doc_id alone
      .withColumn("n", col("n_tokens") - lit(3L) * col("t"))
    val iv = base
      .select(col("offset"), col("n"), col("t"),
        explode(expr("sequence(0L, t - 1L)")).as("i"))
      .withColumn("o_i", lit(3L) * col("i") + expr("(i * n) div t"))
      .withColumn("c_i", expr("((i + 1) * n) div t - (i * n) div t"))
      .select((col("offset") + col("o_i")).as("s"),
        (col("offset") + col("o_i") +
          when(col("i") % 2 === 0, col("c_i") + 2L).otherwise(lit(1L))).as("e"))
    maskRowsFromIntervals(iv, budget, seqsPerShard)
  }

  /** Shared interval → mask-row machinery (the packSftMask discipline),
    * used by the synthesized multi-turn form and the parsed-messages
    * seam: split doc-local global-offset mask intervals (s, e) at
    * sequence boundaries, merge adjacent/overlapping intervals per
    * sequence (island pass), emit (shard, seq, mask_start, mask_end,
    * mask_tokens).
    */
  private def maskRowsFromIntervals(iv: DataFrame, budget: Long,
      seqsPerShard: Long): DataFrame = {
    val split0 = iv
      .select(col("s"), col("e"),
        explode(expr(s"sequence(s div ${budget}L, e div ${budget}L)")).as("seq"))
      .select(col("seq"),
        greatest(col("s"), col("seq") * budget).as("s"),
        least(col("e"), (col("seq") + 1L) * budget - 1L).as("e"))
    val w = Window.partitionBy(col("seq")).orderBy(col("s"))
    split0
      .withColumn("pe", lag(col("e"), 1).over(w))
      .withColumn("ni",
        when(col("pe").isNull || col("s") > col("pe") + 1L, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(expr(s"seq div ${seqsPerShard}L").as("shard"), col("seq"),
        col("island"))
      .agg(min(col("s")).as("mask_start"), max(col("e")).as("mask_end"))
      .select(col("shard"), col("seq"), col("mask_start"), col("mask_end"),
        (col("mask_end") - col("mask_start") + 1L).as("mask_tokens"))
      .orderBy(col("seq"), col("mask_start"))
  }

  /** Deterministic nested-chat fixture synthesis — the SAME turn
    * arithmetic as [[packSftMaskMultiturn]] materialized as the
    * `messages: array<struct<role, content>>` column production SFT
    * corpora actually carry (the fixture has no chat field), so the
    * parser seam below can be oracled against a real list-of-struct
    * relation and spec-pinned row-identical to the multiturn row.
    */
  def synthMessages(docs: DataFrame): DataFrame = {
    val h = conv(substring(md5(concat(lit("sft2:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"),
        (lit(2L) * (lit(1L) + (h % 3))).as("t"),
        size(split(col("text"), " ")).cast(LongType).as("n"))
      .select(col("doc_id"), expr(
        """transform(sequence(0L, t - 1L), i -> named_struct(
             'role', CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END,
             'content', array_join(slice(ws, CAST((i * n) div t AS INT) + 1,
               CAST(((i + 1) * n) div t - (i * n) div t AS INT)), ' ')))""")
        .as("messages"))
  }

  /** MULTI-TURN SFT masking from a REAL chat column — the ingestion
    * seam [[packSftMaskMultiturn]]'s md5 synthesis stands in for: the
    * input carries `messages: array<struct<role: string, content:
    * string>>` (the production SFT corpus shape) and the turn
    * structure is PARSED from it — turn count from the array, roles
    * from the structs, per-turn token counts from the content strings
    * (whitespace tokens; empty content = 0 tokens, both engines) —
    * then flows into the SAME interval machinery: 3 template tokens
    * per turn, any non-'assistant' role (user, system, tool, ...)
    * loss-masked wholly, assistant headers masked, boundary splits and
    * adjacent merges unchanged. Scale shape: O(docs·turns) interval
    * rows, never per-position; offsets ride the tokenShards spine; one
    * doc_id join (the lake layout key) attaches messages to offsets.
    */
  def packSftMaskMessages(msgs: DataFrame, budget: Long = 256L,
      seqsPerShard: Long = 8L): DataFrame = {
    val withTc = msgs.select(col("doc_id"), col("messages"))
    val spine = TextOps.tokenShards(withTc, budget = budget,
      nTokens = expr(
        """3L * CAST(size(messages) AS BIGINT) +
           aggregate(messages, 0L, (a, m) -> a +
             CASE WHEN m.content = '' THEN 0L
                  ELSE CAST(size(split(m.content, ' ')) AS BIGINT) END)"""))
    val turns = spine.select(col("doc_id"), col("offset"))
      .join(withTc, Seq("doc_id"))
      .select(col("doc_id"), col("offset"),
        posexplode(col("messages")).as(Seq("i", "m")))
      .select(col("doc_id"), col("offset"), col("i").cast(LongType).as("i"),
        col("m.role").as("role"),
        when(col("m.content") === "", 0L)
          .otherwise(size(split(col("m.content"), " ")).cast(LongType))
          .as("c_i"))
    val wT = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val iv = turns
      .withColumn("o_i",
        lit(3L) * col("i") + coalesce(sum(col("c_i")).over(wT), lit(0L)))
      .select((col("offset") + col("o_i")).as("s"),
        (col("offset") + col("o_i") +
          when(col("role") === "assistant", lit(1L))
            .otherwise(col("c_i") + 2L)).as("e"))
    maskRowsFromIntervals(iv, budget, seqsPerShard)
  }

  /** Template render from the PARSED messages column — the
    * [[sftRenderMultiturn]] pin computed through the ingestion seam:
    * `<|im_start|> role content... <|im_end|>` per turn, content
    * tokens verbatim (empty content renders zero tokens), md5 over the
    * whitespace-joined token stream, so `n_tokens` equals the mask
    * row's 3T + n exactly. One HOF pass per doc.
    */
  def sftRenderMessages(msgs: DataFrame): DataFrame =
    msgs.select(col("doc_id"), col("messages"))
      .withColumn("toks", expr(
        """flatten(transform(messages, m ->
             concat(array('<|im_start|>', m.role),
                    CASE WHEN m.content = '' THEN array_remove(array(''), '')
                         ELSE split(m.content, ' ') END,
                    array('<|im_end|>'))))"""))
      .select(col("doc_id"),
        size(col("messages")).cast(LongType).as("n_turns"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        md5(expr("array_join(toks, ' ')").cast("binary")).as("render_md5"))
      .orderBy(col("doc_id"))

  /** The synthesized list-of-struct chat relation, shared by both
    * messages-seam oracles: built with struct_pack/list_transform and
    * then PARSED back field-by-field — the oracle exercises the nested
    * column, not the synthesis arithmetic shortcut.
    */
  private val messagesCtes: String =
    """s0 AS (SELECT doc_id, string_split(text, ' ') AS ws,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents),
       tt AS (SELECT doc_id, ws, n,
                     2 * (1 + (CAST(('0x' || substr(md5('sft2:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 3)) AS t
              FROM s0),
       msgs AS (SELECT doc_id,
                       list_transform(range(0, t), i -> struct_pack(
                         role := CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END,
                         content := COALESCE(array_to_string(
                           ws[CAST((i * n) // t AS BIGINT) + 1 : CAST(((i + 1) * n) // t AS BIGINT)], ' '), '')))
                         AS messages
                FROM tt),
       tu AS (SELECT doc_id, i - 1 AS i, messages[i].role AS role,
                     CASE WHEN messages[i].content = '' THEN 0
                          ELSE len(string_split(messages[i].content, ' ')) END AS c_i
              FROM msgs, LATERAL (SELECT unnest(range(1, len(messages) + 1)) AS i))"""

  private val packSftMessagesOracle: String =
    s"""WITH $messagesCtes,
       tn AS (SELECT doc_id, CAST(3 * count(*) + SUM(c_i) AS BIGINT) AS ntok
              FROM tu GROUP BY 1),
       o AS (SELECT doc_id,
                    CAST(COALESCE(SUM(ntok) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             FROM tn),
       ti AS (SELECT u.doc_id, o.off, u.i, u.role, u.c_i,
                     CAST(3 * u.i + COALESCE(SUM(u.c_i) OVER (PARTITION BY u.doc_id
                       ORDER BY u.i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o_i
              FROM tu u JOIN o ON o.doc_id = u.doc_id),
       mi AS (SELECT off + o_i AS s,
                     off + o_i + CASE WHEN role = 'assistant' THEN 1 ELSE c_i + 2 END AS e
              FROM ti),
       iv AS (SELECT CAST(seq AS BIGINT) AS seq,
                     CAST(GREATEST(s, seq * 256) AS BIGINT) AS st,
                     CAST(LEAST(e, (seq + 1) * 256 - 1) AS BIGINT) AS e
              FROM (SELECT s, e, unnest(range(s // 256, e // 256 + 1)) AS seq
                    FROM mi)),
       isl AS (SELECT seq, st, e,
                      SUM(CASE WHEN pe IS NULL OR st > pe + 1 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY seq ORDER BY st) AS island
               FROM (SELECT seq, st, e, lag(e) OVER (PARTITION BY seq ORDER BY st) AS pe
                     FROM iv))
       SELECT CAST(seq // 8 AS BIGINT) AS shard, seq,
              CAST(MIN(st) AS BIGINT) AS mask_start,
              CAST(MAX(e) AS BIGINT) AS mask_end,
              CAST(MAX(e) - MIN(st) + 1 AS BIGINT) AS mask_tokens
       FROM isl GROUP BY seq, island ORDER BY 2, 3"""

  private val sftRenderMessagesOracle: String =
    s"""WITH $messagesCtes,
       tr AS (SELECT doc_id, i - 1 AS i,
                     list_concat(list_concat(
                       ['<|im_start|>', messages[i].role],
                       CASE WHEN messages[i].content = '' THEN []
                            ELSE string_split(messages[i].content, ' ') END),
                       ['<|im_end|>']) AS toks
              FROM msgs, LATERAL (SELECT unnest(range(1, len(messages) + 1)) AS i))
       SELECT r.doc_id,
              CAST(max(len(m.messages)) AS BIGINT) AS n_turns,
              CAST(sum(len(r.toks)) AS BIGINT) AS n_tokens,
              md5(array_to_string(flatten(list(r.toks ORDER BY r.i)), ' ')) AS render_md5
       FROM tr r JOIN msgs m ON m.doc_id = r.doc_id
       GROUP BY r.doc_id ORDER BY r.doc_id"""

  private val packSftMultiturnOracle: String =
    """WITH s0 AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM documents),
       tt AS (SELECT doc_id, n,
                     2 * (1 + (CAST(('0x' || substr(md5('sft2:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 3)) AS t
              FROM s0),
       o AS (SELECT doc_id, n, t,
                    CAST(COALESCE(SUM(3 * t + n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             FROM tt),
       tu AS (SELECT off, i, 3 * i + (i * n) // t AS o_i,
                     ((i + 1) * n) // t - (i * n) // t AS c_i,
                     i % 2 = 0 AS is_user
              FROM o, LATERAL (SELECT unnest(range(0, t)) AS i)),
       mi AS (SELECT off + o_i AS s,
                     off + o_i + CASE WHEN is_user THEN c_i + 2 ELSE 1 END AS e
              FROM tu),
       iv AS (SELECT CAST(seq AS BIGINT) AS seq,
                     CAST(GREATEST(s, seq * 256) AS BIGINT) AS st,
                     CAST(LEAST(e, (seq + 1) * 256 - 1) AS BIGINT) AS e
              FROM (SELECT s, e, unnest(range(s // 256, e // 256 + 1)) AS seq
                    FROM mi)),
       isl AS (SELECT seq, st, e,
                      SUM(CASE WHEN pe IS NULL OR st > pe + 1 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY seq ORDER BY st) AS island
               FROM (SELECT seq, st, e, lag(e) OVER (PARTITION BY seq ORDER BY st) AS pe
                     FROM iv))
       SELECT CAST(seq // 8 AS BIGINT) AS shard, seq,
              CAST(MIN(st) AS BIGINT) AS mask_start,
              CAST(MAX(e) AS BIGINT) AS mask_end,
              CAST(MAX(e) - MIN(st) + 1 AS BIGINT) AS mask_tokens
       FROM isl GROUP BY seq, island ORDER BY 2, 3"""

  /** The TEMPLATE-RENDERED form of the multi-turn synthesis — the bytes
    * [[packSftMaskMultiturn]] masks over, pinned by md5: every turn
    * renders as `<|im_start|> role content... <|im_end|>` and the doc is
    * the turns joined in order (whitespace-token convention, so the
    * rendered token count equals the mask row's 3T + n exactly). One
    * codegen/HOF pass per doc, no shuffle beyond the final sort.
    */
  def sftRenderMultiturn(docs: DataFrame): DataFrame = {
    val h = conv(substring(md5(concat(lit("sft2:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    val turnsCol = lit(2L) * (lit(1L) + (h % 3))
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"),
        turnsCol.as("t"),
        size(split(col("text"), " ")).cast(LongType).as("n"))
      .withColumn("toks", expr(
        """flatten(transform(sequence(0L, t - 1L), i ->
             concat(array('<|im_start|>',
                          CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END),
                    slice(ws, CAST((i * n) div t AS INT) + 1,
                          CAST(((i + 1) * n) div t - (i * n) div t AS INT)),
                    array('<|im_end|>'))))"""))
      .select(col("doc_id"), col("t").as("n_turns"),
        (lit(3L) * col("t") + col("n")).as("n_tokens"),
        md5(expr("array_join(toks, ' ')").cast("binary")).as("render_md5"))
      .orderBy(col("doc_id"))
  }

  private val sftRenderMultiturnOracle: String =
    """WITH s0 AS (SELECT doc_id, string_split(text, ' ') AS ws,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM documents),
       tt AS (SELECT doc_id, ws, n,
                     2 * (1 + (CAST(('0x' || substr(md5('sft2:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 3)) AS t
              FROM s0),
       tu AS (SELECT doc_id, t, n, i,
                     list_concat(list_concat(
                       ['<|im_start|>',
                        CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END],
                       ws[CAST((i * n) // t AS BIGINT) + 1 : CAST(((i + 1) * n) // t AS BIGINT)]),
                       ['<|im_end|>']) AS toks
              FROM tt, LATERAL (SELECT unnest(range(0, t)) AS i))
       SELECT doc_id, CAST(t AS BIGINT) AS n_turns,
              CAST(3 * t + n AS BIGINT) AS n_tokens,
              md5(array_to_string(flatten(list(toks ORDER BY i)), ' ')) AS render_md5
       FROM tu GROUP BY doc_id, t, n ORDER BY doc_id"""

  /** PREFERENCE-PAIR construction — the RLHF/DPO data-prep step between
    * a scored candidate pool and the (prompt, chosen, rejected) rows a
    * reward model or DPO run trains on: group candidate responses by
    * prompt, pick the best- and worst-scored response per prompt, emit
    * the pair with its score margin, and drop degenerate prompts
    * (fewer than two candidates, or no strict margin — a DPO pair with
    * chosen == rejected teaches nothing).
    *
    * Deterministic synthesis from the fixture (it has no prompt field;
    * the ARITHMETIC — grouping, per-group argmax/argmin with tie rules,
    * margin filter — is the operator): prompt_id = md5("pref:"+doc_id)
    * % nPrompts, score = type-token ratio (distinct words / words —
    * integer inputs, so the double division is bit-identical on both
    * engines). Argmax/argmin are AGGREGATES (max/min over (score, id)
    * structs — ties to the LOWER doc id on both ends, the
    * semanticDecontaminate discipline): partial aggregation reduces
    * map-side, so the shuffle carries one row per (prompt, partition),
    * never the candidate pool — at 10⁹ candidates over 10⁶ prompts the
    * difference between shuffling 10⁶ rows and 10⁹.
    */
  def prefPairs(docs: DataFrame, nPrompts: Long = 97L): DataFrame = {
    val h = conv(substring(md5(concat(lit("pref:"),
      col("doc_id").cast(StringType))), 1, 8), 16, 10).cast(LongType)
    val scored = docs.select(col("doc_id"), (h % nPrompts).as("prompt_id"),
      (size(array_distinct(split(col("text"), " "))).cast(DoubleType) /
        size(split(col("text"), " ")).cast(DoubleType)).as("score"))
    scored.groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_candidates"),
        max(struct(col("score"), (-col("doc_id")).as("nid"))).as("best"),
        min(struct(col("score"), col("doc_id").as("pid"))).as("worst"))
      .filter(col("n_candidates") >= 2 &&
        col("best.score") > col("worst.score"))
      .select(col("prompt_id"),
        (-col("best.nid")).as("chosen_id"), col("worst.pid").as("rejected_id"),
        col("best.score").as("chosen_score"),
        col("worst.score").as("rejected_score"),
        (col("best.score") - col("worst.score")).as("margin"),
        col("n_candidates"))
      .orderBy(col("prompt_id"))
  }

  private val prefPairsOracle: String =
    """WITH sc AS (SELECT doc_id,
                      CAST(('0x' || substr(md5('pref:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 97 AS prompt_id,
                      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
               FROM documents),
       r AS (SELECT prompt_id, doc_id, score,
                    row_number() OVER (PARTITION BY prompt_id
                      ORDER BY score DESC, doc_id) AS rb,
                    row_number() OVER (PARTITION BY prompt_id
                      ORDER BY score ASC, doc_id) AS rw
             FROM sc),
       cn AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_candidates
              FROM sc GROUP BY 1)
       SELECT b.prompt_id, b.doc_id AS chosen_id, w.doc_id AS rejected_id,
              b.score AS chosen_score, w.score AS rejected_score,
              b.score - w.score AS margin, cn.n_candidates
       FROM (SELECT * FROM r WHERE rb = 1) b
       JOIN (SELECT * FROM r WHERE rw = 1) w USING (prompt_id)
       JOIN cn USING (prompt_id)
       WHERE cn.n_candidates >= 2 AND b.score > w.score
       ORDER BY b.prompt_id"""

  val queries: Seq[Q] = Seq(
    Q("q_pack_efficiency",
      (s, dir) => packEfficiency(t(s, dir, "documents")),
      Some(packEfficiencyOracle)),
    Q("q_length_curriculum",
      (s, dir) => lengthCurriculum(t(s, dir, "documents")),
      Some(lengthCurriculumOracle)),
    Q("q_pack_repetition_mask",
      (s, dir) => packRepetitionMask(t(s, dir, "documents")),
      Some(packRepetitionMaskOracle)),
    Q("q_fim_transform",
      (s, dir) => fimTransform(t(s, dir, "documents")),
      Some(fimTransformOracle)),
    Q("q_pack_firstfit",
      (s, dir) => packFirstFit(t(s, dir, "documents")),
      Some(packFirstFitOracle)),
    Q("q_pack_sft_mask",
      (s, dir) => packSftMask(t(s, dir, "documents")),
      Some(packSftMaskOracle)),
    Q("q_source_epochs",
      (s, dir) => sourceEpochs(t(s, dir, "documents")),
      Some(sourceEpochsOracle)),
    Q("q_pack_attention_mix",
      (s, dir) => packAttentionMix(t(s, dir, "documents")),
      Some(packAttentionMixOracle)),
    Q("q_pack_multimodal",
      (s, dir) => packMultimodal(t(s, dir, "documents")),
      Some(packMultimodalOracle)),
    Q("q_span_corruption",
      (s, dir) => spanCorruption(t(s, dir, "documents")),
      Some(spanCorruptionOracle(0.15))),
    Q("q_pack_sft_multiturn",
      (s, dir) => packSftMaskMultiturn(t(s, dir, "documents")),
      Some(packSftMultiturnOracle)),
    Q("q_sft_render_multiturn",
      (s, dir) => sftRenderMultiturn(t(s, dir, "documents")),
      Some(sftRenderMultiturnOracle)),
    Q("q_pack_sft_messages",
      (s, dir) => packSftMaskMessages(synthMessages(t(s, dir, "documents"))),
      Some(packSftMessagesOracle)),
    Q("q_sft_render_messages",
      (s, dir) => sftRenderMessages(synthMessages(t(s, dir, "documents"))),
      Some(sftRenderMessagesOracle)),
    Q("q_pref_pairs",
      (s, dir) => prefPairs(t(s, dir, "documents")),
      Some(prefPairsOracle)),
    Q("q_anneal_mix",
      (s, dir) => annealMix(t(s, dir, "documents")),
      Some(annealMixOracle)),
    // One DoReMi (Group-DRO) reweighting step: per-source excess loss =
    // KL(source ‖ corpus) from the q_kl_sources relation; w ∝ n·exp(η·KL)
    // floor-quantized to longs so the normalization is integer-exact.
    Q("q_doremi_mix",
      (s, dir) => doremiMix(s, t(s, dir, "documents")),
      Some(doremiMixOracle(10.0))),
    // Long-context data engineering (Fu et al. 2024): upsample long docs
    // within each source, preserve the domain mixture — the accounting
    // report and the spine-composed layout.
    Q("q_longctx_mix",
      (s, dir) => longCtxMix(t(s, dir, "documents")),
      Some(longCtxMixOracle(80L, 3))),
    Q("q_pack_longctx",
      (s, dir) => packLongCtx(t(s, dir, "documents")),
      Some(packLongCtxOracle(80L, 3, 1024L))),
    // Data-constrained waterfill: per-source epoch caps from the
    // uniqueness signal, exact integer water level, 3x-corpus budget.
    Q("q_epoch_cap_mix",
      (s, dir) => epochCapMix(s, t(s, dir, "documents")),
      Some(epochCapMixOracle(2500L))))
}
