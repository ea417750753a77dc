package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Corpus-curation operators a pretraining data pipeline runs between raw
  * crawl and tokenizer: per-domain caps, per-source mixing rates, eval-set
  * decontamination, and unigram-LM quality scoring (builder brief "text
  * analysis" / dedup extensions; complements ops.TextDedup and
  * ops.CorpusOps). All deterministic — hash-based sampling, no rand() —
  * so replays and retries converge at any scale.
  */
object PipelineOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Cap the corpus at `cap` documents per source/domain (kept in doc_id
    * order) — the Common-Crawl-style guard against a single domain
    * dominating the mix. One shuffle on the domain key; the per-partition
    * rank is sort-based, so a mega-domain costs spilled I/O, not memory,
    * and everything past the cap short-circuits at the filter.
    */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= cap)
      .select(col("source"), col("doc_id"), col("rn"))
  }

  /** Deterministic per-source sampling rates (source mixing): each source
    * keeps the fraction of docs whose md5(doc_id) prefix falls under its
    * threshold — the "wiki ×1.0, web ×0.5, junk ×0.1" reweighting every
    * pretraining mix applies. Pure per-row filter: no shuffle, no count,
    * replay-stable under retries (same md5 convention as q_hash_sample /
    * q_train_split).
    */
  def sourceMix(docs: DataFrame, rates: Seq[(String, String)],
      defaultThreshold: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast(StringType)), 1, 2)
    val threshold = rates.foldRight(lit(defaultThreshold)) {
      case ((src, thr), acc) => when(col("source") === src, lit(thr)).otherwise(acc)
    }
    docs.filter(h <= threshold).select(col("source"), col("doc_id"))
  }

  /** Benchmark decontamination: flag training docs sharing >= `minOverlap`
    * distinct 3-word shingles with ANY doc of the (tiny) eval set — the
    * n-gram-overlap test-set-leak check run before every training run.
    * The eval side is shingled once and BROADCAST, so the corpus streams
    * through map-side: no shuffle of the 100 TB side at all; the only
    * aggregation is over matched (train, eval) candidate rows (rare by
    * construction — eval sets are small and leaks are the exception).
    * Shingles come from the one codegen WordShingleHashes pass (same
    * 8-byte-key convention as ngramJaccardPairs).
    */
  def decontaminate(docs: DataFrame, isEval: org.apache.spark.sql.Column,
      minOverlap: Int): DataFrame = {
    val sh = TextDedup.shingled(docs).withColumn("is_eval", isEval)
    val evalSh = sh.filter(col("is_eval"))
      .select(col("doc_id").as("eval_id"), explode(col("hs")).as("sh"))
    val trainSh = sh.filter(!col("is_eval"))
      .select(col("doc_id"), explode(col("hs")).as("sh"))
    trainSh.join(broadcast(evalSh), Seq("sh"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_overlap"),
        count(lit(1)).as("n_eval_hits"))
      .filter(col("max_overlap") >= minOverlap)
  }

  /** Span-granularity contamination report: for every training doc that
    * shares a k-word window with ANY eval doc, the maximal contaminated
    * word spans (overlap-merged islands — the q_repeated_spans machinery)
    * plus eval attribution: how many distinct eval docs touch the span
    * and the smallest such eval id. [[decontaminate]] flags whole docs
    * for a keep/kill decision; this is the surgical form — the exact
    * word ranges a removal pass would cut so the doc SURVIVES
    * decontamination instead of being dropped (the eval-overlap analogue
    * of the Lee-et-al repeated-span cut; the reference delegates all
    * analytics, `README.md:31`, so this is NS surface). Scale shape:
    * windows shuffle as 8-byte xxhash64 keys, never text; the eval side
    * is tiny by construction and BROADCAST into both the hash join and
    * the island attribution; the only window functions partition by
    * doc_id (bounded by document length).
    */
  def decontaminateSpans(docs: DataFrame, isEval: org.apache.spark.sql.Column,
      k: Int = 3): DataFrame = {
    val wins = docs.withColumn("is_eval", isEval)
      .select(col("doc_id"), col("is_eval"),
        size(split(col("text"), " ")).cast(LongType).as("n"),
        posexplode(graft.functions.TextFunctions.wordWindows(col("text"), k, 1))
          .as(Seq("win", "chunk")))
      .select(col("doc_id"), col("is_eval"), col("n"),
        col("win").cast(LongType).as("win"), xxhash64(col("chunk")).as("h"))
      .persist() // eval and train legs both read the windowed scan
    val evalW = wins.filter(col("is_eval"))
      .select(col("h"), col("doc_id").as("eval_id")).distinct()
    // (train doc, window, eval doc) hit triples — unique by construction
    // (window rows are unique per (doc, win); evalW is distinct)
    val hits = wins.filter(!col("is_eval"))
      .join(broadcast(evalW), Seq("h"))
      .select(col("doc_id"), col("n"), col("win"), col("eval_id"))
      .persist() // islands and attribution both read it
    val w1 = Window.partitionBy(col("doc_id")).orderBy(col("win"))
    val islands = hits.select(col("doc_id"), col("win")).distinct()
      .withColumn("prev", lag(col("win"), 1).over(w1))
      .withColumn("new_island",
        when(col("prev").isNull || col("win") - col("prev") > k - 1, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w1.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("doc_id"), col("win"), col("island"))
    val out = hits.join(islands, Seq("doc_id", "win"))
      .groupBy(col("doc_id"), col("island"), col("n"))
      .agg(min(col("win")).as("span_start"),
        least(max(col("win")) + (k - 1), col("n") - 1).as("span_end"),
        countDistinct(col("eval_id")).as("n_eval_docs"),
        min(col("eval_id")).as("min_eval_id"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"),
        col("n_eval_docs"), col("min_eval_id"))
      .localCheckpoint()
    hits.unpersist()
    wins.unpersist()
    out
  }

  /** Unigram-LM surprisal score per document — the cheap proxy for the
    * CCNet/KenLM perplexity filter: avg over token instances of
    * -ln p(token), with p from the corpus's own unigram counts. Two
    * aggregations (vocab counts; per-doc score); the vocab table is
    * vocab-sized, not corpus-sized, so it broadcasts and the corpus
    * streams through the scoring join map-side. Per-token surprisal is
    * rounded to DECIMAL(24,9) before the per-doc sum, making the
    * aggregation exact and order-independent (a double sum would drift
    * with partial-aggregation order across engines and runs).
    */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val freq = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val scored = freq.crossJoin(broadcast(total))
      .withColumn("nll",
        (-log(col("cnt").cast(DoubleType) / col("total")))
          .cast(DecimalType(24, 9)))
      .select(col("token"), col("nll"))
    tokens.join(broadcast(scored), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("nll")).cast(DoubleType) / count(lit(1))).as("avg_nll"))
  }

  /** CCNet-STYLE PERPLEXITY BUCKETING (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data" —
    * public paper, semantics only): per LANGUAGE, rank documents by LM
    * surprisal and split into head/middle/tail thirds — the curation
    * decision CCNet ships (keep head+middle, drop tail) and the mixture
    * knob labs tune per language. The LM here is the corpus unigram LM
    * ([[unigramLogprob]] — q_bigram_logprob is the order-up sibling);
    * buckets are RANK thirds (rnk·3 ≤ n → head, ≤ 2n → middle), ties on
    * equal surprisal broken by doc_id — integer-exact on both engines,
    * no percentile-function boundary semantics to reconcile.
    *
    * Scale shape: the per-language rank does NOT use a per-lang global
    * window (one language dominating a web crawl would serialize its
    * whole slice through one partition). It rides the two-phase value
    * spine: a coarse order-preserving surprisal bucket (floor(nll·100)),
    * per-(lang, bucket) counts prefix-summed over the FEW bucket rows
    * and broadcast back, then a within-bucket row_number — the
    * epochShuffle/tokenShards discipline pointed at a value order.
    * Bucket + within-bucket rank equals the global per-lang rank exactly
    * because the bucket is an order-preserving prefix group of the sort
    * key (equal surprisals share a bucket).
    */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val scored = unigramLogprob(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("vb", floor(col("avg_nll") * 100).cast(LongType))
    val counts = scored.groupBy(col("lang"), col("vb"))
      .agg(count(lit(1)).as("c"))
    val wSpine = Window.partitionBy(col("lang")).orderBy(col("vb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = counts
      .withColumn("base", coalesce(sum(col("c")).over(wSpine), lit(0L)))
      .select(col("lang"), col("vb"), col("base"))
    val nLang = counts.groupBy(col("lang"))
      .agg(sum(col("c")).cast(LongType).as("n"))
    val wIn = Window.partitionBy(col("lang"), col("vb"))
      .orderBy(col("avg_nll"), col("doc_id"))
    scored.join(broadcast(bases), Seq("lang", "vb"))
      .join(broadcast(nLang), Seq("lang"))
      .withColumn("rnk", col("base") + row_number().over(wIn))
      .withColumn("bucket",
        when(col("rnk") * 3 <= col("n"), "head")
          .when(col("rnk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("avg_nll"),
        col("rnk"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** The shippable CCNet artifact (the nbModelNanos discipline): the
    * unigram nll lattice as DECIMAL(24,9) fixed-point NANOS longs, plus
    * per-language bucket boundary VALUES from the batch rank pass (worst
    * head avg_nll, worst middle avg_nll). Both collects are bounded —
    * vocab-sized and language-sized — the two structures a deployed
    * perplexity gate legitimately ships to the stream.
    */
  def ccnetArtifactNanos(s: SparkSession, docs: DataFrame)
      : (Map[String, Long], graft.streaming.StreamingCcnetFilter.Cutoffs) = {
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val freq = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val nll = freq.crossJoin(broadcast(total))
      .select(col("token"),
        ((-log(col("cnt").cast(DoubleType) / col("total")))
          .cast(DecimalType(24, 9)) * lit(1000000000L)).cast(LongType)
          .as("nanos"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = ccnetBuckets(docs)
    val cuts = b.groupBy(col("lang"))
      .agg(max(when(col("bucket") === "head", col("avg_nll"))).as("q33"),
        max(when(col("bucket") =!= "tail", col("avg_nll"))).as("q66"))
      .collect().map { r =>
        // a lang too small for a head (or middle) third has no boundary
        // value: -inf buckets everything past it tail-ward
        val q33 = if (r.isNullAt(1)) Double.NegativeInfinity else r.getDouble(1)
        val q66 = if (r.isNullAt(2)) Double.NegativeInfinity else r.getDouble(2)
        r.getString(0) -> (q33, q66)
      }.toMap
    (nll, graft.streaming.StreamingCcnetFilter.Cutoffs(cuts))
  }

  // oracle: the plain per-lang row_number is provably equal to the
  // engine's two-phase spine rank (order-preserving prefix grouping)
  private val ccnetBucketsOracle: String =
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
       sc AS (SELECT token,
                     CAST(-ln(CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM freq))
                          AS DECIMAL(24,9)) AS nll
              FROM freq),
       d AS (SELECT doc_id, count(*) AS n_tokens,
                    CAST(sum(nll) AS DOUBLE) / count(*) AS avg_nll
             FROM tok JOIN sc USING (token) GROUP BY doc_id),
       j AS (SELECT d.doc_id, doc.lang, d.n_tokens, d.avg_nll
             FROM d JOIN documents doc USING (doc_id)),
       r AS (SELECT *,
                    row_number() OVER (PARTITION BY lang
                      ORDER BY avg_nll, doc_id) AS rnk,
                    count(*) OVER (PARTITION BY lang) AS n
             FROM j)
       SELECT doc_id, lang, n_tokens, avg_nll, rnk,
              CASE WHEN rnk * 3 <= n THEN 'head'
                   WHEN rnk * 3 <= 2 * n THEN 'middle'
                   ELSE 'tail' END AS bucket
       FROM r ORDER BY doc_id"""

  /** Deterministic epoch shuffle + loader sharding: a reproducible
    * pseudorandom total order (md5 of seed:doc_id), each doc's global
    * position, and its (shard, pos_in_shard) assignment for an
    * `nShards`-way data loader. The global rank is computed in the
    * two-phase shape that survives 100 TB (same pattern as tokenShards):
    * docs rank WITHIN their 16^hexPrefix hash buckets (the md5's first
    * `hexPrefix` hex chars — a PREFIX of the full-hash string order, so
    * bucket-offset + in-bucket rank equals the global rank for ANY
    * width; the knob is pure parallelism, spec-pinned invariant), bucket
    * sizes are one tiny aggregate whose prefix sum broadcasts back — no
    * single-partition scan of the corpus ever happens. Width arithmetic
    * at the 10^11-doc design point: the per-bucket window sort is the
    * only per-task cost, ~corpus/16^w rows per task — 4e8 at w=2 (the
    * serial-stage class the spine work eliminated) vs ~1.5e6 at the
    * default w=4; the bucket-count prefix sum is one 16^w-row window
    * task, trivial through w=6 (16.7M longs). A different seed
    * reshuffles every epoch with zero state.
    */
  def epochShuffle(docs: DataFrame, seed: String, nShards: Int,
      hexPrefix: Int = 4): DataFrame = {
    require(hexPrefix >= 1 && hexPrefix <= 6,
      s"hexPrefix must be 1..6 (16^w buckets; the bucket-count prefix " +
        s"sum is a single window task): got $hexPrefix")
    val h = md5(concat(lit(seed + ":"), col("doc_id").cast(StringType)))
    val keyed = docs.select(col("doc_id"), h.as("h"))
      .withColumn("bucket", substring(col("h"), 1, hexPrefix))
      .persist() // read by both the bucket counts and the rank side
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wB), lit(0L)))
      .select(col("bucket"), col("off"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
    val out = keyed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("shuffle_pos",
        col("off") + row_number().over(wIn).cast(LongType) - 1)
      .select(col("doc_id"), col("shuffle_pos"),
        (col("shuffle_pos") % nShards).as("shard"),
        floor(col("shuffle_pos") / nShards).as("pos_in_shard"))
      .localCheckpoint()
    keyed.unpersist()
    out
  }

  /** The curation pipeline's scrub expression (q_curation_pipeline /
    * q_pipeline_pack): the q_pii_scrub fixture (deterministic synthetic
    * PII per doc_id) followed by the three typed redactions, as ONE
    * codegen expression chain over the scan row.
    */
  private def curationScrubbedExpr: org.apache.spark.sql.Column = {
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
    regexp_replace(
      regexp_replace(regexp_replace(withPii, lit(email), lit("[EMAIL]")),
        lit(ip), lit("[IP]")),
      lit(phone), lit("[PHONE]"))
  }

  /** The curated survivor set (doc_id, text=scrubbed): quality gate →
    * scrub → exact dedup on scrubbed content, first KEPT copy per
    * fingerprint wins — the document set q_curation_pipeline counts and
    * q_pipeline_pack ships.
    */
  private def curatedDocs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("content_md5"))
      .orderBy(when(col("score_int") > 0, 0).otherwise(1), col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.linearTextScore(col("text"))
          .as("score_int"),
        curationScrubbedExpr.as("scrubbed"))
      .withColumn("content_md5", md5(col("scrubbed").cast("binary")))
      .withColumn("rn", row_number().over(w))
      .filter(col("score_int") > 0 && col("rn") === 1)
      .select(col("doc_id"), col("scrubbed").as("text"))
  }

  // DuckDB mirror of curatedDocs — the (doc_id, text) SELECT handed to
  // TextOps.bpeCteOver so the pack-audit oracle replays the WHOLE
  // pipeline: fixture PII + scrub + linear score + dedup window.
  private def curatedDocsSql: String =
    """WITH cp AS (SELECT doc_id,
             CAST(list_sum(list_transform(
               list_filter(string_split(text, ' '), w -> w <> ''),
               w -> ((list_reduce(list_prepend(0::BIGINT,
                       list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                     (a, x) -> (a * 31 + x) % 1000000007) % 256)
                     * 2654435761) % 2001 - 1000)) AS BIGINT) AS score_int,
             regexp_replace(regexp_replace(regexp_replace(
               (CASE WHEN doc_id % 3 = 0
                     THEN 'contact user' || doc_id || '@example.com ' ELSE '' END) ||
               (CASE WHEN doc_id % 5 = 0
                     THEN 'call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4321 ' ELSE '' END) ||
               (CASE WHEN doc_id % 7 = 0
                     THEN 'from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) || ' ' ELSE '' END) ||
               text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
               '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS scrubbed
           FROM documents),
         cr AS (SELECT doc_id, scrubbed, score_int,
                       row_number() OVER (PARTITION BY md5(scrubbed)
                         ORDER BY CASE WHEN score_int > 0 THEN 0 ELSE 1 END,
                                  doc_id) AS rn
                FROM cp)
         SELECT doc_id, scrubbed AS text FROM cr
         WHERE score_int > 0 AND rn = 1"""

  /** Dedup-aware (effective-contribution) temperature mix — the
    * composition `q_source_uniqueness`'s docstring motivates: per-source
    * mixture weight computed on the source's EFFECTIVE size, eff =
    * (n_docs × n_unique_shingles) div n_shingles (integer-exact), then
    * the q_temperature_mix convention (w = floor(sqrt(eff)·1e6), quota
    * = half the effective corpus by tempered share, md5-deterministic
    * per-doc draw against rate = quota/n_actual). A fully-syndicated
    * source (n_unique = 0) rates 0. Scale shape: the uniqueness pass is
    * the audited q_source_uniqueness plan; the mix adds
    * source-cardinality broadcasts + one corpus scan.
    */
  def effectiveMix(docs: DataFrame): DataFrame = {
    val uniq = graft.ops.CorpusOps.sourceUniqueness(docs)
      .select(col("source"), col("n_shingles"), col("n_unique"))
    val stats = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .join(uniq, Seq("source"))
      // MILLI-doc units: at corpus scale the uniqueness fraction is tiny
      // (sf0.1: ~10 unique of ~10k shingles/source) and a plain integer
      // div floors every source's effective size to 0, collapsing the
      // mix; scaling by 1000 before the exact integer div keeps the
      // arithmetic engine-identical AND non-degenerate
      .withColumn("eff", expr("(n * n_unique * 1000) div n_shingles"))
      .withColumn("w", floor(sqrt(col("eff")) * lit(1e6)).cast(LongType))
    val tots = stats.agg(sum(col("w")).as("tw"), sum(col("eff")).as("te"))
    docs.join(broadcast(stats), Seq("source"))
      .crossJoin(broadcast(tots))
      .withColumn("rate",
        when(col("tw") === 0, lit(0.0)).otherwise(least(lit(1.0),
          (lit(0.5) * col("te") *
            (col("w").cast(DoubleType) / col("tw").cast(DoubleType)))
            / (col("n") * lit(1000L)))))
      .filter(
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType).cast(DoubleType) / lit(4294967296.0) < col("rate"))
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  val queries: Seq[Q] = Seq(

    // Epoch shuffle: reproducible training order + loader shards. The
    // oracle states the SEMANTICS as one global window (rank by full
    // hash); the Spark plan realizes it as the bucketed two-phase rank.
    Q("q_epoch_shuffle",
      (s, dir) => epochShuffle(t(s, dir, "documents"), "epoch1", 8)
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, shuffle_pos, shuffle_pos % 8 AS shard,
                     CAST(FLOOR(shuffle_pos / 8.0) AS BIGINT) AS pos_in_shard
              FROM (SELECT doc_id,
                           row_number() OVER (ORDER BY
                             md5('epoch1:' || CAST(doc_id AS VARCHAR)), doc_id)
                             - 1 AS shuffle_pos
                    FROM documents)
              ORDER BY doc_id""")),

    // Per-domain cap: at most 10 docs per source, in doc_id order.
    Q("q_domain_cap",
      (s, dir) => domainCap(t(s, dir, "documents"), 10)
        .orderBy(col("source"), col("rn")),
      Some("""SELECT source, doc_id, rn FROM (
                SELECT source, doc_id,
                       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents)
              WHERE rn <= 10 ORDER BY source, rn""")),

    // Temperature-scaled source mixing (UniMax/multilingual-sampling
    // shape): per-source keep rates are DERIVED FROM THE DATA — weight
    // w_s = n_s^0.5 (alpha=0.5 flattens the source distribution), quota_s
    // = T*w_s/SUM(w) for a total target T = half the corpus, keep
    // fraction = min(1, quota_s/n_s) — unlike q_source_mix's fixed
    // thresholds, this is the rate computation a real training mix runs.
    // Selection stays md5-deterministic (hash-fraction < rate), so it is
    // replay-stable and oracle-exact. Determinism discipline: the weight
    // is INTEGER-exact on both engines — w = floor(sqrt(n)*1e6) as BIGINT
    // (IEEE sqrt and one multiply are bit-identical everywhere; floor of
    // a double is too, unlike round(), whose half-up tie handling differs
    // between Spark's BigDecimal path and DuckDB's float path) — summed
    // as longs (exact, order-independent), and the rate expression
    // mirrors the oracle's parenthesization so every double op is the
    // same IEEE sequence on both engines. Scale
    // shape: stats are source-cardinality (broadcast); the corpus pass is
    // one scan + per-row hash compare, no shuffle before the declared sort.
    Q("q_temperature_mix",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val stats = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
          .withColumn("w", floor(sqrt(col("n")) * lit(1e6)).cast(LongType))
        val tots = stats.agg(sum(col("w")).as("tw"), sum(col("n")).as("tn"))
        docs.join(broadcast(stats), Seq("source"))
          .crossJoin(broadcast(tots))
          .withColumn("rate", least(lit(1.0),
            (lit(0.5) * col("tn") * (col("w").cast(DoubleType) / col("tw").cast(DoubleType))) / col("n")))
          .filter(
            conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
              .cast(LongType).cast(DoubleType) / lit(4294967296.0) < col("rate"))
          .select(col("source"), col("doc_id"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""WITH stats AS (SELECT source, COUNT(*) AS n,
                                    CAST(floor(sqrt(COUNT(*)) * 1e6) AS BIGINT) AS w
                             FROM documents GROUP BY 1),
                   tot AS (SELECT SUM(w) AS tw, SUM(n) AS tn FROM stats)
              SELECT d.source, d.doc_id
              FROM documents d JOIN stats USING (source), tot
              WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0
                    < least(1.0, (0.5 * tn * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))) / n)
              ORDER BY source, doc_id""")),

    // TOKEN-WEIGHTED temperature mixing — the budget-accurate form of
    // q_temperature_mix: mixture weights and acceptance rates are
    // computed on SUBWORD TOKEN totals (what the trainer consumes, the
    // q_bpe_encode rationale), not document counts, so a source of few
    // huge documents is down-weighted the way its actual token share
    // demands. Same T=2 temperature (sqrt), same integer-quantized
    // weights, same deterministic md5-fraction draw per doc; the rate
    // targets a 0.5x total-token budget distributed by tempered token
    // share. The oracle replays the BPE counts (bpeCte) + identical
    // arithmetic.
    Q("q_temperature_mix_tokens",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(graft.functions.BpeEncodeTokens.bpeTokens(col("text")))
              .cast(LongType).as("n_tok"))
        val stats = docs.groupBy(col("source"))
          .agg(sum(col("n_tok")).as("t"))
          .withColumn("w", floor(sqrt(col("t")) * lit(1e6)).cast(LongType))
        val tots = stats.agg(sum(col("w")).as("tw"), sum(col("t")).as("tt"))
        docs.join(broadcast(stats), Seq("source"))
          .crossJoin(broadcast(tots))
          .withColumn("rate", least(lit(1.0),
            (lit(0.5) * col("tt") * (col("w").cast(DoubleType) / col("tw").cast(DoubleType))) / col("t")))
          .filter(
            conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
              .cast(LongType).cast(DoubleType) / lit(4294967296.0) < col("rate"))
          .select(col("source"), col("doc_id"), col("n_tok"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some(s"""${TextOps.bpeCte},
              cnt AS (SELECT doc_id, CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS n_tok
                      FROM fin GROUP BY doc_id),
              d AS (SELECT dd.source, dd.doc_id, coalesce(c.n_tok, 0) AS n_tok
                    FROM documents dd LEFT JOIN cnt c USING (doc_id)),
              stats AS (SELECT source, SUM(n_tok) AS t,
                               CAST(floor(sqrt(SUM(n_tok)) * 1e6) AS BIGINT) AS w
                        FROM d GROUP BY 1),
              tot AS (SELECT SUM(w) AS tw, SUM(t) AS tt FROM stats)
              SELECT d.source, d.doc_id, d.n_tok
              FROM d JOIN stats USING (source), tot
              WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0
                    < least(1.0, (0.5 * tt * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))) / t)
              ORDER BY source, doc_id""")),

    // DEDUP-AWARE (effective-contribution) temperature mixing — the
    // composition q_source_uniqueness's docstring motivates: a source
    // that is mostly syndicated content adds far fewer EFFECTIVE tokens
    // than its raw size claims, so its mixture weight should be computed
    // on its effective size, not its row count. Per source: eff =
    // (n_docs × n_unique_shingles) div n_shingles (integer-exact on both
    // engines — the uniqueness fraction applied to the doc count),
    // temperature weight w = floor(sqrt(eff)·1e6) (the q_temperature_mix
    // convention, T=2), quota targets half the EFFECTIVE corpus, and the
    // keep rate divides by the source's ACTUAL doc count (rates are
    // applied to real rows). A fully-syndicated source (n_unique = 0)
    // gets rate 0 — a keep-one-per-cluster dedup would drop it anyway;
    // PipelineOpsSpec pins that against the plain mix on a fixture with
    // one syndicated source. Scale shape: the uniqueness pass is the
    // audited q_source_uniqueness plan (distinct 16-byte rows, map-side
    // MIN/COUNT); the mix itself adds source-cardinality broadcasts and
    // one corpus scan with a per-row hash compare.
    Q("q_effective_mix",
      (s, dir) => effectiveMix(t(s, dir, "documents")),
      Some("""WITH d AS (SELECT source, text, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS n
              FROM documents),
       sh AS (SELECT DISTINCT source, chunk FROM (
                SELECT source,
                       CASE WHEN n <= 3 THEN text
                            ELSE array_to_string(ws[j+1 : j+3], ' ') END AS chunk
                FROM d, LATERAL (SELECT unnest(range(0,
                       CASE WHEN n <= 3 THEN 1 ELSE n - 3 + 1 END)) AS j))),
       m AS (SELECT chunk, count(*) AS ns FROM sh GROUP BY 1),
       u AS (SELECT s.source, CAST(count(*) AS BIGINT) AS n_shingles,
                    CAST(SUM(CASE WHEN m.ns = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
             FROM sh s JOIN m USING (chunk) GROUP BY 1),
       st AS (SELECT dd.source, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents dd GROUP BY 1),
       ef AS (SELECT st.source, st.n,
                     (st.n * u.n_unique * 1000) // u.n_shingles AS eff,
                     CAST(floor(sqrt((st.n * u.n_unique * 1000) // u.n_shingles) * 1e6) AS BIGINT) AS w
              FROM st JOIN u USING (source)),
       tot AS (SELECT SUM(w) AS tw, SUM(eff) AS te FROM ef)
       SELECT dd.source, dd.doc_id
       FROM documents dd JOIN ef USING (source), tot
       WHERE CAST(('0x' || substr(md5(CAST(dd.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0
             < CASE WHEN tw = 0 THEN 0.0
                    ELSE least(1.0, (0.5 * te * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))) / (n * 1000)) END
       ORDER BY source, doc_id""")),

    // Deterministic WEIGHTED sampling without replacement (Efraimidis-
    // Spirakis A-ES): per source, keep the top-20 docs by the key
    // u^(1/w) — equivalently ln(u)/w, monotone — where u is the doc's
    // md5-fraction and w = n_chars (the quality/size proxy a curation
    // pass samples proportional to). Deterministic: u is hash-derived,
    // so replays/retries converge, unlike rand()-weighted sampling.
    // Determinism discipline: the key is quantized to an INTEGER —
    // floor(ln(u)/w * 1e9) as BIGINT — before ranking and output (ln is
    // not guaranteed bit-identical across libm implementations; at 1e-9
    // granularity a boundary flip needs a ~1e-8-relative coincidence,
    // the q_kl_sources DECIMAL(24,9) convention), ties broken by doc_id
    // in both engines. Scale shape: one keyed shuffle on source, per-key
    // sort-based rank — the weighted stratified-sample plan.
    Q("q_weighted_sample",
      (s, dir) => {
        val u = (conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType).cast(DoubleType) + 1.0) / 4294967296.0
        val skey = floor(log(u) / col("n_chars").cast(DoubleType) * lit(1e9))
          .cast(LongType)
        val w = Window.partitionBy(col("source"))
          .orderBy(col("skey").desc, col("doc_id"))
        t(s, dir, "documents")
          .filter(col("n_chars") > 0)
          .select(col("source"), col("doc_id"), skey.as("skey"))
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter(col("rn") <= 20)
          .orderBy(col("source"), col("rn"))
      },
      Some("""SELECT source, doc_id, skey, rn FROM (
                SELECT source, doc_id, skey,
                       CAST(row_number() OVER (PARTITION BY source
                         ORDER BY skey DESC, doc_id) AS BIGINT) AS rn
                FROM (SELECT source, doc_id,
                             CAST(floor(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0) / 4294967296.0)
                                  / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS skey
                      FROM documents WHERE n_chars > 0))
              WHERE rn <= 20 ORDER BY source, rn""")),

    // Deterministic round-robin source interleave: round r of the
    // training order carries each source's r-th document (doc_id order),
    // so sources alternate evenly instead of concatenating — the "shuffle
    // sources, not just rows" property a mixed pretraining corpus wants
    // even before the epoch-level q_epoch_shuffle runs. One keyed window
    // per source; the interleaved ORDER is the deliverable (a range
    // exchange at scale), no global row_number is materialized.
    Q("q_interleave_sources",
      (s, dir) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"))
          .withColumn("round", row_number().over(w).cast(LongType) - 1)
          .select(col("round"), col("source"), col("doc_id"))
          .orderBy(col("round"), col("source"), col("doc_id"))
      },
      Some("""SELECT CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) - 1 AS round,
                     source, doc_id
              FROM documents ORDER BY round, source, doc_id""")),

    // Length-bucketed batch assignment: docs grouped into 16-token-wide
    // length buckets, then packed 8 per batch in doc_id order — the
    // padding-efficiency batching step before a trainer (same-length
    // sequences batch together, so pad waste is bounded by the bucket
    // width). Integer arithmetic end to end; one keyed shuffle on the
    // bucket, per-bucket sort-based rank.
    Q("q_length_buckets",
      (s, dir) => {
        val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_tok"))
          .withColumn("bucket", expr("n_tok div 16"))
          .withColumn("rn", row_number().over(w).cast(LongType) - 1)
          .select(col("bucket"), expr("rn div 8").as("batch_id"),
            (col("rn") % 8).as("pos_in_batch"), col("doc_id"), col("n_tok"))
          .orderBy(col("bucket"), col("batch_id"), col("pos_in_batch"))
      },
      Some("""SELECT bucket, rn // 8 AS batch_id, rn % 8 AS pos_in_batch, doc_id, n_tok
              FROM (SELECT doc_id, n_tok, bucket,
                           CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) - 1 AS rn
                    FROM (SELECT doc_id,
                                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                                 CAST(len(string_split(text, ' ')) AS BIGINT) // 16 AS bucket
                          FROM documents))
              ORDER BY bucket, batch_id, pos_in_batch""")),

    // Source mixing: src0/src1 keep ~100%, src2 ~50%, everything else ~10%.
    Q("q_source_mix",
      (s, dir) => sourceMix(t(s, dir, "documents"),
          Seq("src0" -> "ff", "src1" -> "ff", "src2" -> "7f"), "19")
        .orderBy(col("source"), col("doc_id")),
      Some("""SELECT source, doc_id FROM documents
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
                    CASE WHEN source = 'src0' THEN 'ff'
                         WHEN source = 'src1' THEN 'ff'
                         WHEN source = 'src2' THEN '7f'
                         ELSE '19' END
              ORDER BY source, doc_id""")),

    // Decontamination vs the doc_id % 97 == 0 eval subset: training docs
    // sharing >= 2 distinct shingles with any eval doc. The oracle builds
    // the same distinct-3-shingle sets from strings (hash-collision odds
    // across a corpus vocabulary are ~1e-7 per TextDedup's convention and
    // the sf0.01 compare would catch one).
    Q("q_decontaminate",
      (s, dir) => decontaminate(t(s, dir, "documents"),
          col("doc_id") % 97 === 0, minOverlap = 2)
        .orderBy(col("doc_id")),
      Some("""WITH sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                         range(1, CASE WHEN len(ws) >= 3 THEN len(ws) - 1 ELSE 2 END),
                         i -> CASE WHEN len(ws) >= 3
                                   THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                   ELSE text END))) AS s
                FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)),
              ov AS (
                SELECT a.doc_id, b.doc_id AS eval_id, count(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s
                WHERE b.doc_id % 97 = 0 AND a.doc_id % 97 <> 0
                GROUP BY 1, 2)
              SELECT doc_id, max(c) AS max_overlap, count(*) AS n_eval_hits
              FROM ov GROUP BY doc_id HAVING max(c) >= 2 ORDER BY doc_id""")),

    // Quantile-gated quality filter: drop the shortest quartile of the
    // corpus — the data-driven threshold form of a length gate (the
    // cutoff adapts to the corpus instead of being hand-tuned). The
    // threshold is one tiny aggregate (scalar subquery, broadcast); the
    // corpus then streams through the filter map-side.
    Q("q_quality_gate",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
          .createOrReplaceTempView("docs_ntok_v")
        s.sql("""SELECT doc_id, n_tokens FROM docs_ntok_v
                 WHERE n_tokens >= (SELECT CAST(PERCENTILE_DISC(0.25)
                          WITHIN GROUP (ORDER BY n_tokens) AS BIGINT)
                        FROM docs_ntok_v)
                 ORDER BY doc_id""")
      },
      Some("""WITH v AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                         FROM documents)
              SELECT doc_id, n_tokens FROM v
              WHERE n_tokens >= (SELECT quantile_disc(n_tokens, 0.25) FROM v)
              ORDER BY doc_id""")),

    // CCNet head/middle/tail perplexity buckets per language, rank-third
    // split over the two-phase value spine.
    Q("q_ccnet_buckets",
      (s, dir) => ccnetBuckets(t(s, dir, "documents")),
      Some(ccnetBucketsOracle)),

    // Unigram surprisal per doc (perplexity-filter proxy).
    Q("q_unigram_logprob",
      (s, dir) => unigramLogprob(t(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
              freq AS (
                SELECT token, count(*) AS cnt FROM tok GROUP BY token),
              scored AS (
                SELECT token,
                       CAST(-ln(CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM freq))
                            AS DECIMAL(24,9)) AS nll
                FROM freq)
              SELECT doc_id, count(*) AS n_tokens,
                     CAST(sum(nll) AS DOUBLE) / count(*) AS avg_nll
              FROM tok JOIN scored USING (token)
              GROUP BY doc_id ORDER BY doc_id""")),

    // Bigram conditional surprisal per doc — the CCNet-style LM
    // perplexity filter one order up from q_unigram_logprob: the corpus
    // trains p(w2|w1) = cnt(w1 w2)/cnt(w1·) and each document is scored
    // by its mean bigram NLL. Same determinism treatment: per-distinct-
    // bigram -ln(p) rounds to DECIMAL(24,9) BEFORE the per-doc sum, so
    // aggregation order cannot move a bit. Plan: one bigram explode
    // (lambda over the split array — no self-join); the score table is
    // bounded by DISTINCT-bigram count, which unlike the unigram vocab
    // is not broadcast-safe at corpus scale — no broadcast hint, AQE
    // picks BHJ when it fits and a shuffle join when it does not.
    Q("q_bigram_logprob",
      (s, dir) => {
        // persisted: big feeds the LM counts AND the scoring join, and
        // cnt2 feeds cnt1 AND scored — without this the tokenize+explode
        // subtree re-executes per consumer (3 corpus scans; the
        // tokenShards persist rationale). localCheckpoint on the small
        // per-doc result materializes before the unpersist.
        val big = t(s, dir, "documents")
          .withColumn("arr", split(col("text"), " "))
          .where(size(col("arr")) >= 2)
          .select(col("doc_id"),
            explode(expr("transform(slice(arr, 1, size(arr) - 1), " +
              "(x, i) -> concat(x, ' ', arr[i + 1]))")).as("bigram"))
          .persist()
        val cnt2 = big.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
        val cnt1 = cnt2
          .groupBy(split(col("bigram"), " ").getItem(0).as("w1"))
          .agg(sum(col("c2")).as("c1"))
        val scored = cnt2
          .withColumn("w1", split(col("bigram"), " ").getItem(0))
          .join(cnt1, Seq("w1"))
          .withColumn("nll",
            (-log(col("c2").cast(DoubleType) / col("c1")))
              .cast(DecimalType(24, 9)))
          .select(col("bigram"), col("nll"))
        val out = big.join(scored, Seq("bigram"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            (sum(col("nll")).cast(DoubleType) / count(lit(1))).as("avg_nll"))
          .orderBy(col("doc_id"))
          .localCheckpoint()
        big.unpersist()
        out
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ls
                         FROM documents
                         WHERE len(string_split(text, ' ')) >= 2),
              big AS (SELECT doc_id,
                             unnest(list_transform(range(1, len(ls)),
                               i -> ls[i] || ' ' || ls[i + 1])) AS bigram
                      FROM d),
              c2t AS (SELECT bigram, count(*) AS c2 FROM big GROUP BY bigram),
              c1t AS (SELECT string_split(bigram, ' ')[1] AS w1,
                             CAST(sum(c2) AS BIGINT) AS c1
                      FROM c2t GROUP BY 1),
              scored AS (SELECT bigram,
                                CAST(-ln(CAST(c2 AS DOUBLE) / c1) AS DECIMAL(24,9)) AS nll
                         FROM c2t JOIN c1t
                           ON string_split(c2t.bigram, ' ')[1] = c1t.w1)
              SELECT doc_id, count(*) AS n_bigrams,
                     CAST(sum(nll) AS DOUBLE) / count(*) AS avg_nll
              FROM big JOIN scored USING (bigram)
              GROUP BY doc_id ORDER BY doc_id""")),

    // The WHOLE curation pipeline as ONE declarative plan — the
    // showpiece composition: quality gate (codegen LinearTextScore) →
    // PII scrub (q_pii_scrub's fixture + 3 typed redactions) → exact
    // dedup on scrubbed content (keeper = min doc_id per md5) → token
    // accounting per synthetic source bucket (doc_id % 4). Per-bucket
    // funnel readout: docs in, survivors of the quality gate, unique
    // survivors, and their total whitespace tokens. Because the stages
    // compose as expressions + one window + two aggregations, Catalyst
    // sees the WHOLE pipeline: the scrub/classifier run in a single
    // codegen stage over the scan, dedup is the only wide exchange, and
    // the funnel counts piggyback on the same pass — the argument for
    // declaring pipelines instead of materializing between stages.
    Q("q_curation_pipeline",
      (s, dir) => {
        val scrubbed = curationScrubbedExpr
        // ONE corpus scan: every stage is an expression over the same
        // row, the dedup rank is one content-keyed window, and ALL four
        // funnel counters come out of a single conditional aggregation.
        // Dedup ranks kept docs ahead of dropped ones (keep DESC) so a
        // group whose first occurrence failed the gate still yields its
        // first KEPT copy as the unique survivor; dropped-only groups
        // contribute nothing (the rank-1 row fails the keep flag).
        val w = Window.partitionBy(col("content_md5"))
          .orderBy(when(col("score_int") > 0, 0).otherwise(1), col("doc_id"))
        t(s, dir, "documents")
          .select(col("doc_id"),
            concat(lit("s"), (col("doc_id") % 4).cast(StringType)).as("src"),
            graft.functions.TextFunctions.linearTextScore(col("text"))
              .as("score_int"),
            scrubbed.as("scrubbed"))
          .withColumn("content_md5", md5(col("scrubbed").cast("binary")))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("src"))
          .agg(count(lit(1)).as("docs_in"),
            sum(when(col("score_int") > 0, 1L).otherwise(0L)).as("kept_quality"),
            sum(when(col("score_int") > 0 && col("rn") === 1, 1L)
              .otherwise(0L)).as("kept_unique"),
            sum(when(col("score_int") > 0 && col("rn") === 1,
              size(split(col("scrubbed"), " ")).cast(LongType))
              .otherwise(0L)).as("total_tokens"))
          .orderBy(col("src"))
      },
      Some("""WITH p AS (SELECT doc_id,
                     's' || CAST(doc_id % 4 AS VARCHAR) AS src,
                     CAST(list_sum(list_transform(
                       list_filter(string_split(text, ' '), w -> w <> ''),
                       w -> ((list_reduce(list_prepend(0::BIGINT,
                               list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                             (a, x) -> (a * 31 + x) % 1000000007) % 256)
                             * 2654435761) % 2001 - 1000)) AS BIGINT) AS score_int,
                     regexp_replace(regexp_replace(regexp_replace(
                       (CASE WHEN doc_id % 3 = 0
                             THEN 'contact user' || doc_id || '@example.com ' ELSE '' END) ||
                       (CASE WHEN doc_id % 5 = 0
                             THEN 'call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4321 ' ELSE '' END) ||
                       (CASE WHEN doc_id % 7 = 0
                             THEN 'from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) || ' ' ELSE '' END) ||
                       text,
                       '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                       '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS scrubbed
              FROM documents),
              r AS (SELECT src, score_int, scrubbed,
                           row_number() OVER (
                             PARTITION BY md5(scrubbed)
                             ORDER BY CASE WHEN score_int > 0 THEN 0 ELSE 1 END,
                                      doc_id) AS rn
                    FROM p)
              SELECT src, COUNT(*) AS docs_in,
                     CAST(SUM(CASE WHEN score_int > 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept_quality,
                     CAST(SUM(CASE WHEN score_int > 0 AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_unique,
                     CAST(SUM(CASE WHEN score_int > 0 AND rn = 1
                              THEN len(string_split(scrubbed, ' ')) ELSE 0 END) AS BIGINT) AS total_tokens
              FROM r GROUP BY src
              ORDER BY src""")),

    // THE PIPELINE, CLOSED END-TO-END ON THE GATE: quality gate → PII
    // scrub → exact dedup → BPE tokenize → pack into fixed-budget
    // token-id sequences → SHIP as shard-partitioned parquet → read the
    // artifact back and audit it. The Spark side actually materializes
    // the shards (sources.PackedShards on the curated survivor set); the
    // oracle never sees the writer — it replays curation (fixture PII +
    // scrub + linear score + dedup window), the BPE merge loop, the
    // BpeVocab id map, and the integer offset arithmetic, all in SQL, so
    // the hash match proves the SHIPPED BYTES of the whole pipeline, not
    // any intermediate. This is the hand-off artifact of the entire
    // engine: a trainer streams these files. Scale shape: curation is
    // one scan + one content-keyed window, packing adds the two-phase
    // offsets and ONE grouped shuffle of the output bytes, the write is
    // one file per shard.
    Q("q_pipeline_pack",
      (s, dir) => TextOps.packShardsAudit(s, curatedDocs(s, dir)),
      Some(TextOps.bpeCteOver(curatedDocsSql) + TextOps.packShardsTailSql)),

    // Per-source dataset card v2 — the one-row-per-source datasheet a
    // corpus team publishes with a training run: docs, WHITESPACE token
    // volume AND subword token volume under the committed merge table
    // (the number the trainer actually consumes — budget decisions read
    // this column, and the fixture's tokens_per_word ~1.4 gap between
    // the two is exactly why the card carries both), language spread +
    // dominant language, and TWO duplicate-exposure signals: prefix-32
    // (md5 of the first 32 words — the q_dedup_prefix32 / RefinedWeb
    // signal) and NEAR-DUP exposure through the md5-regime 60-bit
    // SimHash + 4-band Hamming LSH (the q_dedup_simhash machinery — the
    // document-perceptual fingerprint, so reworded/truncated copies
    // count, not just shared prefixes). Both exposures are cross-source
    // properties (a per-source count would hide mirror sites); a doc is
    // exposed if its fingerprint collides anywhere in the corpus.
    // Shuffles: O(docs) fingerprint rows + O(sources) partials — text
    // never moves. Dominant language via the deterministic
    // max(struct(count, lang)) argmax (ties -> largest lang code,
    // mirrored ORDER BY c DESC, lang DESC).
    Q("q_corpus_datasheet",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val base = docs.select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          size(graft.functions.BpeEncodeTokens.bpeTokens(col("text")))
            .cast(LongType).as("n_bpe"),
          md5(concat_ws(" ", slice(split(col("text"), " "), 1, 32))).as("ph"))
        val dup = base.groupBy(col("ph")).agg(count(lit(1)).as("c"))
        val ndPairs = graft.ops.TextDedup.hammingBandedPairs(
          docs.select(col("doc_id").as("id"),
            graft.functions.TextFunctions.md5Simhash60(col("text")).as("h")),
          maxHamming = 3, bands = 4)
        val ndIds = ndPairs.select(col("a_id").as("doc_id"))
          .unionAll(ndPairs.select(col("b_id").as("doc_id")))
          .distinct().withColumn("isnd", lit(1L))
        val withDup = base.join(dup, Seq("ph"))
          .join(ndIds, Seq("doc_id"), "left")
        val langTop = base.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("lc"))
          .groupBy(col("source"))
          .agg(max(struct(col("lc"), col("lang"))).as("m"),
            count(lit(1)).as("n_langs"))
          .select(col("source"), col("m.lang").as("top_lang"), col("n_langs"))
        withDup.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("n_bpe")).as("total_bpe_tokens"),
            sum(col("n_chars")).as("total_chars"),
            sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_predup_docs"),
            sum(coalesce(col("isnd"), lit(0L))).as("n_neardup_docs"))
          .join(langTop, Seq("source"))
          .select(col("source"), col("n_docs"), col("total_tokens"),
            col("total_bpe_tokens"), col("total_chars"),
            (col("total_tokens").cast(DoubleType) / col("n_docs"))
              .as("avg_tokens"),
            col("n_langs"), col("top_lang"), col("n_predup_docs"),
            (col("n_predup_docs").cast(DoubleType) / col("n_docs"))
              .as("predup_rate"),
            col("n_neardup_docs"),
            (col("n_neardup_docs").cast(DoubleType) / col("n_docs"))
              .as("neardup_rate"))
          .orderBy(col("source"))
      },
      Some(s"""${TextOps.bpeCte},
              bt AS (SELECT doc_id,
                            CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS nb
                     FROM fin GROUP BY doc_id),
              sw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              sh AS (
                SELECT doc_id,
                       list_transform(ws, wd ->
                         CAST(list_sum(list_transform(range(1, 16), j ->
                           CAST(strpos('0123456789abcdef', substr(md5(wd), j, 1)) - 1 AS BIGINT)
                             << (4 * (15 - j)))) AS BIGINT)) AS hs
                FROM sw),
              sf AS (
                SELECT doc_id,
                       CAST(list_sum(list_transform(range(0, 60), b ->
                         CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs)
                              THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
                FROM sh),
              sbanded AS (
                SELECT doc_id, fp, b AS band, (fp >> (b * 16)) & 65535 AS key
                FROM (SELECT doc_id, fp, unnest(range(0, 4)) AS b FROM sf)),
              sguard AS (
                SELECT band, key FROM sbanded GROUP BY band, key HAVING COUNT(*) <= 64),
              spruned AS (SELECT sbanded.* FROM sbanded JOIN sguard USING (band, key)),
              spairs AS (
                SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.fp AS fa, b.fp AS fb
                FROM spruned a JOIN spruned b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
              nd AS (SELECT DISTINCT doc_id FROM (
                       SELECT a_id AS doc_id FROM spairs WHERE bit_count(xor(fa, fb)) <= 3
                       UNION ALL
                       SELECT b_id FROM spairs WHERE bit_count(xor(fa, fb)) <= 3)),
              base AS (
                SELECT d.doc_id, source, lang, n_chars,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                       coalesce(bt.nb, 0) AS n_bpe,
                       md5(array_to_string(string_split(text, ' ')[1:32], ' ')) AS ph
                FROM documents d LEFT JOIN bt USING (doc_id)),
              dup AS (SELECT ph, COUNT(*) AS c FROM base GROUP BY ph),
              lt AS (
                SELECT source, lang AS top_lang, n_langs FROM (
                  SELECT source, lang, lc,
                         ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY lc DESC, lang DESC) AS rn,
                         COUNT(*) OVER (PARTITION BY source) AS n_langs
                  FROM (SELECT source, lang, COUNT(*) AS lc
                        FROM base GROUP BY 1, 2))
                WHERE rn = 1),
              agg AS (
                SELECT b.source,
                       COUNT(*) AS n_docs,
                       SUM(b.n_tokens) AS total_tokens,
                       SUM(b.n_bpe) AS total_bpe_tokens,
                       SUM(b.n_chars) AS total_chars,
                       SUM(CASE WHEN d.c > 1 THEN 1 ELSE 0 END) AS n_predup_docs,
                       SUM(CASE WHEN nd.doc_id IS NULL THEN 0 ELSE 1 END) AS n_neardup_docs
                FROM base b JOIN dup d USING (ph)
                     LEFT JOIN nd ON nd.doc_id = b.doc_id
                GROUP BY b.source)
              SELECT a.source,
                     CAST(n_docs AS BIGINT) AS n_docs,
                     CAST(total_tokens AS BIGINT) AS total_tokens,
                     CAST(total_bpe_tokens AS BIGINT) AS total_bpe_tokens,
                     CAST(total_chars AS BIGINT) AS total_chars,
                     CAST(total_tokens AS DOUBLE) / n_docs AS avg_tokens,
                     lt.n_langs, lt.top_lang,
                     CAST(n_predup_docs AS BIGINT) AS n_predup_docs,
                     CAST(n_predup_docs AS DOUBLE) / n_docs AS predup_rate,
                     CAST(n_neardup_docs AS BIGINT) AS n_neardup_docs,
                     CAST(n_neardup_docs AS DOUBLE) / n_docs AS neardup_rate
              FROM agg a JOIN lt ON lt.source = a.source
              ORDER BY a.source""")),

    // Span-granularity decontamination vs the doc_id % 97 == 0 eval
    // subset: the exact word ranges of each training doc covered by a
    // 3-word window shared with any eval doc, overlap-merged into
    // maximal spans, with eval attribution (distinct eval docs touching
    // the span + smallest eval id). Same windows as q_decontaminate's
    // shingles but position-tracked; same islands as q_repeated_spans.
    // The oracle replays windows on chunk STRINGS (hash-vs-string
    // convention), the eval equi-join, and the islands.
    Q("q_decontaminate_spans",
      (s, dir) => decontaminateSpans(t(s, dir, "documents"),
          col("doc_id") % 97 === 0, k = 3)
        .orderBy(col("doc_id"), col("span_start")),
      Some("""WITH x AS (
                SELECT doc_id, ws, len(ws) AS n, doc_id % 97 = 0 AS is_eval
                FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
              win AS (
                SELECT doc_id, is_eval, n, j AS win,
                       CASE WHEN n <= 3 THEN array_to_string(ws, ' ')
                            ELSE array_to_string(ws[j+1 : j+3], ' ') END AS chunk
                FROM x, LATERAL (SELECT unnest(range(0,
                       CASE WHEN n <= 3 THEN 1 ELSE n - 3 + 1 END)) AS j)),
              ew AS (SELECT DISTINCT chunk, doc_id AS eval_id
                     FROM win WHERE is_eval),
              hit AS (SELECT w.doc_id, w.n, w.win, e.eval_id
                      FROM win w JOIN ew e USING (chunk)
                      WHERE NOT w.is_eval),
              isl AS (
                SELECT doc_id, win,
                       SUM(CASE WHEN prev IS NULL OR win - prev > 2 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY win) AS island
                FROM (SELECT doc_id, win,
                             lag(win) OVER (PARTITION BY doc_id ORDER BY win) AS prev
                      FROM (SELECT DISTINCT doc_id, win FROM hit)))
              SELECT h.doc_id, MIN(h.win) AS span_start,
                     LEAST(MAX(h.win) + 2, h.n - 1) AS span_end,
                     LEAST(MAX(h.win) + 2, h.n - 1) - MIN(h.win) + 1 AS span_words,
                     COUNT(DISTINCT h.eval_id) AS n_eval_docs,
                     MIN(h.eval_id) AS min_eval_id
              FROM hit h JOIN isl i ON h.doc_id = i.doc_id AND h.win = i.win
              GROUP BY h.doc_id, i.island, h.n
              ORDER BY 1, 2""")),

    // APPLYING the contaminated-span cut (the q_span_removed_text shape
    // pointed at eval leakage instead of corpus boilerplate): every
    // training-doc word covered by a span shared with an eval doc is
    // removed and the doc re-joins — the surgical alternative to
    // q_decontaminate's whole-doc kill. Output per surviving train doc:
    // word counts and the md5 of the cleaned text (fingerprint, not
    // text — the compare stays scalar and pins every byte). The span
    // relation is pair-bounded and broadcasts; membership is an
    // exists() over the per-doc span array, order-independent.
    Q("q_decontaminate_removed",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val perDoc = decontaminateSpans(docs, col("doc_id") % 97 === 0, k = 3)
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
        docs.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(perDoc), Seq("doc_id"), "left")
          .withColumn("ws", split(col("text"), " "))
          .withColumn("clean_arr", expr(
            """filter(transform(ws, (w, i) -> struct(w AS w, CAST(i AS BIGINT) AS i)),
                 x -> spans IS NULL OR
                      NOT exists(spans, sp -> x.i >= sp.span_start AND x.i <= sp.span_end))"""))
          .select(col("doc_id"),
            size(col("ws")).cast(LongType).as("n_words"),
            (size(col("ws")) - size(col("clean_arr"))).cast(LongType).as("n_removed"),
            md5(expr("array_join(transform(clean_arr, x -> x.w), ' ')").cast("binary"))
              .as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH x AS (
                SELECT doc_id, ws, len(ws) AS n, doc_id % 97 = 0 AS is_eval
                FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
              win AS (
                SELECT doc_id, is_eval, n, j AS win,
                       CASE WHEN n <= 3 THEN array_to_string(ws, ' ')
                            ELSE array_to_string(ws[j+1 : j+3], ' ') END AS chunk
                FROM x, LATERAL (SELECT unnest(range(0,
                       CASE WHEN n <= 3 THEN 1 ELSE n - 3 + 1 END)) AS j)),
              ew AS (SELECT DISTINCT chunk FROM win WHERE is_eval),
              hit AS (SELECT DISTINCT w.doc_id, w.n, w.win
                      FROM win w JOIN ew e USING (chunk)
                      WHERE NOT w.is_eval),
              isl AS (
                SELECT doc_id, n, win,
                       SUM(CASE WHEN prev IS NULL OR win - prev > 2 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY win) AS island
                FROM (SELECT doc_id, n, win,
                             lag(win) OVER (PARTITION BY doc_id ORDER BY win) AS prev
                      FROM hit)),
              sp AS (SELECT doc_id, MIN(win) AS span_start,
                            LEAST(MAX(win) + 2, n - 1) AS span_end
                     FROM isl GROUP BY doc_id, island, n),
              w AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS i, unnest(ws) AS word
                    FROM x WHERE NOT is_eval),
              marked AS (SELECT w.doc_id, w.i, w.word,
                                EXISTS(SELECT 1 FROM sp WHERE sp.doc_id = w.doc_id
                                       AND w.i BETWEEN sp.span_start AND sp.span_end) AS rm
                         FROM w)
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_words,
                     CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                     md5(coalesce(string_agg(word, ' ' ORDER BY i) FILTER (WHERE NOT rm), '')) AS clean_md5
              FROM marked GROUP BY doc_id ORDER BY doc_id"""))
  )
}
