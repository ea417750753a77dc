package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Statistical diagnostics and web-corpus primitives a curation pipeline
  * runs alongside dedup: URL structure extraction, per-document token
  * entropy (a quality signal), exact-moment Pearson correlation,
  * percentile winsorization, and per-source unigram KL divergence (the
  * "did this source drift from the corpus mix" check). All aggregates
  * follow the decimal-exact convention (ops/package.scala): per-term
  * doubles are rounded into decimals BEFORE the sum, so partial
  * aggregation order — Spark's tree vs DuckDB's sequential scan — cannot
  * move a bit.
  */
object StatsOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-doc tokens — the one exploded pass q_token_entropy and
    * q_kl_sources both start from.
    */
  private def tokens(docs: DataFrame, key: String): DataFrame =
    docs.select(col(key), explode(split(col("text"), " ")).as("token"))

  /** (source, n_tokens, kl_nats): per-source unigram KL divergence
    * against the corpus distribution — the drift relation q_kl_sources
    * declares and TrainerOps.doremiMix consumes as its excess-loss
    * proxy. Source-local and global token counts come from the same
    * exploded pass; the small per-source totals and the single global
    * total broadcast onto the (source, token) stream; per-token
    * p*ln(p/q) terms are decimal-rounded then summed exactly
    * (order-independent on both engines).
    */
  def klBySource(s: SparkSession, docs: DataFrame): DataFrame = {
    val tok = tokens(docs, "source")
    val st = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val sn = st.groupBy(col("source"))
      .agg(sum(col("c")).cast(LongType).as("n"))
    val g = tok.groupBy(col("token")).agg(count(lit(1)).as("gc"))
    val tot = g.agg(sum(col("gc")).cast(LongType).as("gn"))
    val p = col("c").cast(DoubleType) / col("n")
    val qq = col("gc").cast(DoubleType) / col("gn")
    st.join(broadcast(sn), Seq("source"))
      .join(g, Seq("token"))
      .crossJoin(broadcast(tot))
      .withColumn("term", (p * log(p / qq)).cast(DecimalType(24, 9)))
      .groupBy(col("source"), col("n"))
      .agg(sum(col("term")).cast(DoubleType).as("kl_nats"))
      .select(col("source"), col("n").as("n_tokens"), col("kl_nats"))
  }

  /** DuckDB CTE block defining relation kl(source, n_tokens, kl_nats) —
    * the oracle twin of [[klBySource]], shared by q_kl_sources and
    * q_doremi_mix. Starts after WITH.
    */
  val klCte: String =
    """tok AS (
         SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
       sn AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY 1),
       g AS (SELECT token, count(*) AS gc FROM tok GROUP BY 1),
       tot AS (SELECT CAST(sum(gc) AS BIGINT) AS gn FROM g),
       kl AS (SELECT st.source, sn.n AS n_tokens,
                     CAST(SUM(CAST((CAST(st.c AS DOUBLE) / sn.n)
                          * ln((CAST(st.c AS DOUBLE) / sn.n)
                               / (CAST(g.gc AS DOUBLE) / tot.gn)) AS DECIMAL(24,9)))
                       AS DOUBLE) AS kl_nats
              FROM st JOIN sn USING (source) JOIN g USING (token) CROSS JOIN tot
              GROUP BY st.source, sn.n)"""

  val queries: Seq[Q] = Seq(

    // URL component extraction (host / path / query param) over a
    // deterministic per-row URL — the canonicalization front door of a
    // crawl pipeline (group by host, strip tracking params). Spark side
    // is the real parser (parse_url, codegen'd); the oracle rebuilds the
    // components from the same fields the URL was synthesized from —
    // documents carry no URL column, so the synthesis IS the fixture.
    Q("q_url_parse",
      (s, dir) => {
        val url = concat(lit("https://"), col("source"), lit(".example.com/d/"),
          col("doc_id").cast(StringType), lit("?lang="), col("lang"), lit("&v=2"))
        t(s, dir, "documents")
          .withColumn("url", url)
          .select(col("doc_id"), col("url"),
            expr("parse_url(url, 'HOST')").as("host"),
            expr("parse_url(url, 'PATH')").as("path"),
            expr("parse_url(url, 'QUERY', 'lang')").as("lang_q"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                     'https://' || source || '.example.com/d/' || doc_id ||
                       '?lang=' || lang || '&v=2' AS url,
                     source || '.example.com' AS host,
                     '/d/' || doc_id AS path,
                     lang AS lang_q
              FROM documents ORDER BY doc_id""")),

    // Shannon entropy (nats) of each document's unigram distribution —
    // low entropy flags boilerplate/repetition, the quality gate next to
    // q_repetition and q_text_quality. Two aggregates over one exploded
    // pass; per-distinct-token terms are decimal-rounded then summed
    // exactly.
    Q("q_token_entropy",
      (s, dir) => {
        val tok = tokens(t(s, dir, "documents"), "doc_id")
        val counts = tok.groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("c"))
        val totals = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val p = col("c").cast(DoubleType) / col("n")
        counts.join(totals, Seq("doc_id"))
          .withColumn("term", (-p * log(p)).cast(DecimalType(24, 9)))
          .groupBy(col("doc_id"), col("n"))
          .agg(count(lit(1)).as("n_distinct"),
            sum(col("term")).cast(DoubleType).as("entropy_nats"))
          .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
            col("entropy_nats"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
              c AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
              n AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1)
              SELECT c.doc_id, n.n AS n_tokens, count(*) AS n_distinct,
                     CAST(SUM(CAST(-(CAST(c.c AS DOUBLE) / n.n)
                          * ln(CAST(c.c AS DOUBLE) / n.n) AS DECIMAL(24,9)))
                       AS DOUBLE) AS entropy_nats
              FROM c JOIN n USING (doc_id)
              GROUP BY c.doc_id, n.n ORDER BY doc_id""")),

    // Pearson correlation from exact decimal moments: built-in corr()
    // sums doubles in partial-aggregation order and cannot hash-match a
    // sequential engine, so the five moments are decimal-exact sums
    // (2-decimal inputs -> 4-decimal products, no rounding at all) and
    // only the final closed form runs in double — the same few IEEE ops
    // on identical inputs on both engines. "Identical inputs" needs one
    // care: once a moment's UNSCALED decimal exceeds 2^53 (syy does from
    // sf0.001 up), DuckDB's direct decimal->double DOUBLE-rounds
    // (int128->double, then /10^scale) while the JVM rounds the exact
    // value once — the oracle routes the cast through VARCHAR (strtod,
    // correctly rounded) so both engines see the same doubles.
    Q("q_corr",
      (s, dir) => {
        val q = dec2(col("l_quantity"))
        val p = dec2(col("l_extendedprice"))
        val m = DecimalType(30, 4)
        val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(q).as("sx"), sum(p).as("sy"),
            sum((q * p).cast(m)).as("sxy"),
            sum((q * q).cast(m)).as("sxx"),
            sum((p * p).cast(m)).as("syy"))
          .select(col("l_returnflag"), col("n"),
            ((col("n") * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
              (sqrt(col("n") * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
               sqrt(col("n") * d(col("syy")) - d(col("sy")) * d(col("sy")))))
              .as("corr_qty_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH a AS (
                SELECT l_returnflag, COUNT(*) AS n,
                       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                       SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS sxy,
                       SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS sxx,
                       SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS syy
                FROM lineitem GROUP BY l_returnflag)
              SELECT l_returnflag, n,
                     (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
                     (sqrt(n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) *
                      sqrt(n * CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
                       AS corr_qty_price
              FROM a ORDER BY l_returnflag""")),

    // Winsorize: clamp each event's value into its type's [p05, p95] —
    // the outlier treatment that keeps rows (vs q_zscore_outliers, which
    // flags them). Per-group thresholds are one tiny aggregate broadcast
    // back over the fact stream; the clamp itself is map-side.
    Q("q_winsorize",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("value").isNotNull)
        val pct = e.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.05)").as("p05"),
            expr("percentile(value, 0.95)").as("p95"))
        e.join(broadcast(pct), Seq("event_type"))
          .select(col("event_id"), col("event_type"),
            least(greatest(col("value"), col("p05")), col("p95")).as("value_w"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
                SELECT event_type, quantile_cont(value, 0.05) AS p05,
                       quantile_cont(value, 0.95) AS p95
                FROM events WHERE value IS NOT NULL GROUP BY event_type)
              SELECT event_id, event_type,
                     LEAST(GREATEST(value, p05), p95) AS value_w
              FROM events JOIN p USING (event_type)
              WHERE value IS NOT NULL ORDER BY event_id""")),

    // Per-source unigram KL divergence against the corpus distribution —
    // the drift check run before adjusting a source's mixing rate
    // (complement of q_source_mix's rate application). Source-local and
    // global token counts come from the same exploded pass; the small
    // per-source totals and the single global total broadcast onto the
    // (source, token) stream, and the per-token p*ln(p/q) terms are
    // decimal-rounded then summed exactly.
    Q("q_kl_sources",
      (s, dir) => klBySource(s, t(s, dir, "documents")).orderBy(col("source")),
      Some(s"""WITH $klCte
              SELECT source, n_tokens, kl_nats FROM kl ORDER BY source""")),

    // Per-group OLS fit (regr_slope / regr_intercept surface): price as a
    // linear function of quantity, from the same exact decimal moments as
    // q_corr — the built-in regr_* aggregates sum doubles in partial-agg
    // order and cannot hash-match a sequential engine.
    Q("q_linear_fit",
      (s, dir) => {
        val x = dec2(col("l_quantity"))
        val y = dec2(col("l_extendedprice"))
        val m = DecimalType(30, 4)
        val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
        val slope = (col("n") * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (col("n") * d(col("sxx")) - d(col("sx")) * d(col("sx")))
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum((x * y).cast(m)).as("sxy"),
            sum((x * x).cast(m)).as("sxx"))
          .select(col("l_returnflag"), col("n"), slope.as("slope"),
            ((d(col("sy")) - slope * d(col("sx"))) / col("n")).as("intercept"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH a AS (
                SELECT l_returnflag, COUNT(*) AS n,
                       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                       SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS sxy,
                       SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS sxx
                FROM lineitem GROUP BY l_returnflag),
              b AS (
                SELECT l_returnflag, n,
                       (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
                       (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) AS slope,
                       CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd, CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd
                FROM a)
              SELECT l_returnflag, n, slope,
                     (syd - slope * sxd) / n AS intercept
              FROM b ORDER BY l_returnflag""")),

    // Median absolute deviation per event type — the robust dispersion
    // measure outlier gates prefer over stddev (q_zscore_outliers'
    // z-threshold breaks down when the outliers inflate sigma; MAD does
    // not). Two tiny aggregates; the deviation pass streams against the
    // broadcast per-group medians.
    Q("q_mad",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("value").isNotNull)
        val med = e.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        e.join(broadcast(med), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("percentile(abs(value - med), 0.5)").as("mad"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (
                SELECT event_type, quantile_cont(value, 0.5) AS med
                FROM events WHERE value IS NOT NULL GROUP BY event_type)
              SELECT event_type, COUNT(*) AS n,
                     quantile_cont(abs(value - med), 0.5) AS mad
              FROM events JOIN m USING (event_type)
              WHERE value IS NOT NULL
              GROUP BY event_type ORDER BY event_type""")),

    // Pairwise correlation matrix across event types, on daily mean
    // values — the cross-asset correlation panel every finance desk pins
    // next to the OHLC board. Daily means come from exact decimal sums
    // (identical doubles both engines), are re-rounded into DECIMAL(18,6)
    // (the decimal-rounded-term convention: kills div ulp drift before it
    // can compound), and the per-pair moments over the ~30-day series are
    // exact decimal sums again — the day-level series self-joins on day
    // (type_a < type_b), so the pair space is |types|^2 * days, never
    // row-scale.
    Q("q_corr_matrix",
      (s, dir) => {
        val daily = t(s, dir, "events").filter(col("value").isNotNull)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(dec2(col("value"))).cast(DoubleType) / count(lit(1)))
            .cast(DecimalType(18, 6)).as("v"))
        val m = DecimalType(38, 12)
        val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
        daily.as("a").join(daily.as("b"),
            col("a.day") === col("b.day") &&
              col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"),
            col("a.v").as("x"), col("b.v").as("y"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum((col("x") * col("y")).cast(m)).as("sxy"),
            sum((col("x") * col("x")).cast(m)).as("sxx"),
            sum((col("y") * col("y")).cast(m)).as("syy"))
          .select(col("type_a"), col("type_b"), col("n"),
            ((col("n") * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
              (sqrt(col("n") * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
               sqrt(col("n") * d(col("syy")) - d(col("sy")) * d(col("sy")))))
              .as("corr_daily"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                            / COUNT(*) AS DECIMAL(18,6)) AS v
                FROM events WHERE value IS NOT NULL
                GROUP BY event_type, CAST(ts AS DATE)),
              p AS (
                SELECT a.event_type AS type_a, b.event_type AS type_b,
                       a.v AS x, b.v AS y
                FROM daily a JOIN daily b
                  ON a.day = b.day AND a.event_type < b.event_type),
              mo AS (
                SELECT type_a, type_b, COUNT(*) AS n,
                       SUM(x) AS sx, SUM(y) AS sy,
                       SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
                       SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
                       SUM(CAST(y * y AS DECIMAL(38,12))) AS syy
                FROM p GROUP BY type_a, type_b)
              SELECT type_a, type_b, n,
                     (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
                     (sqrt(n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) *
                      sqrt(n * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
                       AS corr_daily
              FROM mo ORDER BY type_a, type_b""")),

    // Lag-1 autocorrelation of event values per type, in (ts, event_id)
    // order — the "is this metric trending or i.i.d." check behind the
    // EWMA/volatility family. One window pass forms the (v, prev) pairs;
    // the correlation runs on exact decimal moments over the 2-decimal
    // values (the q_corr convention).
    Q("q_autocorr",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val x = dec2(col("prev"))
        val y = dec2(col("value"))
        val m = DecimalType(30, 4)
        val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
        t(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("prev", lag(col("value"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum((x * y).cast(m)).as("sxy"),
            sum((x * x).cast(m)).as("sxx"),
            sum((y * y).cast(m)).as("syy"))
          .select(col("event_type"), col("n"),
            ((col("n") * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
              (sqrt(col("n") * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
               sqrt(col("n") * d(col("syy")) - d(col("sy")) * d(col("sy")))))
              .as("autocorr_lag1"))
          .orderBy(col("event_type"))
      },
      Some("""WITH p AS (
                SELECT event_type, value,
                       lag(value) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS prev
                FROM events WHERE value IS NOT NULL),
              a AS (
                SELECT event_type, COUNT(*) AS n,
                       SUM(CAST(prev AS DECIMAL(18,2))) AS sx,
                       SUM(CAST(value AS DECIMAL(18,2))) AS sy,
                       SUM(CAST(CAST(prev AS DECIMAL(18,2))
                           * CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS sxy,
                       SUM(CAST(CAST(prev AS DECIMAL(18,2))
                           * CAST(prev AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS sxx,
                       SUM(CAST(CAST(value AS DECIMAL(18,2))
                           * CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS syy
                FROM p WHERE prev IS NOT NULL GROUP BY event_type)
              SELECT event_type, n,
                     (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
                     (sqrt(n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) *
                      sqrt(n * CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
                       AS autocorr_lag1
              FROM a ORDER BY event_type""")),

    // CUSUM change-point detection per event_type: the classic "where did
    // the level shift" scan. The drift statistic is kept integer-exact —
    // values become cents (round half-up, identical on both engines for
    // 2-decimal inputs), and |i*total - n*cum| is pure BIGINT arithmetic,
    // so the argmax is deterministic with an event_id tiebreak. Plan: one
    // hash shuffle on event_type, two window passes over it, no joins.
    Q("q_cusum_changepoint",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("ts"),
            round(col("value") * 100).cast(LongType).as("cents"))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        val wAll = Window.partitionBy(col("event_type"))
        val st = ev
          .withColumn("i", row_number().over(wOrd).cast(LongType))
          .withColumn("cum", sum(col("cents")).over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("total", sum(col("cents")).over(wAll))
          .withColumn("stat",
            abs(col("i") * col("total") - col("n") * col("cum")))
        val wPick = Window.partitionBy(col("event_type"))
          .orderBy(col("stat").desc, col("event_id").asc)
        st.withColumn("rn", row_number().over(wPick))
          .where(col("rn") === 1)
          .select(col("event_type"), col("event_id").as("cp_event_id"),
            col("ts").as("cp_ts"), col("stat").as("cusum_stat"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type, event_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
              w AS (SELECT event_type, event_id, ts,
                     CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS BIGINT) AS i,
                     CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY event_id) AS BIGINT) AS cum,
                     COUNT(*) OVER (PARTITION BY event_type) AS n,
                     CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT) AS total
              FROM e),
              st AS (SELECT event_type, event_id, ts,
                     abs(i * total - n * cum) AS stat,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY abs(i * total - n * cum) DESC, event_id ASC) AS rn
              FROM w)
              SELECT event_type, event_id AS cp_event_id, ts AS cp_ts,
                     CAST(stat AS BIGINT) AS cusum_stat
              FROM st WHERE rn = 1 ORDER BY event_type"""))
  ,

    // URL canonicalization dedup — the crawl-frontier step BEFORE any
    // content dedup runs: the same page arrives as mixed-case hosts,
    // www-prefixed variants, trailing slashes, and tracking-param
    // permutations; canonicalize (lowercase host, strip www., trim the
    // trailing slash, keep only the id param) and group. The synthesized
    // URL is the fixture (q_url_parse stance) and deliberately collides
    // doc_id % 100 so the dedup has real groups. Pure per-row regex
    // canonicalization (codegen) + one grouped aggregate.
    Q("q_url_dedup",
      (s, dir) => {
        val url = concat(lit("https://WWW."), upper(col("source")),
          lit(".Example.com/d/"), (col("doc_id") % 100).cast(StringType),
          lit("/?utm_source=s"), (col("doc_id") % 3).cast(StringType),
          lit("&id="), (col("doc_id") % 100).cast(StringType),
          lit("&utm_campaign=c"))
        val host = lower(regexp_extract(col("url"), "^https?://([^/]+)", 1))
        val idp = regexp_extract(col("url"), "id=([0-9]+)", 1)
        t(s, dir, "documents")
          .withColumn("url", url)
          .withColumn("canonical",
            concat(regexp_replace(host, "^www\\.", ""),
              expr("trim(TRAILING '/' FROM regexp_extract(url, '^https?://[^/]+([^?]*)', 1))"),
              lit("?id="), idp))
          .groupBy(col("canonical"))
          .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_dups"))
          .orderBy(col("keeper_id"))
      },
      Some("""WITH u AS (SELECT doc_id,
                     'https://WWW.' || upper(source) || '.Example.com/d/' || (doc_id % 100) ||
                       '/?utm_source=s' || (doc_id % 3) || '&id=' || (doc_id % 100) ||
                       '&utm_campaign=c' AS url
              FROM documents),
              c AS (SELECT doc_id,
                     lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS host0,
                     regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path,
                     regexp_extract(url, 'id=([0-9]+)', 1) AS id_param
              FROM u)
              SELECT regexp_replace(host0, '^www\.', '') || rtrim(path, '/')
                       || '?id=' || id_param AS canonical,
                     CAST(min(doc_id) AS BIGINT) AS keeper_id,
                     count(*) AS n_dups
              FROM c GROUP BY 1 ORDER BY keeper_id""")),

    // Rolling median (11-tap) per event_type — the robust sliding
    // smoother an outlier-heavy stream wants where q_window_moving_avg
    // is skew-sensitive. Spark refuses median/percentile over a window
    // FRAME (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame is
    // materialized as 11 lag taps in ONE window pass and the median read
    // off the sorted tap array — semantics identical to DuckDB's framed
    // median. Inputs are cents (integers), so the median is an integer
    // or an exact .5 — bit-identical across engines with no decimal
    // scaffolding. One event_type shuffle, one ordered window.
    Q("q_rolling_median",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        val taps = (0 to 10).map(i => lag(col("cents"), i).over(w))
        val n = size(col("win"))
        t(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .withColumn("win",
            array_sort(filter(array(taps: _*), x => x.isNotNull)))
          .withColumn("med",
            when(n % 2 === 1,
              element_at(col("win"),
                ((n + 1) / 2).cast(IntegerType)).cast(DoubleType))
              .otherwise((element_at(col("win"), (n / 2).cast(IntegerType))
                + element_at(col("win"), (n / 2).cast(IntegerType) + 1))
                / lit(2.0)))
          .select(col("event_type"), col("event_id"), col("med"))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""SELECT event_type, event_id,
                     median(CAST(round(value * 100) AS BIGINT))
                       OVER (PARTITION BY event_type ORDER BY event_id
                             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS med
              FROM events ORDER BY event_type, event_id"""))
  )
}
