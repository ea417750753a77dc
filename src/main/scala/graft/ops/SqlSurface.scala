package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Spark 4 SQL-surface operators: recursive CTEs, VARIANT semi-structured
  * access, case-insensitive collation joins, ordered string aggregation
  * (LISTAGG), and correlated LATERAL subqueries.
  *
  * These close the gap between "an engine with operators" and "an engine a
  * SQL user can actually migrate to": the reference's consumers query its
  * lake through SQL (Athena — README.md:21-24, terraform/glue.tf), so the
  * analytical SQL surface is part of the product, not garnish.
  *
  * Scale notes:
  *  - the recursive CTE iterates a JOIN per level; each level is a normal
  *    shuffled/broadcast join, so depth-D traversal is D bounded jobs, not
  *    a driver loop over collected rows;
  *  - VARIANT extraction is a codegen expression over the string bytes —
  *    no UDF, no reparse per field when paths are pushed into one pass;
  *  - the collation join keys stay strings end-to-end (no lower() copy of
  *    the corpus materialized);
  *  - LISTAGG is bounded by construction here (group sizes are dimension-
  *    sized); an unbounded LISTAGG over a fact table would be the same
  *    anti-pattern as collect_list at scale and is deliberately absent.
  */
object SqlSurface {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Seq[Q] = Seq(

    // Recursive CTE: variable-depth traversal of the implicit binary tree
    // parent(c) = c DIV 2 over customers, rooted at custkey 0 (keys are
    // 0-based here; the c <> 0 guard breaks the 0 DIV 2 = 0 self-loop —
    // WarehouseSpec pins that the tree spans every customer, so a key
    // range that left the seed empty would fail the suite, not silently
    // return an empty-but-hash-equal result). Each
    // recursion level is one join of the frontier against the (broadcast-
    // able) customer dim — the iterative-join pattern any hierarchy /
    // bill-of-materials query needs. Aggregated per depth so the output is
    // small and orderable.
    Q("q_recursive_cte",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer_rcte_v")
        s.sql("""WITH RECURSIVE tree AS (
                   SELECT c_custkey, 0 AS depth FROM customer_rcte_v
                   WHERE c_custkey = 0
                   UNION ALL
                   SELECT c.c_custkey, tree.depth + 1
                   FROM customer_rcte_v c JOIN tree
                     ON c.c_custkey DIV 2 = tree.c_custkey
                   WHERE c.c_custkey <> 0
                 )
                 SELECT depth, COUNT(*) AS n,
                        MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
                 FROM tree GROUP BY depth ORDER BY depth""")
      },
      Some("""WITH RECURSIVE tree AS (
                SELECT c_custkey, 0 AS depth FROM customer
                WHERE c_custkey = 0
                UNION ALL
                SELECT c.c_custkey, tree.depth + 1
                FROM customer c JOIN tree ON c.c_custkey // 2 = tree.c_custkey
                WHERE c.c_custkey <> 0
              )
              SELECT depth, COUNT(*) AS n,
                     MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
              FROM tree GROUP BY depth ORDER BY depth""")),

    // VARIANT: parse the event props JSON once into Spark 4's binary
    // semi-structured type, extract a typed path, and aggregate on it.
    // The oracle reads the same path with DuckDB's JSON functions — the
    // VALUES must agree even though the storage representation (VARIANT
    // bytes vs JSON text) is engine-private.
    Q("q_variant_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            variant_get(parse_json(col("props")), "$.k", "int").as("k"),
            col("value"))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("k_mod")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM events
              GROUP BY k_mod ORDER BY k_mod""")),

    // Collation join: mixed-case event types (synthesized deterministically
    // from event_id parity) joined to the canonical lowercase dimension
    // under UTF8_LCASE equality. Oracle lowers explicitly (same semantics
    // for ASCII keys). Scale note: Spark 4.1 sort-merges collated keys
    // (no hash/broadcast join support yet — plan-pinned in PlanShapeSpec),
    // so for a HOT fact-side join key prefer lower() normalization; the
    // collated form is the right surface for correctness-sensitive
    // comparisons and dimension-sized joins.
    Q("q_collation_join",
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("et_mixed",
            when(col("event_id") % 2 === 0, upper(col("event_type")))
              .otherwise(col("event_type")))
        val dim = t(s, dir, "events")
          .select(col("event_type").as("et")).distinct()
        e.join(broadcast(dim),
            collate(col("et_mixed"), "UTF8_LCASE") === collate(col("et"), "UTF8_LCASE"))
          .groupBy(col("et"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("et"))
      },
      Some("""WITH e AS (
                SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                            ELSE event_type END AS et_mixed
                FROM events),
              dim AS (SELECT DISTINCT event_type AS et FROM events)
              SELECT et, COUNT(*) AS n
              FROM e JOIN dim ON lower(e.et_mixed) = lower(dim.et)
              GROUP BY et ORDER BY et""")),

    // LISTAGG WITHIN GROUP: ordered CSV of supplier names per nation.
    // Group sizes are dimension-bounded (suppliers per nation), which is
    // the only regime where ordered string aggregation is scale-sane.
    Q("q_listagg",
      (s, dir) => {
        t(s, dir, "supplier").createOrReplaceTempView("supplier_la_v")
        t(s, dir, "nation").createOrReplaceTempView("nation_la_v")
        s.sql("""SELECT n_name,
                        listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)
                          AS suppliers
                 FROM supplier_la_v JOIN nation_la_v ON s_nationkey = n_nationkey
                 GROUP BY n_name ORDER BY n_name""")
      },
      Some("""SELECT n_name,
                     string_agg(s_name, ',' ORDER BY s_name) AS suppliers
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // Correlated LATERAL subquery: for every region, its first two nations
    // by name — the SQL spelling of per-group top-k. Spark decorrelates
    // the LATERAL into a ranked window, so the plan is the same
    // shuffle-once shape as q_topk_per_group, not a per-row re-scan.
    Q("q_lateral_topn",
      (s, dir) => {
        t(s, dir, "region").createOrReplaceTempView("region_lat_v")
        t(s, dir, "nation").createOrReplaceTempView("nation_lat_v")
        s.sql("""SELECT r_name, ln.n_name
                 FROM region_lat_v,
                      LATERAL (SELECT n_name FROM nation_lat_v
                               WHERE n_regionkey = r_regionkey
                               ORDER BY n_name LIMIT 2) AS ln
                 ORDER BY r_name, n_name""")
      },
      Some("""SELECT r_name, ln.n_name
              FROM region,
                   LATERAL (SELECT n_name FROM nation
                            WHERE n_regionkey = r_regionkey
                            ORDER BY n_name LIMIT 2) AS ln
              ORDER BY r_name, n_name"""))
  )

  /** The WHOLE curation pipeline as plain SQL — the migration surface
    * for an Athena/SQL user (the reference's consumers query through SQL,
    * README.md:21-24): quality gate (`linear_text_score`, injected by
    * GraftExtensions and registered here as a temp-function fallback for
    * plain sessions) → PII scrub (3 typed regexp redactions) → exact
    * dedup (one content-keyed window) → per-source token funnel — the
    * exact semantics of q_curation_pipeline, expressed as one SQL string
    * over the `documents` view. SqlCatalogSpec pins the view result
    * equal to the declared DataFrame query, so the two surfaces cannot
    * drift.
    */
  val curationPipelineSql: String =
    """WITH p AS (
         SELECT doc_id,
                concat('s', CAST(doc_id % 4 AS STRING)) AS src,
                linear_text_score(text) AS score_int,
                regexp_replace(regexp_replace(regexp_replace(
                  concat(
                    CASE WHEN doc_id % 3 = 0
                         THEN concat('contact user', CAST(doc_id AS STRING), '@example.com ')
                         ELSE '' END,
                    CASE WHEN doc_id % 5 = 0
                         THEN concat('call 555-', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-4321 ')
                         ELSE '' END,
                    CASE WHEN doc_id % 7 = 0
                         THEN concat('from 10.0.', CAST(doc_id % 256 AS STRING), '.', CAST(doc_id % 100 AS STRING), ' ')
                         ELSE '' END,
                    text),
                  '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '[EMAIL]'),
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]'),
                  '\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]') AS scrubbed
         FROM documents),
       r AS (
         SELECT doc_id, src, score_int, scrubbed,
                row_number() OVER (
                  PARTITION BY md5(CAST(scrubbed AS BINARY))
                  ORDER BY CASE WHEN score_int > 0 THEN 0 ELSE 1 END, doc_id) AS rn
         FROM p)
       SELECT src,
              count(1) AS docs_in,
              sum(CASE WHEN score_int > 0 THEN 1L ELSE 0L END) AS kept_quality,
              sum(CASE WHEN score_int > 0 AND rn = 1 THEN 1L ELSE 0L END) AS kept_unique,
              sum(CASE WHEN score_int > 0 AND rn = 1
                       THEN CAST(size(split(scrubbed, ' ')) AS BIGINT) ELSE 0L END) AS total_tokens
       FROM r GROUP BY src ORDER BY src"""

  /** Registers the `curation_funnel` temp view (and the
    * `linear_text_score` temp-function fallback so plain sessions work)
    * over an already-registered `documents` view — after this,
    * `SELECT * FROM curation_funnel` runs the whole
    * gate→scrub→dedup→funnel pipeline in SQL.
    */
  def registerCurationView(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "linear_text_score",
      exprs => {
        require(exprs.length == 1,
          s"linear_text_score takes 1 argument, got ${exprs.length}")
        graft.functions.LinearTextScore(exprs.head)
      }, "built-in")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW curation_funnel AS $curationPipelineSql")
  }
}
