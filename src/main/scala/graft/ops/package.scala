package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

package object ops {

  /** One declared engine query: a Spark DataFrame program plus (when the
    * semantics are SQL-expressible) an equivalent DuckDB oracle SQL. The
    * driver hash-compares the two on sf0.01 (SURVEY.md §5.2).
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Deterministic-aggregation helpers.
    *
    * Summing doubles is order-dependent, and Spark's partial aggregation
    * order differs from DuckDB's sequential scan (SURVEY.md §7.4). Casting
    * to decimal BEFORE aggregating makes the sum exact and therefore
    * order-independent; casting the exact result back to double yields a
    * bit-identical value on both engines. Oracle side mirrors with
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  val D2: DecimalType = DecimalType(18, 2)
  def dec2(c: Column): Column = c.cast(D2)
  /** Exact sum of a 2-decimal quantity, returned as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** Exact mean: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(c)

  def table(name: String)(implicit spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Add `AS MATERIALIZED` to every CTE of an oracle SQL. DuckDB inlines
    * CTEs per reference, so an oracle whose shared pass feeds several
    * downstream legs (a sweep's depth filters, a dedup's pair self-join)
    * re-runs that pass once PER LEG — measured 2-17× on the affected
    * oracles (q_ivf_recall 10.0 → 0.6 s). Applied selectively to oracles
    * where the rewrite was verified result-identical; the regex targets
    * the `name AS (` definition form only (aliases are `(...) AS name`,
    * inline windows are `OVER (`). Two constructs the regex WOULD
    * corrupt are guarded against instead of assumed absent: a named
    * `WINDOW win AS (...)` clause (used elsewhere in this repo) and a
    * `WITH RECURSIVE` member — neither can carry the MATERIALIZED hint,
    * so a future oracle passing one through here must fail loudly at
    * query-declaration time, not ship a broken oracle.
    */
  def matCtes(sql: String): String = {
    require(!sql.contains("WINDOW"),
      "matCtes would rewrite a named WINDOW clause into invalid SQL")
    require(!sql.contains("RECURSIVE"),
      "matCtes cannot hint a recursive CTE member")
    sql.replaceAll("\\b(\\w+) AS \\(", "$1 AS MATERIALIZED (")
  }
}
