package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.Tables

/** Skew-handling utilities (builder brief: "skewed keys → salting or AQE
  * skew-join"). AQE rebalances sort-merge skew automatically; these cover
  * the aggregation side, where one hot key would otherwise pin a single
  * reducer at 100 TB.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) computes partial
    * aggregates across `saltBuckets` reducers, then a tiny second pass
    * merges per-key. Algebraic aggregates only (sum/count/min/max — the
    * decomposable ones). The salt is a hash of the whole row's random-ish
    * columns, not rand(): deterministic, so retried tasks produce identical
    * results (a rand() salt breaks exactly-once on retry).
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column, saltBuckets: Int,
      saltSource: Column): (DataFrame, DataFrame) = {
    val salted = df.groupBy(key.as("k"), (pmod(xxhash64(saltSource), lit(saltBuckets))).as("salt"))
      .agg(count(lit(1)).as("pc"), sum(value).as("ps"),
        min(value).as("pmin"), max(value).as("pmax"))
    val merged = salted.groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"),
        min(col("pmin")).as("vmin"), max(col("pmax")).as("vmax"))
    (salted, merged)
  }

  /** Salted equi-join for skewed fact keys: the fact side gets a
    * deterministic salt in [0, saltBuckets); the dim side is replicated
    * across ALL salt values (explode of a literal sequence — dim rows ×
    * saltBuckets, fine for dims, never for facts); the join runs on
    * (key, salt), spreading each hot key over saltBuckets reducers.
    * Same results as the unsalted join by construction. AQE's skew-join
    * split covers sort-merge; this is the explicit form that also works
    * for hash joins, pre-AQE engines, and deliberate partition control.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltBuckets: Int, saltSource: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltBuckets)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  // The salted two-phase aggregation under the hard gate: its oracle is
  // the PLAIN single-phase GROUP BY — salting must be invisible in the
  // result. events.event_type has 5 values over 100k+ rows, exactly the
  // hot-key shape the salt exists for. Decimal-exact value aggregation
  // keeps the double sums order-independent across both plans and engines.
  val queries: Seq[Q] = Seq(
    // Salted join under the gate: oracle is the plain equi-join — the
    // salt must be invisible in the result here too.
    Q("q_salted_join",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        // merge hint: at test scale Catalyst would broadcast the dim and
        // silently skip the salted shuffle this operator exists for —
        // salting only matters when BOTH sides shuffle (the real
        // too-big-to-broadcast case), so force the sort-merge path here
        val customer = Tables.load(s, dir, "customer").hint("merge")
        saltedJoin(events, customer, "user_id", "c_custkey",
            saltBuckets = 8, saltSource = col("event_id"))
          .select(col("event_id"), col("user_id"), col("c_name"),
            col("event_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, c_name, event_type
              FROM events JOIN customer ON user_id = c_custkey
              ORDER BY event_id""")),

    Q("q_salted_agg",
      (s, dir) => {
        val (_, merged) = saltedAgg(Tables.load(s, dir, "events"),
          col("event_type"), dec2(col("value")),
          saltBuckets = 16, saltSource = col("event_id"))
        merged.select(col("k").as("event_type"), col("n"),
            col("total").cast(DoubleType).as("total"),
            col("vmin").cast(DoubleType).as("vmin"),
            col("vmax").cast(DoubleType).as("vmax"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
                     CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vmin,
                     CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vmax
              FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
