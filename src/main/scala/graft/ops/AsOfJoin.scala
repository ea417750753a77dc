package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic as-of join: for each left row, the latest right row with
  * rightTs <= leftTs within the same key — the natural join of the
  * reference's two streams ("latest quote at or before each article",
  * SURVEY.md §2.2 "as-of join").
  *
  * Implemented with the scalable union+window plan rather than a range
  * join: both sides are unioned, shuffled ONCE on the key, sorted within
  * partition by (ts, side), and the right side's payload is carried
  * forward with last(ignoreNulls) — O(1) window state per key, no
  * (left x earlier-rights) pair explosion. This shape survives 100 TB;
  * tolerance-bounded variants can post-filter on the carried timestamp.
  */
object AsOfJoin {

  /** @param left        probe side (one output row per left row)
    * @param right       reference side whose latest-at-or-before row is attached
    * @param keys        equi-key column names present on both sides
    * @param leftTs      event-time column on `left`
    * @param rightTs     event-time column on `right`
    * @param rightValues right payload columns to attach (as `asof_<name>`)
    * @param rightTieBreak right column ordering rows that share (key, ts):
    *                      the greatest wins; None if right timestamps are
    *                      unique per key
    * @param toleranceMicros max staleness: a match older than this many
    *                      microseconds before leftTs is discarded (asof_*
    *                      come back null, the left row is kept) — the
    *                      pandas merge_asof `tolerance` semantics. Requires
    *                      timestamp-typed ts columns. None = unbounded.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightValues: Seq[String],
      rightTieBreak: Option[String] = None,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    // The payload is carried as ONE struct, not per-column: carrying each
    // column with its own last(ignoreNulls) would tear values from
    // DIFFERENT right rows whenever a payload field is null (a null
    // field must ride along with its row, exactly like the native
    // AsOfJoinExec carries the matched row atomically). The right ts
    // rides inside the struct for the same reason — the tolerance check
    // must see the ts of the row whose values were carried.
    // side 0 = right (sorts first at equal ts => "<=" semantics), 1 = left
    val payload = struct(col(rightTs).as("__rts") +: rightValues.map(col): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          payload.as("__payload")) ++
        rightTieBreak.map(c => col(c).as("__tb")).toSeq ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).as("__payload")) ++
        rightTieBreak.map(_ => lit(null).as("__tb")).toSeq ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val order = Seq(col("__ts"), col("__side")) ++
      rightTieBreak.map(_ => col("__tb").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = r.unionByName(l)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance: null the whole carried struct when the match is stale —
    // a pure per-row post-filter, the window pass is unchanged
    val bounded = toleranceMicros.fold(carried) { tol =>
      carried.withColumn("__carried",
        when(unix_micros(col("__ts")) - unix_micros(col("__carried.__rts")) <= tol,
          col("__carried")))
    }
    bounded.select(leftCols.toIndexedSeq.map(col) ++
      rightValues.map(c => col(s"__carried.$c").as(s"asof_$c")): _*)
  }
}
