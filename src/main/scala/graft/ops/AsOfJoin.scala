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
    * @param toleranceMicros max staleness: a match further than this many
    *                      microseconds from leftTs is discarded (asof_*
    *                      come back null, the left row is kept) — the
    *                      pandas merge_asof `tolerance` semantics. Requires
    *                      timestamp-typed ts columns. None = unbounded.
    * @param direction   "backward" (latest right at or before leftTs — the
    *                      default), "forward" (earliest right at or after;
    *                      SMALLEST tie-break wins at equal ts), or
    *                      "nearest" (closer of the two; equidistant ties
    *                      resolve backward) — pandas merge_asof parity.
    *                      All three ride the same single key-shuffle;
    *                      nearest adds a second in-partition sorted pass,
    *                      never a second shuffle.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightValues: Seq[String],
      rightTieBreak: Option[String] = None,
      toleranceMicros: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
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
    // backward: rights sort BEFORE lefts at equal ts (side asc) so the
    // preceding frame sees an equal-ts match; greatest tie-break wins
    // (last in order). forward: lefts sort first (side desc) so the
    // FOLLOWING frame starting at the left row includes equal-ts rights;
    // smallest tie-break wins (first in order).
    val orderB = Seq(col("__ts"), col("__side")) ++
      rightTieBreak.map(_ => col("__tb").asc_nulls_first)
    val orderF = Seq(col("__ts"), col("__side").desc) ++
      rightTieBreak.map(_ => col("__tb").asc_nulls_first)
    val part = Window.partitionBy(keys.map(col): _*)
    val wB = part.orderBy(orderB: _*).rowsBetween(Window.unboundedPreceding, 0)
    val wF = part.orderBy(orderF: _*).rowsBetween(0, Window.unboundedFollowing)
    val carriedB = last(col("__payload"), ignoreNulls = true).over(wB)
    val carriedF = first(col("__payload"), ignoreNulls = true).over(wF)
    val unioned = r.unionByName(l)
    // tolerance: null the whole carried struct when the match is too far
    // on its side's axis — a pure per-row post-map, window passes unchanged
    def bound(c: Column, dist: Column): Column =
      toleranceMicros.fold(c)(tol => when(dist <= tol, c))
    val distB = (c: Column) => unix_micros(col("__ts")) - unix_micros(c("__rts"))
    val distF = (c: Column) => unix_micros(c("__rts")) - unix_micros(col("__ts"))
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("__carried", carriedB).filter(col("__side") === 1)
          .withColumn("__carried", bound(col("__carried"), distB(col("__carried"))))
      case "forward" =>
        unioned.withColumn("__carried", carriedF).filter(col("__side") === 1)
          .withColumn("__carried", bound(col("__carried"), distF(col("__carried"))))
      case "nearest" =>
        unioned
          .withColumn("__cb", carriedB)
          .withColumn("__cf", carriedF)
          .filter(col("__side") === 1)
          .withColumn("__cb", bound(col("__cb"), distB(col("__cb"))))
          .withColumn("__cf", bound(col("__cf"), distF(col("__cf"))))
          .withColumn("__carried",
            when(col("__cf").isNull, col("__cb"))
              .when(col("__cb").isNull, col("__cf"))
              // strict <: equidistant matches resolve backward
              .when(distF(col("__cf")) < distB(col("__cb")), col("__cf"))
              .otherwise(col("__cb")))
      case other =>
        throw new IllegalArgumentException(
          s"direction must be backward|forward|nearest, got $other")
    }
    carried.select(leftCols.toIndexedSeq.map(col) ++
      rightValues.map(c => col(s"__carried.$c").as(s"asof_$c")): _*)
  }
}
