package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable streaming quantiles via the KLL sketch (Karnin, Lang,
  * Liberty, FOCS'16; DataSketches `KllDoublesSketch`) — the warehouse
  * answer to "daily p95s AND an exact-same-machinery total p95 without
  * re-reading the facts". Spark's built-in `approx_percentile` state is
  * not a first-class value: it cannot be stored per day and unioned later
  * (re-aggregation must re-read raw rows). A KLL sketch is: `kll_agg`
  * builds one from raw values, `kll_merge_agg` unions STORED sketches,
  * `kll_quantile` reads any rank out — same rollup algebra as the
  * HLL/DataSketches distinct-count pair (q_hll_union), for quantiles.
  *
  * Integration shape: `TypedImperativeAggregate[KllDoublesSketch]` — the
  * buffer lives as a JVM object inside partial aggregation and serializes
  * to the sketch's standard byte image only at shuffle/storage
  * boundaries, which is exactly how Spark's own `hll_sketch_agg` is
  * built. Rank error for the default k=200 is ~1.65% (99% conf);
  * compaction is randomized, so estimates carry sketch-level (not
  * bitwise) reproducibility — fine for the rollup/monitoring queries
  * this exists for, pinned by KllSpec's rank-error bounds.
  */
abstract class KllAggBase
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  def k: Int

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** kll_agg(value[, k]): KLL sketch of a numeric column. Mixes in the
  * shim for `ExpectsInputTypes(DoubleType)` (private[sql] in Spark 4, see
  * GraftSqlShims) so the analyzer inserts an implicit cast for
  * int/long/float/decimal inputs — without it, a non-double column would
  * reach `update` and ClassCastException at runtime (ADVICE r5). The
  * sketch itself is double-valued, so the cast is the semantics.
  */
case class KllAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase with org.apache.spark.sql.graft.GraftExpectsDouble {

  override def update(b: KllDoublesSketch, input: org.apache.spark.sql.catalyst.InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_agg"
}

/** kll_merge_agg(sketch_bytes[, k]): union of STORED sketch images — the
  * rollup-maintenance side (merge daily sketches, never re-read facts).
  */
case class KllMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase with org.apache.spark.sql.graft.GraftExpectsBinary {

  override def update(b: KllDoublesSketch, input: org.apache.spark.sql.catalyst.InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_merge_agg"
}

/** kll_quantile(sketch_bytes, rank): read one quantile out of a sketch
  * image. Runs on AGGREGATED rows (one per group), never in a per-row hot
  * path, so interpreted evaluation (CodegenFallback) costs nothing
  * measurable — the heapify-per-call is on group-count cardinality.
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback
    with org.apache.spark.sql.graft.GraftExpectsBinaryDouble {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(bytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : KllQuantile = copy(left = l, right = r)
  override def prettyName: String = "kll_quantile"
}

object KllFunctions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.{call_function, lit}

  /** Literal-int k (or default 200), shared by both agg builders. */
  private[functions] def literalK(exprs: Seq[Expression], at: Int): Int =
    if (exprs.length > at) exprs(at) match {
      case Literal(i: Int, _) if i >= 8 => i
      case other => throw new IllegalArgumentException(
        s"kll agg: k must be a literal int >= 8, got $other")
    } else 200

  /** Idempotent per-session registration (temp-function fallback for
    * sessions built without GraftExtensions — same builders, can't drift).
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction("kll_agg",
      exprs => KllAgg(exprs.head, literalK(exprs, 1)), "built-in")
    fr.createOrReplaceTempFunction("kll_merge_agg",
      exprs => KllMergeAgg(exprs.head, literalK(exprs, 1)), "built-in")
    fr.createOrReplaceTempFunction("kll_quantile",
      exprs => KllQuantile(exprs(0), exprs(1)), "built-in")
  }

  def kllAgg(spark: SparkSession, v: Column): Column = {
    register(spark); call_function("kll_agg", v)
  }
  /** Explicit-k form. k >= the group's item count puts the sketch in the
    * EXACT regime: no compaction ever fires, every item is retained at
    * weight 1, and `kll_quantile(sk, r)` returns the smallest item whose
    * inclusive rank >= r — precisely SQL's `min(v) FILTER (cume_dist >= r)`,
    * which is what lets q_kll_union sit on the DuckDB hash gate.
    */
  def kllAgg(spark: SparkSession, v: Column, k: Int): Column = {
    register(spark); call_function("kll_agg", v, lit(k))
  }
  def kllMergeAgg(spark: SparkSession, sk: Column): Column = {
    register(spark); call_function("kll_merge_agg", sk)
  }
  def kllMergeAgg(spark: SparkSession, sk: Column, k: Int): Column = {
    register(spark); call_function("kll_merge_agg", sk, lit(k))
  }
  def kllQuantile(spark: SparkSession, sk: Column, rank: Double): Column = {
    register(spark); call_function("kll_quantile", sk, lit(rank))
  }
}
