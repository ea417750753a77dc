package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable distinct-SET algebra via Theta sketches (DataSketches
  * `theta.Union`/`Intersection`). The HLL pair (q_hll_union) answers only
  * the UNION question — "distinct users across all days". A Theta sketch
  * additionally supports INTERSECTION: "how many users were active in
  * BOTH January and February" from two STORED per-month sketches, without
  * re-reading either month's facts. That set-expression capability over
  * pre-aggregated summaries is the reason warehouses keep theta (not HLL)
  * sketches for audience-overlap queries.
  *
  * Same integration shape as the KLL trio (KllFunctions.scala):
  * `TypedImperativeAggregate` with a live DataSketches object as the
  * partial-aggregation buffer, serialized to the standard compact byte
  * image only at shuffle/storage boundaries.
  *
  * Error model: exact up to the sketch's nominal entries (default
  * k=4096), ~1/sqrt(k) relative standard error above — ThetaSpec pins
  * both the direct estimates and the stored-sketch set algebra against
  * exact counts.
  */
abstract class ThetaAggLike[B] extends TypedImperativeAggregate[B] with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** theta_agg(value): theta sketch of the distinct values of a column
  * (long/int/string). Buffer is a `Union`, which accepts raw updates AND
  * merges — one class covers partial and final aggregation.
  */
case class ThetaAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ThetaAggLike[Union] {

  override def createAggregationBuffer(): Union = SetOperation.builder().buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => b.update(l)
      case i: Int => b.update(i.toLong)
      case s: UTF8String => b.update(s.getBytes)
      case other => throw new IllegalArgumentException(
        s"theta_agg: unsupported input ${other.getClass}")
    }
    b
  }

  override def merge(b: Union, o: Union): Union = { b.union(o.getResult); b }
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes)); u
  }
  override def eval(b: Union): Any = b.getResult.toByteArray

  override def withNewMutableAggBufferOffset(o: Int): ThetaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_agg"
}

/** theta_union_agg(sketch_bytes): union of STORED sketch images. */
case class ThetaUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ThetaAggLike[Union] {

  override def createAggregationBuffer(): Union = SetOperation.builder().buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: Union, o: Union): Union = { b.union(o.getResult); b }
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes)); u
  }
  override def eval(b: Union): Any = b.getResult.toByteArray

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_union_agg"
}

/** theta_intersect_agg(sketch_bytes): intersection of STORED sketch
  * images. A virgin `Intersection` means "universal set" (its result is
  * undefined until the first intersect), so the buffer tracks whether any
  * input arrived: merging a virgin partial buffer must be a no-op, NOT an
  * intersection with the empty set — partial aggregation creates empty
  * buffers for partitions that held no rows of a group.
  */
case class ThetaIntersectAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ThetaAggLike[ThetaIntersectAgg.Buf] {
  import ThetaIntersectAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) b.add(Sketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    if (o.seen) b.add(o.it.getResult)
    b
  }

  override def serialize(b: Buf): Array[Byte] =
    if (!b.seen) Array.emptyByteArray else b.it.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Buf = {
    val b = new Buf
    if (bytes.nonEmpty) b.add(Sketch.heapify(Memory.wrap(bytes)))
    b
  }

  /** Intersection of zero sketches is undefined; surface it as an empty
    * sketch image rather than a null (group keys with a single input
    * period intersect to that period's set, which IS defined).
    */
  override def eval(b: Buf): Any =
    if (!b.seen) SetOperation.builder().buildUnion().getResult.toByteArray
    else b.it.getResult.toByteArray

  override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaIntersectAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_intersect_agg"
}

object ThetaIntersectAgg {
  final class Buf {
    var seen: Boolean = false
    val it: Intersection = SetOperation.builder().buildIntersection()
    def add(sk: Sketch): Unit = { it.intersect(sk); seen = true }
  }
}

/** theta_estimate(sketch_bytes): distinct-count estimate out of a sketch
  * image. Runs on aggregated rows only (one per group), so interpreted
  * evaluation costs group-count, not row-count.
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    Sketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}

object ThetaFunctions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.call_function

  /** Idempotent per-session registration (temp-function fallback for
    * sessions built without GraftExtensions — same builders, can't drift).
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction("theta_agg",
      exprs => ThetaAgg(exprs.head), "built-in")
    fr.createOrReplaceTempFunction("theta_union_agg",
      exprs => ThetaUnionAgg(exprs.head), "built-in")
    fr.createOrReplaceTempFunction("theta_intersect_agg",
      exprs => ThetaIntersectAgg(exprs.head), "built-in")
    fr.createOrReplaceTempFunction("theta_estimate",
      exprs => ThetaEstimate(exprs.head), "built-in")
  }

  def thetaAgg(spark: SparkSession, v: Column): Column = {
    register(spark); call_function("theta_agg", v)
  }
  def thetaUnionAgg(spark: SparkSession, sk: Column): Column = {
    register(spark); call_function("theta_union_agg", sk)
  }
  def thetaIntersectAgg(spark: SparkSession, sk: Column): Column = {
    register(spark); call_function("theta_intersect_agg", sk)
  }
  def thetaEstimate(spark: SparkSession, sk: Column): Column = {
    register(spark); call_function("theta_estimate", sk)
  }
}
