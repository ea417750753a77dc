package graft

import org.apache.spark.sql.types._

/** Whole-inventory output-schema hygiene, the companion sweep to
  * PlanHygieneSpec: every declared query's RESULT schema (resolved at
  * sf0.001 — schemas don't depend on SF) is swept for the type shapes
  * that break the driver's cross-engine compare:
  *
  *  - DecimalType anywhere: the round-5 `q_merge_upsert` red row — the
  *    driver's hash path diverges on decimal cells even when values
  *    match the oracle bit-for-bit (adjudicated in VERDICT r5). The
  *    repo convention is "exact arithmetic inside, CAST AS DOUBLE at
  *    the output boundary"; this spec makes the convention enforceable.
  *    Applies to ALL queries (oracled or not) — no reason to ever emit
  *    decimal from a declared query.
  *
  *  - Array/Map/Struct in ORACLED outputs: the pandas-side compare
  *    flattens cells to scalars (documented at ops/Relational2.scala
  *    near q_hof_fns — complex results are serialized to JSON strings
  *    before output). Spec-only queries may keep complex columns (their
  *    consumers are ScalaTest asserts, not the DuckDB hash).
  */
class SchemaHygieneSpec extends SparkSpec {

  private def complexOffenders(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** existsRecursively is private[spark]; re-derive it. */
  private def containsDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case ArrayType(et, _) => containsDecimal(et)
    case MapType(kt, vt, _) => containsDecimal(kt) || containsDecimal(vt)
    case StructType(fields) => fields.exists(f => containsDecimal(f.dataType))
    case _ => false
  }

  private lazy val schemas: Seq[(String, StructType)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf0001).schema
    }

  test("no declared query emits a DecimalType column") {
    val offenders = schemas.flatMap { case (name, schema) =>
      val bad = schema.fields.filter(f => containsDecimal(f.dataType))
      if (bad.nonEmpty) Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
      else None
    }
    assert(offenders.isEmpty,
      "decimal output breaks the driver's cross-engine hash (cast to DOUBLE at the boundary):\n" +
        offenders.mkString("\n"))
  }

  test("no oracled query emits an array/map/struct column") {
    val oracled = SparkEntry.oracleSql.keySet
    val offenders = schemas.filter(s => oracled(s._1)).flatMap { case (name, schema) =>
      val bad = schema.fields.filter(f => complexOffenders(f.dataType))
      if (bad.nonEmpty) Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
      else None
    }
    assert(offenders.isEmpty,
      "complex-typed cells don't survive the pandas compare (serialize to JSON strings):\n" +
        offenders.mkString("\n"))
  }
}
