package graft

import org.apache.spark.sql.functions._

class SqlCatalogSpec extends SparkSpec {

  test("registerAll exposes every table to spark.sql by name") {
    Tables.registerAll(spark, sf0001)
    val n = spark.sql(
      """SELECT n_name, count(*) AS cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""").count()
    assert(n == 25)
    assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) == 500)
    // events goes through the nanos-normalizing loader
    assert(spark.sql("SELECT min(ts) FROM events").schema.head.dataType.typeName
      .startsWith("timestamp"))
  }

  test("declared query names are unique and every oracle has a query") {
    // SparkEntry.queries is a Map built from the module Seqs — a duplicate
    // name would silently shadow an earlier query and shrink the gate
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("curation pipeline SQL view == the declared DataFrame query") {
    Tables.registerAll(spark, sf001)
    ops.SqlSurface.registerCurationView(spark)
    val viaSql = spark.sql("SELECT * FROM curation_funnel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val declared = SparkEntry.queries("q_curation_pipeline")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(viaSql == declared,
      s"SQL surface drifted from the declared pipeline:\n$viaSql\nvs\n$declared")
  }
}
