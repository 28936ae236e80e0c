package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Queries
import graft.io.Tables

/** SQL twin gate for the analytic dashboard surface (round-8 verdict
  * task 2): the reference's user-facing query surface IS SQL (the 20
  * Metabase cards), so a user must be able to TYPE SQL at this engine
  * and get the DataFrame semantics. For every dashboard entry q1–q17,
  * run `spark.sql(Queries.sparkSql(name))` over the registered zone
  * views and require bag-equality with the DataFrame form — same rows,
  * same schema, order ignored (the driver's gate hashes column-sorted
  * rows, so bag-equality is the matching contract).
  */
class SqlTwinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  Queries.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name: spark.sql(text) ≡ DataFrame form") {
      Tables.registerViews(spark, sf)
      val df = Queries.queries(name)(spark, sf)
      val sql = spark.sql(Queries.sparkSql(name))
      assert(sql.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"schema mismatch:\nsql=${sql.schema.treeString}\ndf=${df.schema.treeString}")
      val (nSql, nDf) = (sql.count(), df.count())
      assert(nSql == nDf, s"row count: sql=$nSql df=$nDf")
      assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty,
        s"value mismatch between SQL text and DataFrame for $name")
    }
  }
}
