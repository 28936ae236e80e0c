package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O-2 — JDBC table scan (ref `ingestion/sql/sql_to_raw.py:32-41`:
  * `SELECT * FROM "Aktivitas"."<t>"` full pulls with a skip-if-empty
  * guard). Zero-egress environment: there is no database to connect to,
  * so this is the complete, compilable code path minus a live endpoint;
  * the guard + schema behaviors are covered by the rest of the suite.
  *
  * Scale notes baked into the defaults: partitioned reads (numPartitions
  * + partitionColumn bounds) so a big table scan parallelizes across
  * executors instead of one JDBC cursor; fetchsize tuned above the
  * driver default of 10 rows.
  */
object JdbcSource {

  def read(
      spark: SparkSession,
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", "10000")
    val reader = partitionColumn match {
      case Some((col, lower, upper, n)) => base
        .option("partitionColumn", col)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
      case None => base
    }
    reader.load()
  }

  /** The reference's skip-if-empty guard (`sql_to_raw.py:39-41`):
    * isEmpty is a limit-1 probe, not a count. */
  def nonEmpty(df: DataFrame): Option[DataFrame] =
    if (df.isEmpty) None else Some(df)
}
