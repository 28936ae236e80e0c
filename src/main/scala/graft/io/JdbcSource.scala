package graft.io

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** O-2 — JDBC table scan (ref `ingestion/sql/sql_to_raw.py:32-41`:
  * `SELECT * FROM "Aktivitas"."<t>"` full pulls with a skip-if-empty
  * guard).
  *
  * Scale notes baked into the defaults: partitioned reads (numPartitions
  * + partitionColumn bounds) so a big table scan parallelizes across
  * executors instead of one JDBC cursor; fetchsize tuned above the
  * driver default of 10 rows.
  *
  * Zero-egress environment, but /opt/spark/jars ships Derby 10.16 — so
  * the runnable path is an IN-PROCESS embedded-Derby round-trip
  * ([[o2JdbcRoundtrip]]): write a dim table through Spark's JDBC writer,
  * read it back through [[read]]'s partitioned path, apply the
  * [[nonEmpty]] guard. Same code path a networked Postgres would use —
  * only the URL differs.
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

  /** O-2 runnable: nation → embedded Derby → partitioned JDBC read-back
    * (4 range partitions on the key) → empty guard → oracle-comparable
    * projection. The temp DB dir uses the graft_pipeline_ prefix so the
    * age-gated tmp sweep reclaims it. */
  def o2JdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = Files.createTempDirectory("graft_pipeline_derby_")
    // keep derby.log out of the CWD (Derby writes it wherever user.dir is)
    System.setProperty("derby.stream.error.file",
      work.resolve("derby.log").toString)
    val url = s"jdbc:derby:${work.resolve("db")};create=true"
    Tables.nation(s, dir).write.format("jdbc")
      .option("url", url)
      .option("dbtable", "nation_rt")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode(SaveMode.Overwrite).save()
    val back = read(s, url, "nation_rt", user = "", password = "",
      partitionColumn = Some(("n_nationkey", 0L, 24L, 4)))
    nonEmpty(back) match {
      case None => s.emptyDataFrame // ref guard: skip an empty source table
      case Some(df) => df
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }
  }

  val oracles: Map[String, String] = Map(
    "o2_jdbc_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation ORDER BY n_nationkey""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o2_jdbc_roundtrip" -> o2JdbcRoundtrip _,
  )
}
