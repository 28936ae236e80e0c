package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet readers for the driver testdata star schema (TESTDATA.md).
  *
  * Mirrors the reference's zone readers (clean/curated Delta reads,
  * reference `elt/prescriptive/prescriptive_logic.py:39-50`) as plain
  * columnar scans: Catalyst pushes predicates and prunes columns into
  * the parquet scan, which is the scale path for 100 TB — never
  * materialize then filter like the reference's `.to_pandas()`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver's events.parquet stores `ts` as INT64 TIMESTAMP(NANOS),
    * which vanilla Spark refuses ([PARQUET_TYPE_ILLEGAL]). We read nanos
    * as long (legacy conf) and convert to TimestampType (micros) — the
    * same tz-normalization step the reference performs on every read
    * (`prescriptive_logic.py:43-46`). Conversion is a pure projection:
    * pushdown/pruning on other columns is unaffected.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view so spark.sql queries (scalar
    * subqueries, view layering) can reference them by name — the same
    * names the DuckDB oracle uses. Memoized on the CURRENT dir per
    * session (not a seen-set): alternating dirs within one session
    * re-registers, so the views always point at the requested dir.
    * The memo is recorded only AFTER all views registered successfully,
    * under a lock — a partial failure or a concurrent caller with a
    * different dir can never leave the memo claiming views it didn't
    * finish creating (round-2 advice). */
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  def registerViews(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != dir) {
        names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
      }
    }

  /** Streaming reader for the events table — the single home of the
    * TIMESTAMP(NANOS) policy on the streaming path (schema reads ts as
    * long, converted to TimestampType in the first projection). */
  val eventsStreamSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", LongType),
      org.apache.spark.sql.types.StructField("ts", LongType),
      org.apache.spark.sql.types.StructField("user_id", LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))

  val documentsStreamSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", LongType)))

  /** Documents as a file-source stream (the ingest feed a curation
    * pipeline consumes) — same drained-replay protocol as
    * [[eventsStream]]. */
  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsStreamSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)

  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsStreamSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
