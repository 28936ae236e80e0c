package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.syntax._

/** Structured Streaming variant of the ingest→clean→aggregate hop
  * (SURVEY.md §7.2 item 7): the reference's cron micro-batches
  * (`dags/hygiene_dag.py:18,53`) become a file-source stream with
  * `Trigger.AvailableNow` — same code path a live stream would use,
  * drained synchronously over the existing parquet.
  *
  * The aggregation is a tumbling event-time window (hourly) in complete
  * mode; with a live unbounded source the same plan runs in append mode
  * with `withWatermark("ts", ...)` — noted rather than used because the
  * batch-replay drain would drop the final window under a watermark.
  */
object Stream {

  /** events.parquet carries INT64 TIMESTAMP(NANOS): the stream schema
    * reads it as long (matching Tables' legacy-nanos policy) and
    * converts to TimestampType in the first select. */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def st1StreamHourly(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = "st1_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // file stream source requires a directory: read the sf dir with a
    // glob restricting to the events table
    val stream = s.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select($"event_id", timestamp_micros(expr("ts div 1000")).as("ts"),
        $"event_type", $"value")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    s.table(name)
      .select($"w.start".as("wstart"), $"event_type", $"n", $"sum_value")
      .orderBy($"wstart", $"event_type")
  }

  val oracles: Map[String, String] = Map(
    "st1_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS wstart, event_type,
                count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_stream_hourly" -> st1StreamHourly _,
  )
}
