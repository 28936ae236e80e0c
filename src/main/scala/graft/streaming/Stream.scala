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

  def st1StreamHourly(s: SparkSession, dir: String): DataFrame = {
    val name = "st1_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = graft.io.Tables.eventsStream(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      // cents policy: exact integer sum, immune to partition-order
      // reassociation (same rule as every batch money sum)
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("bigint")).as("sum_value_c"))
    val q = stream.writeStream
      .outputMode("complete").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    s.table(name)
      .select($"w.start".as("wstart"), $"event_type", $"n", $"sum_value_c")
      .orderBy($"wstart", $"event_type")
  }

  val oracles: Map[String, String] = Map(
    "st1_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS wstart, event_type,
                count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_stream_hourly" -> st1StreamHourly _,
  )
}
