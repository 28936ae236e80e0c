package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables

/** X-4 — interval/range join, bucketized (the scale technique for the
  * operator Spark lacks natively: joining points to containing
  * intervals without a nested loop).
  *
  * Naive `a.join(b, ts >= t0 && ts < t1)` plans a
  * BroadcastNestedLoopJoin — O(|events| × |intervals|). Instead, time
  * is bucketed at the maximum interval length (4 h): each event carries
  * its ONE bucket id, each interval explodes into the ≤2 buckets it
  * covers, and the join becomes an EQUI-join on the bucket followed by
  * the exact containment filter. Each event matches a covered interval
  * exactly once (via the event's own bucket), so no dedup pass is
  * needed. At 100 TB the bucket is also a partition key: interval
  * lookups prune to the overlapping partitions.
  *
  * Intervals here: for every user with user_id % 13 == 0, the 4 h
  * observation window starting at their first event (a deterministic,
  * data-derived interval table).
  */
object RangeJoin {

  private val BucketSeconds = 4L * 3600L

  def x4RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val intervals = ev.filter($"user_id" % 13 === 0)
      .groupBy($"user_id").agg(min($"ts").as("t0"))
      .select($"user_id".as("iv_user"), $"t0",
        ($"t0" + expr("INTERVAL 4 HOURS")).as("t1"))
    val evB = ev.select($"event_id", $"ts",
      floor(unix_timestamp($"ts") / BucketSeconds).as("b"))
    val ivB = intervals.select($"iv_user", $"t0", $"t1", explode(
      sequence(floor(unix_timestamp($"t0") / BucketSeconds),
        floor(unix_timestamp($"t1") / BucketSeconds))).as("b"))
    evB.join(ivB, "b")
      .filter($"ts" >= $"t0" && $"ts" < $"t1") // half-open containment
      .groupBy($"iv_user", $"t0")
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"iv_user")
  }

  val oracles: Map[String, String] = Map(
    "x4_range_join" ->
      """WITH iv AS (
           SELECT user_id AS iv_user, min(ts) AS t0,
                  min(ts) + INTERVAL 4 HOUR AS t1
           FROM events WHERE user_id % 13 = 0 GROUP BY 1)
         SELECT iv.iv_user AS iv_user, iv.t0 AS t0, count(*) AS n_events
         FROM events e JOIN iv ON e.ts >= iv.t0 AND e.ts < iv.t1
         GROUP BY 1, 2 ORDER BY iv_user""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x4_range_join" -> x4RangeJoin _,
  )
}
