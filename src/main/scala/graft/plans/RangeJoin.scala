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

  /** X-5 — interval × interval OVERLAP join, bucketized (x4 joins
    * points to intervals; this joins two interval tables — the other
    * range-join Spark plans as a nested loop).
    *
    * Both interval tables are data-derived and deterministic: A = every
    * 25th customer's first-2-years order window, B = every 7th
    * customer's last-2-years window. Time is bucketed at the maximum
    * interval length (2 years), so every interval covers ≤ 2 buckets;
    * candidates come from an EQUI-join on the bucket. Overlapping
    * intervals can share TWO buckets, so instead of a distinct pass the
    * pair is emitted only in the FIRST shared bucket
    * (`greatest(start-bucket A, start-bucket B)` — contiguous bucket
    * ranges that overlap always contain it) — dedup-free, no extra
    * shuffle. Overlap length is integer days (midnight-aligned input),
    * keeping the gate bit-exact. */
  def x5IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val B = 2L * 366L * 86400L // bucket = max interval length, seconds
    val o = Tables.orders(s, dir)
    val a = o.filter($"o_custkey" % 25 === 0).groupBy($"o_custkey").agg(min($"o_orderdate").as("t0"))
      .select($"o_custkey".as("cust_a"), $"t0",
        ($"t0" + expr("INTERVAL 2 YEARS")).as("t1"))
    val b = o.filter($"o_custkey" % 7 === 0).groupBy($"o_custkey").agg(max($"o_orderdate").as("u1"))
      .select($"o_custkey".as("cust_b"), ($"u1" - expr("INTERVAL 2 YEARS")).as("u0"), $"u1")
    def buckets(t0: org.apache.spark.sql.Column, t1: org.apache.spark.sql.Column) =
      sequence(floor(unix_timestamp(t0) / B), floor(unix_timestamp(t1) / B))
    val aB = a.select($"cust_a", $"t0", $"t1", explode(buckets($"t0", $"t1")).as("bk"))
    val bB = b.select($"cust_b", $"u0", $"u1", explode(buckets($"u0", $"u1")).as("bk"))
    aB.join(bB, "bk")
      .filter($"t0" < $"u1" && $"u0" < $"t1")
      .filter($"bk" === greatest(floor(unix_timestamp($"t0") / B),
        floor(unix_timestamp($"u0") / B)))
      .select($"cust_a", $"cust_b",
        datediff(least($"t1", $"u1"), greatest($"t0", $"u0")).as("overlap_days"))
      .orderBy($"cust_a", $"cust_b")
  }

  val oracles: Map[String, String] = Map(
    "x5_interval_overlap" ->
      """WITH a AS (
           SELECT o_custkey AS cust_a, min(o_orderdate) AS t0,
                  min(o_orderdate) + INTERVAL 2 YEAR AS t1
           FROM orders WHERE o_custkey % 25 = 0 GROUP BY 1),
         b AS (
           SELECT o_custkey AS cust_b, max(o_orderdate) - INTERVAL 2 YEAR AS u0,
                  max(o_orderdate) AS u1
           FROM orders WHERE o_custkey % 7 = 0 GROUP BY 1)
         SELECT a.cust_a AS cust_a, b.cust_b AS cust_b,
                CAST(date_diff('day', greatest(a.t0, b.u0), least(a.t1, b.u1)) AS INT)
                  AS overlap_days
         FROM a JOIN b ON a.t0 < b.u1 AND b.u0 < a.t1
         ORDER BY cust_a, cust_b""",
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
    "x5_interval_overlap" -> x5IntervalOverlap _,
  )
}
