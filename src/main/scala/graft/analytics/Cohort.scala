package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables

/** Cohort / frequency / window-dedup operators closing out the
  * SURVEY §7.2 item-8 list (`dropDuplicates`/window-dedup) plus the
  * product-analytics staples.
  */
object Cohort {

  /** Q-27 — cohort retention: users bucketed by first-seen week, counted
    * by weeks-since-cohort activity. Two aggregations: first-touch per
    * user (one shuffle on user), then the cohort matrix (one shuffle on
    * the matrix key). */
  def q27CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select($"user_id", $"ts")
    val firstTouch = ev.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_week"))
    ev.join(firstTouch, "user_id")
      .select($"user_id", $"cohort_week",
        (datediff(date_trunc("week", $"ts"), $"cohort_week") / 7).cast("int").as("week_n"))
      .distinct()
      .groupBy($"cohort_week", $"week_n")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_week", $"week_n")
  }

  /** T-6 — top-k terms per language (k=3): the top-k-per-group shape
    * (rank window over grouped counts). Deterministic tiebreak: count
    * desc, then token asc. */
  def t6TopTerms(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select($"lang", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"tok")
    counts.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"lang", $"rank", $"tok", $"n")
      .orderBy($"lang", $"rank")
  }

  /** D-7 — window-dedup: keep the first event per (user, type) within
    * each hour (micro-batch replays produce duplicates; at-least-once
    * sinks need exactly this). One shuffle on the dedup key. */
  def d7WindowDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy($"user_id", $"event_type", date_trunc("hour", $"ts"))
      .orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .agg(count(lit(1)).as("n_kept"),
        sum(round($"value" * 100).cast("bigint")).as("kept_value_c"))
  }

  val oracles: Map[String, String] = Map(
    "q27_cohort_retention" ->
      """WITH ft AS (
           SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
           FROM events GROUP BY user_id),
         act AS (
           SELECT DISTINCT e.user_id AS user_id, ft.cohort_week AS cohort_week,
                  CAST(date_diff('day', ft.cohort_week, date_trunc('week', e.ts)) / 7 AS INT)
                    AS week_n
           FROM events e JOIN ft ON e.user_id = ft.user_id)
         SELECT cohort_week, week_n, count(*) AS n_users
         FROM act GROUP BY 1, 2 ORDER BY cohort_week, week_n""",
    "t6_top_terms" ->
      """WITH counts AS (
           SELECT lang, tok, count(*) AS n FROM (
             SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
           WHERE tok <> '' GROUP BY 1, 2),
         ranked AS (
           SELECT lang, tok, n,
                  row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rank
           FROM counts)
         SELECT lang, rank, tok, n FROM ranked WHERE rank <= 3
         ORDER BY lang, rank""",
    "d7_window_dedup" ->
      """WITH ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY user_id, event_type, date_trunc('hour', ts)
             ORDER BY ts, event_id) AS rn
           FROM events)
         SELECT count(*) AS n_kept,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS kept_value_c
         FROM ranked WHERE rn = 1""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_cohort_retention" -> q27CohortRetention _,
    "t6_top_terms" -> t6TopTerms _,
    "d7_window_dedup" -> d7WindowDedup _,
  )
}
