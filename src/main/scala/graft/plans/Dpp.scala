package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables

/** X-12 — dynamic partition pruning: the filter on the DIM side prunes
  * the partitioned FACT scan at runtime.
  *
  * At 100 TB the fact table is day-partitioned and a query like "events
  * on Mondays" arrives as `fact ⋈ day_dim WHERE dim.weekday = monday` —
  * the pruning predicate lives on the dim, so static partition pruning
  * sees nothing to prune with. Catalyst's dynamic partition pruning
  * closes that gap: the dim's broadcast result is REUSED as an IN-set
  * filter on the fact scan's partition column, so the fact reads 5/30
  * day directories instead of all of them BEFORE the join runs. On a
  * 1000-executor cluster this is the difference between scanning the
  * whole fact table and scanning the qualifying slice — the single
  * biggest lever a partitioned lakehouse layout buys (the write-side
  * twin is MT-7's dynamic partition overwrite; the layout-audit twin is
  * MT-6). PlanSpec asserts the fact scan carries a
  * `dynamicpruningexpression` in its PartitionFilters and that the dim
  * side broadcasts (pruning rides the broadcast exchange — no second
  * dim scan).
  *
  * Both sides land as parquet in a swept graft_ work dir so the planner
  * sees two real file scans (a pruning demo over in-memory frames would
  * prove nothing about scan pruning).
  */
object Dpp {

  /** The raw pruned join (pre-aggregation) — shared by the gate entry
    * and the PlanSpec shape assertion. */
  private[graft] def dppJoinRaw(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_x12_").toString
    val ev = Tables.events(s, dir).select(
      $"event_id", $"ts".cast("date").as("day"),
      round($"value" * 100).cast("bigint").as("value_c"))
    // fact: day-partitioned parquet (the lakehouse layout under test)
    ev.write.mode(SaveMode.Overwrite).partitionBy("day")
      .parquet(s"$work/fact")
    // dim: one row per day with the attribute the query filters on;
    // weekday(day) = 0 is Monday in both engines' isodow-1 convention
    ev.select($"day").distinct()
      .select($"day", expr("weekday(day)").cast("int").as("wd"))
      .write.mode(SaveMode.Overwrite).parquet(s"$work/dim")
    val fact = s.read.parquet(s"$work/fact")
    val dim = s.read.parquet(s"$work/dim").filter($"wd" === 0)
    fact.join(dim.hint("broadcast"), Seq("day"))
  }

  /** X-12 gate entry: per-Monday event counts + exact cents totals. */
  def x12Dpp(s: SparkSession, dir: String): DataFrame =
    dppJoinRaw(s, dir)
      .groupBy($"day")
      .agg(count(lit(1)).as("n_events"), sum($"value_c").as("sum_value_c"))
      .orderBy($"day")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x12_dpp" -> (x12Dpp _),
  )

  def oracles: Map[String, String] = Map(
    "x12_dpp" ->
      """SELECT CAST(ts AS DATE) AS day,
                count(*) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events
         WHERE isodow(CAST(ts AS DATE)) = 1
         GROUP BY 1
         ORDER BY 1""",
  )
}
