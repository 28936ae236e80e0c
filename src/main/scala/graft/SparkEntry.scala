package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Advanced, Cohort, Queries, SetOps, Wide}
import graft.dedup.Dedup
import graft.maintenance.Maintenance
import graft.multimodal.Binary
import graft.ops.OpQueries
import graft.pipeline.Pipeline
import graft.plans.{AsOfJoin, Sketches}
import graft.prescriptive.Scoring
import graft.similarity.Ann
import graft.sources.RestJson
import graft.streaming.{Stateful, Stream}
import graft.text.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's named entry
  * (SURVEY.md §2 inventory); `oracleSql` carries the DuckDB twin of each
  * (same column aliases — the driver's compare sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full prescriptive hygiene-scoring pipeline (O-30): scan → clean
    * → broadcast-join → window filter → weighted score → CASE tiers. */
  def entry(spark: SparkSession): DataFrame =
    Scoring.hygieneScore(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.io.JdbcSource.queries ++
    Queries.queries ++ OpQueries.queries ++ RestJson.queries ++
      Dedup.queries ++ Ann.queries ++ TextOps.queries ++
      Binary.queries ++ Stream.queries ++ Stateful.queries ++ Pipeline.queries ++
      AsOfJoin.queries ++ Sketches.queries ++ graft.plans.RangeJoin.queries ++
      graft.plans.Bucketing.queries ++ graft.plans.TopK.queries ++
      graft.plans.Dpp.queries ++
      Advanced.queries ++ SetOps.queries ++
      Maintenance.queries ++ Wide.queries ++ Cohort.queries ++ Map(
      "o30_prescriptive" -> ((s: SparkSession, dir: String) => Scoring.hygieneScore(s, dir)),
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.io.JdbcSource.oracles ++
    Queries.oracles ++ OpQueries.oracles ++ RestJson.oracles ++
      Dedup.oracles ++ Ann.oracles ++ TextOps.oracles ++
      Binary.oracles ++ Stream.oracles ++ Stateful.oracles ++ Pipeline.oracles ++
      AsOfJoin.oracles ++ Sketches.oracles ++ graft.plans.RangeJoin.oracles ++
      graft.plans.Bucketing.oracles ++ graft.plans.TopK.oracles ++
      graft.plans.Dpp.oracles ++
      Advanced.oracles ++ SetOps.oracles ++
      Maintenance.oracles ++ Wide.oracles ++ Cohort.oracles ++ Map(
      "o30_prescriptive" -> Scoring.oracleSql,
    )
}
