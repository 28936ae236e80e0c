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
    // fact: day-partitioned parquet (the lakehouse layout under test).
    // Clustered by the partition column before the write (r16
    // optimization, guide §6 layout-on-write): an unclustered
    // partitionBy makes EVERY scan task open a writer per day it
    // holds — task×day file fan-out at scale, and at gate SF one task
    // serially wrote all ~31 day files (measured 714 ms). The
    // day-hash exchange writes each day as one file from one task;
    // the read-back data is identical.
    ev.repartition($"day").write.mode(SaveMode.Overwrite).partitionBy("day")
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

  /** Replication factor for X-13's salted join: the hot key's rows
    * spread over this many shuffle partitions instead of one. */
  val SaltR = 8

  /** X-13 — salted SKEW join (the join-side twin of X-3's salted agg):
    * when one join key holds a disproportionate share of the fact rows,
    * a plain hash join lands that entire key on ONE reducer and the
    * stage runs at straggler speed. Salting dilutes it: the fact side
    * appends a deterministic salt in [0, R), the dim side replicates
    * each row R times (one per salt value), and the join runs on
    * (key, salt) — the hot key now spreads over R partitions at the
    * cost of an R× dim-side blowup, which is the right trade exactly
    * when the dim is small and the fact is skewed (the 100 TB norm;
    * AQE's skew-join handles sort-merge cases adaptively, salting is
    * the portable form that also covers aggregates-after-join). Result
    * is provably the plain join — the oracle IS the plain join — and
    * exact integer cents keep the reassociated sums bit-equal. */
  private[graft] def saltedJoinRaw(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.events(s, dir)
      .select($"user_id", $"event_id",
        round($"value" * 100).cast("bigint").as("cents"))
      .withColumn("salt", pmod($"event_id", lit(SaltR)).cast("int"))
    val dim = Tables.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment")
      .withColumn("salt", explode(expr(s"sequence(0, ${SaltR - 1})")))
    // shuffle_hash pins the shuffled form: at toy SF the replicated dim
    // would broadcast (where salting is moot — broadcast has no reducer
    // hotspot); at 100 TB a 10 GB dim can't broadcast and THIS is the plan
    fact.join(dim.hint("shuffle_hash"), fact("user_id") === dim("c_custkey") &&
      fact("salt") === dim("salt"))
  }

  def x13SaltedJoin(s: SparkSession, dir: String): DataFrame =
    saltedJoinRaw(s, dir)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
      .orderBy($"c_mktsegment")

  /** Scoped confs for X-14's AQE skew-split demo. Thresholds are lowered
    * from their cluster defaults (256 MB / 64 MB) so AQE sees the toy
    * SF's hot partition as skewed — at 100 TB the DEFAULTS fire on the
    * same shape, so only these numbers change, not the query. Runtime
    * SMJ→broadcast demotion is disabled for the scope: the demo is the
    * reducer-side split, and a runtime broadcast would dissolve the
    * shuffle it splits. Set/restore runs in a try/finally; body must
    * EXECUTE (not just plan) inside the scope because AQE reads these
    * at execution time. */
  private[graft] def withSkewConfs[A](s: SparkSession,
      threshold: String = "64KB", advisory: String = "64KB",
      filesMax: String = "1MB")(body: => A): A = {
    val pairs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> threshold,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory,
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // one scan bin per file: default 4 MB open-cost packing would fold
      // the 16-file fact into one mapper, leaving AQE nothing to split on
      "spark.sql.files.maxPartitionBytes" -> filesMax,
      "spark.sql.files.openCostInBytes" -> "0")
    val prev = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** X-14 raw join — 80 % of fact rows remapped onto ONE hot key, then a
    * forced sort-merge join against the customer dim (the skew shape a
    * plain hash-partitioned join handles worst). The fact side lands as
    * 16 parquet files first: AQE splits a skewed reducer partition
    * along MAPPER-block boundaries, so a single-file scan (one mapper)
    * is unsplittable no matter how skewed — at 100 TB thousands of
    * mappers exist naturally, at toy SF the 16-file layout stands in
    * for them. Shared by the gate entry and the PlanSpec assertion. */
  private[graft] def skewJoinRaw(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_x14_").toString
    Tables.events(s, dir).select(
        when(pmod($"event_id", lit(10)) < 8, lit(1L)).otherwise($"user_id").as("k"),
        round($"value" * 100).cast("bigint").as("cents"))
      .repartition(16)
      .write.mode(SaveMode.Overwrite).parquet(s"$work/fact")
    val fact = s.read.parquet(s"$work/fact")
    val dim = Tables.customer(s, dir).select($"c_custkey".as("k"), $"c_mktsegment")
    fact.join(dim.hint("merge"), Seq("k"))
  }

  /** X-14 — AQE skew-join split: the RUNTIME twin of X-13's salting.
    * Where X-13 pre-spreads a known hot key by rewriting the plan, AQE
    * measures the actual shuffle-partition sizes after the map stage and
    * splits any reducer partition larger than max(threshold, factor ×
    * median) into advisory-sized slices, replicating the matching dim
    * partition — no query rewrite, which is exactly what saves the 90 %
    * of skew nobody predicted at authoring time. The heavy join runs
    * eagerly inside the conf scope (AQE reads confs at execution); only
    * the segment-cardinality summary (≤ 5 rows) crosses the driver. */
  def x14AqeSkew(s: SparkSession, dir: String): DataFrame = withSkewConfs(s) {
    val summary = skewJoinRaw(s, dir)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
      .orderBy($"c_mktsegment")
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    import s.implicits._
    summary.toDF("c_mktsegment", "n", "sum_cents")
  }

  /** Scoped confs for X-15's runtime bloom-filter demo. The cluster
    * default only builds a bloom filter when the application side scans
    * > 10 GB (below that the filter costs more than the shuffle it
    * saves) — at toy SF that threshold is lowered to 0 so the SAME
    * query shape fires; at 100 TB the DEFAULT fires on it. Broadcast
    * is disabled in-scope because the rule targets shuffle joins (a
    * broadcast join already filters at the probe side for free). */
  private[graft] def withBloomConfs[A](s: SparkSession)(body: => A): A = {
    val pairs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** X-15 raw join — fact ⋈ selectively-filtered dim, forced to
    * sort-merge. Catalyst's InjectRuntimeFilter sees the selective dim
    * predicate, builds a bloom filter over the dim's join keys in a
    * scalar subquery, and injects `might_contain(key)` on the FACT side
    * BEFORE its shuffle — the manual x8 bloom semi-join, produced
    * automatically. Shared by the gate entry and PlanSpec (which
    * asserts the injected filter is actually in the optimized plan). */
  private[graft] def bloomJoinRaw(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.events(s, dir)
      .select($"user_id", round($"value" * 100).cast("bigint").as("cents"))
    val dim = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING" && pmod($"c_custkey", lit(7)) === 3)
      .select($"c_custkey", $"c_nationkey")
    fact.join(dim.hint("merge"), fact("user_id") === dim("c_custkey"))
  }

  /** X-15 — runtime bloom-filter join (the automatic twin of X-8's
    * hand-built bloom semi-join, and the row-level sibling of X-12's
    * partition-level DPP): where DPP prunes whole partitions via the
    * dim's broadcast, the runtime bloom filter cuts non-qualifying ROWS
    * of an unpartitioned fact before the join shuffle — at 100 TB the
    * shuffle write is sized by surviving rows, which for a selective
    * dim predicate is the difference between shuffling the corpus and
    * shuffling the answer. Executes inside the conf scope (the rule
    * runs at optimization, which happens at the action). */
  def x15RuntimeBloom(s: SparkSession, dir: String): DataFrame =
    withBloomConfs(s) {
      val summary = bloomJoinRaw(s, dir)
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
        .orderBy($"c_nationkey")
        .collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      import s.implicits._
      summary.toDF("c_nationkey", "n", "sum_cents")
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x12_dpp" -> (x12Dpp _),
    "x13_salted_join" -> (x13SaltedJoin _),
    "x14_aqe_skew" -> (x14AqeSkew _),
    "x15_runtime_bloom" -> (x15RuntimeBloom _),
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
    "x13_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1
         ORDER BY c_mktsegment""",
    "x15_runtime_bloom" ->
      """SELECT c_nationkey, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events JOIN customer ON user_id = c_custkey
         WHERE c_mktsegment = 'BUILDING' AND c_custkey % 7 = 3
         GROUP BY 1
         ORDER BY c_nationkey""",
    "x14_aqe_skew" ->
      """WITH f AS (
           SELECT CASE WHEN event_id % 10 < 8 THEN 1 ELSE user_id END AS k,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
         SELECT c_mktsegment, count(*) AS n,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM f JOIN customer ON k = c_custkey
         GROUP BY 1
         ORDER BY c_mktsegment""",
  )
}
