package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables

/** Wide-surface analytics: pivot, array/higher-order functions, edit
  * distance — the remaining classic OLAP/text shapes. All partial-agg
  * or narrow-map plans.
  */
object Wide {

  /** Q-24 — pivot: status rows × priority-class columns. Spark's
    * `.pivot()` with an explicit value list (explicit values keep the
    * plan single-pass — no distinct-scan to discover columns). */
  def q24Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("prio_class", substring($"o_orderpriority", 1, 1))
      .groupBy($"o_orderstatus")
      .pivot("prio_class", Seq("1", "2", "3", "4", "5"))
      .agg(count(lit(1)))
      .toDF("o_orderstatus", "p1", "p2", "p3", "p4", "p5")
      .na.fill(0L, Seq("p1", "p2", "p3", "p4", "p5"))
      .orderBy($"o_orderstatus")

  /** Q-25 — array construction + higher-order functions: per-order
    * quantity vector, then HOF-derived scalars (sorted digest, filter
    * count, fold sum). collect_list + sort makes the array
    * deterministic before any digesting. */
  def q25ArrayHof(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(collect_list(round($"l_quantity" * 100).cast("bigint")).as("q_raw"))
      .select(
        $"l_orderkey",
        size($"q_raw").as("n_items"),
        expr("aggregate(q_raw, 0L, (acc, x) -> acc + x)").as("total_q_c"),
        expr("size(filter(q_raw, x -> x > 2500))").as("n_big"),
        expr("array_max(q_raw)").as("max_q_c"),
        md5(concat_ws(",", expr("transform(array_sort(q_raw), x -> cast(x AS STRING))")))
          .as("digest"))
      .orderBy($"l_orderkey")

  /** T-5 — edit distance (fuzzy matching): levenshtein between each
    * part name and its brand-normalized form, plus a self-join-free
    * sampled pair comparison. */
  def t5Levenshtein(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val a = p.filter($"p_partkey" % 20 === 0)
      .select($"p_partkey".as("key_a"), $"p_name".as("name_a"))
    val b = p.filter($"p_partkey" % 20 === 10)
      .select($"p_partkey".as("key_b"), $"p_name".as("name_b"))
    // explicit equi-join on the derived key: Catalyst used to get the
    // same plan from crossJoin+filter via its cross-to-inner rewrite,
    // but the repo's contract (PlanSpec) is to never RELY on an
    // implicit rewrite to avoid an O(n^2) operator.
    a.join(b, $"key_b" === $"key_a" + 10)
      .select($"key_a", $"key_b",
        levenshtein($"name_a", $"name_b").as("dist"),
        length($"name_a").as("len_a"), length($"name_b").as("len_b"))
      .orderBy($"key_a")
  }

  /** Q-28 — exact rank-based percentiles (p50/p90/p99 of order value,
    * in cents, per priority class): value at row ceil(p·n) of the
    * ascending order — deterministic on ties (equal cents share the
    * picked value) and portable, unlike interpolated/approximate
    * percentile functions (q23 keeps those as the engine-specific
    * variant). One window shuffle per class + one group-by. */
  def q28ExactPercentiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir).select(
      $"o_orderpriority".as("prio"),
      round($"o_totalprice" * 100).cast("bigint").as("cents"))
    val ranked = o
      .withColumn("rn", row_number().over(Window.partitionBy($"prio").orderBy($"cents")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"prio")))
    def pick(p: Double) = max(when($"rn" === ceil(lit(p) * $"n"), $"cents"))
    ranked.groupBy($"prio")
      .agg(max($"n").as("n"), pick(0.5).as("p50_c"),
        pick(0.9).as("p90_c"), pick(0.99).as("p99_c"))
      .orderBy($"prio")
  }

  /** Q-29 — ROLLUP subtotals (status × priority-class → per-status →
    * grand total), with the grouping bitmask disambiguating subtotal
    * rows. One pass: Spark expands grouping sets map-side and
    * partial-aggregates each — no extra scans per level. */
  def q29Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("pc", substring($"o_orderpriority", 1, 1))
      .rollup($"o_orderstatus", $"pc")
      .agg(count(lit(1)).as("n"),
        sum(round($"o_totalprice" * 100).cast("bigint")).as("sum_cents"),
        grouping_id().as("lvl"))
      .orderBy($"lvl", $"o_orderstatus", $"pc")

  /** Q-26 — time-series resample with gap filling: an hourly spine
    * from min(ts) to max(ts) left-joined against the hourly counts, so
    * silent gaps become explicit zero rows (what every downstream
    * trend/alerting consumer needs). The spine is sequence+explode —
    * generated, not scanned; one broadcast of the 2-value bound row. */
  def q26GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(
      date_trunc("hour", min($"ts")).as("t0"), date_trunc("hour", max($"ts")).as("t1"))
    val spine = bounds
      .select(explode(expr("sequence(t0, t1, interval 1 hour)")).as("bucket"))
    val counts = ev.groupBy(date_trunc("hour", $"ts").as("bucket"))
      .agg(count(lit(1)).as("n_raw"))
    spine.join(counts, Seq("bucket"), "left")
      .select($"bucket", coalesce($"n_raw", lit(0L)).as("n"),
        ($"n_raw".isNull).cast("int").as("is_gap"))
      .orderBy($"bucket")
  }

  val oracles: Map[String, String] = Map(
    "q26_gap_fill" ->
      """WITH bounds AS (
           SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
           FROM events),
         spine AS (
           SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket FROM bounds),
         counts AS (
           SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_raw
           FROM events GROUP BY 1)
         SELECT s.bucket AS bucket, coalesce(c.n_raw, 0) AS n,
                CAST(c.n_raw IS NULL AS INT) AS is_gap
         FROM spine s LEFT JOIN counts c ON s.bucket = c.bucket
         ORDER BY bucket""",
    "q24_pivot" ->
      """SELECT o_orderstatus,
                CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
                CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '2' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
                CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
                CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '4' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
                CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '5' THEN 1 ELSE 0 END) AS BIGINT) AS p5
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q25_array_hof" ->
      """WITH arr AS (
           SELECT l_orderkey, list(CAST(round(l_quantity * 100) AS BIGINT)) AS q_raw
           FROM lineitem GROUP BY l_orderkey)
         SELECT l_orderkey,
                CAST(len(q_raw) AS INT) AS n_items,
                CAST(list_aggregate(q_raw, 'sum') AS BIGINT) AS total_q_c,
                CAST(len(list_filter(q_raw, x -> x > 2500)) AS INT) AS n_big,
                CAST(list_max(q_raw) AS BIGINT) AS max_q_c,
                md5(list_aggregate(list_transform(list_sort(q_raw), x -> CAST(x AS VARCHAR)),
                                   'string_agg', ',')) AS digest
         FROM arr ORDER BY l_orderkey""",
    "q29_rollup" ->
      """SELECT o_orderstatus, substr(o_orderpriority, 1, 1) AS pc,
                count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                CAST(GROUPING(o_orderstatus, substr(o_orderpriority, 1, 1)) AS BIGINT) AS lvl
         FROM orders
         GROUP BY ROLLUP(o_orderstatus, substr(o_orderpriority, 1, 1))
         ORDER BY lvl, o_orderstatus, pc""",
    "q28_exact_percentiles" ->
      """WITH r AS (
           SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) AS rn,
                  count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
         SELECT prio, CAST(max(n) AS BIGINT) AS n,
                CAST(max(CASE WHEN rn = ceil(0.5 * n) THEN cents END) AS BIGINT) AS p50_c,
                CAST(max(CASE WHEN rn = ceil(0.9 * n) THEN cents END) AS BIGINT) AS p90_c,
                CAST(max(CASE WHEN rn = ceil(0.99 * n) THEN cents END) AS BIGINT) AS p99_c
         FROM r GROUP BY prio ORDER BY prio""",
    "t5_levenshtein" ->
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
                levenshtein(a.p_name, b.p_name) AS dist,
                length(a.p_name) AS len_a, length(b.p_name) AS len_b
         FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 10
         WHERE a.p_partkey % 20 = 0 AND b.p_partkey % 20 = 10
         ORDER BY key_a""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_pivot" -> q24Pivot _,
    "q25_array_hof" -> q25ArrayHof _,
    "q26_gap_fill" -> q26GapFill _,
    "q28_exact_percentiles" -> q28ExactPercentiles _,
    "q29_rollup" -> q29Rollup _,
    "t5_levenshtein" -> t5Levenshtein _,
  )
}
