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
    a.crossJoin(b)
      .filter($"key_b" === $"key_a" + 10)
      .select($"key_a", $"key_b",
        levenshtein($"name_a", $"name_b").as("dist"),
        length($"name_a").as("len_a"), length($"name_b").as("len_b"))
      .orderBy($"key_a")
  }

  val oracles: Map[String, String] = Map(
    "q24_pivot" ->
      """SELECT o_orderstatus,
                sum(CASE WHEN substr(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END) AS p1,
                sum(CASE WHEN substr(o_orderpriority, 1, 1) = '2' THEN 1 ELSE 0 END) AS p2,
                sum(CASE WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1 ELSE 0 END) AS p3,
                sum(CASE WHEN substr(o_orderpriority, 1, 1) = '4' THEN 1 ELSE 0 END) AS p4,
                sum(CASE WHEN substr(o_orderpriority, 1, 1) = '5' THEN 1 ELSE 0 END) AS p5
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
    "t5_levenshtein" -> t5Levenshtein _,
  )
}
