package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables

/** X-1 — distributed as-of join (an operator core Spark lacks).
  *
  * Semantics: for each left row ("trade"), attach the right row
  * ("quote") with the greatest event time <= the trade's time, within
  * the same key. Implemented by COMPOSITION (preference (a) of the
  * custom-operator ladder): tag + union + per-key time sort + running
  * `last(_, ignoreNulls)` window. This is the scalable shape — ONE
  * shuffle on the key, one per-partition sort, zero point lookups; a
  * sort-merge-join-based custom SparkPlan would do exactly the same
  * I/O, so no custom physical operator is warranted.
  *
  * Equal-timestamp policy: quotes sort BEFORE trades at the same
  * instant (tag 0 < tag 1), so a quote at exactly t matches a trade at
  * t (inclusive <=). Quotes are deduped to one per (key, time) with a
  * max-id tiebreak, making the match unique and engine-portable.
  *
  * Hosted on the star schema: trades = sampled orders (key =
  * o_custkey%10), quotes = lineitem ship events (key = l_suppkey%10) —
  * overlapping time domains, non-trivial match distribution.
  */
object AsOfJoin {

  /** Generic as-of: left(keyCol, tCol, payload...) gets matchTime +
    * matchId of the latest right row at or before tCol in its key. */
  def asOf(
      trades: DataFrame, quotes: DataFrame,
      key: String, t: String, quoteId: String): DataFrame = {
    // trade payload columns ride along (null on the quote side of the union)
    val payload = trades.columns.filterNot(c => c == key || c == t).toSeq
    // one quote per (key, t): keep the max id (deterministic tiebreak)
    val q1 = quotes.groupBy(col(key), col(t)).agg(max(col(quoteId)).as("q_id"))
      .select(Seq(col(key), col(t), $"q_id", lit(0).as("tag")) ++
        payload.map(c => lit(null).cast(trades.schema(c).dataType).as(c)): _*)
    val tr = trades.select(Seq(col(key), col(t), lit(null).cast("long").as("q_id"),
      lit(1).as("tag")) ++ payload.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(t), $"tag", $"q_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q1.unionByName(tr)
      .withColumn("asof_id", last($"q_id", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .drop("q_id", "tag")
  }

  def x1AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val trades = Tables.orders(s, dir)
      .filter($"o_orderkey" % 10 === 0)
      .select(($"o_custkey" % 10).as("bucket"), $"o_orderdate".as("t"),
        $"o_orderkey")
    val quotes = Tables.lineitem(s, dir)
      .select(($"l_suppkey" % 10).as("bucket"), $"l_shipdate".as("t"),
        ($"l_orderkey" * 10 + $"l_linenumber").as("quote_id"))
    // re-attach the trade identity after the generic asOf (asOf keys on
    // (bucket, t); orders may collide there, so dedup trades the same way)
    val tr1 = trades.groupBy($"bucket", $"t").agg(max($"o_orderkey").as("o_orderkey"))
    asOf(tr1, quotes, "bucket", "t", "quote_id")
      .select($"bucket", $"o_orderkey", $"t".as("trade_t"), $"asof_id")
      .orderBy($"bucket", $"o_orderkey")
  }

  val oracles: Map[String, String] = Map(
    "x1_asof_join" ->
      """WITH quotes AS (
           SELECT l_suppkey % 10 AS bucket, l_shipdate AS t,
                  max(l_orderkey * 10 + l_linenumber) AS quote_id
           FROM lineitem GROUP BY 1, 2),
         trades AS (
           SELECT o_custkey % 10 AS bucket, o_orderdate AS t,
                  max(o_orderkey) AS o_orderkey
           FROM orders WHERE o_orderkey % 10 = 0 GROUP BY 1, 2)
         SELECT tr.bucket AS bucket, tr.o_orderkey AS o_orderkey,
                tr.t AS trade_t, q.quote_id AS asof_id
         FROM trades tr ASOF LEFT JOIN quotes q
           ON tr.bucket = q.bucket AND q.t <= tr.t
         ORDER BY bucket, o_orderkey""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_asof_join" -> x1AsOfJoin _,
  )
}
