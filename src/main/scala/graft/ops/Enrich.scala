package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join + flatten operators (SURVEY.md §2.6, O-33).
  *
  * Every reference join is a left equi-join of a big fact against a tiny
  * dimension (ref `elt/clean_sql.py:64-69`, `prescriptive_logic.py:97`):
  * the scale-correct physical shape is a broadcast hash join — the fact
  * side never shuffles. We hint `broadcast()` explicitly rather than
  * trusting autoBroadcastJoinThreshold, because at 100 TB the fact-side
  * stats can mislead the planner into a sort-merge join.
  */
object Enrich {

  /** O-25/O-26/O-27/O-28 — fact LEFT JOIN broadcast(dim) on a key. */
  def enrich(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "left")

  /** O-33 — JSON / nested-array flattening (ref BMKG `data[].cuaca[][]`
    * explode chain, `elt/clean_bmkg.py:59-71`; AQICN dict-path
    * `elt/clean_aqicn.py:64-70`). Built-in Catalyst `Generator`
    * (explode) — no custom UDTF. Tokenization = split + explode. */
  def explodeTokens(df: DataFrame, text: String, out: String): DataFrame =
    df.withColumn(out, explode(split(col(text), " ")))
      .filter(col(out) =!= "")

  /** O-33 dict-path variant — extract a typed field from a JSON string
    * column (ref `iaqi.pm25.v` path): schema-on-read `from_json` then
    * `getField`, all codegen'd. */
  def jsonField(df: DataFrame, jsonCol: String, field: String, out: String): DataFrame =
    df.withColumn(out, get_json_object(col(jsonCol), s"$$.$field").try_cast("bigint"))
}
