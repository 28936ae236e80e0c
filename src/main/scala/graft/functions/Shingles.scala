package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word k-gram (shingle) enumeration over a `text` column, exploded to
  * one row per shingle.
  *
  * Spelled with plain collection expressions — `slice` + `arrays_zip` +
  * `concat_ws` — rather than a `transform(sequence(...), i -> ...)`
  * lambda. Higher-order functions are CodegenFallback: each lambda
  * call drops the scan-side projection out of whole-stage codegen into
  * interpreted evaluation, and on t15's token pairing the lambda
  * spelling measured 1.6× the whole entry's runtime at sf10 (round
  * 12). k aliased slices of the token array zipped elementwise give
  * the same k-gram enumeration as the index lambda — slice i covers
  * tokens i..n-k+i (1-based starts i+1, shared length n-k+1), so row j
  * of the zip is tokens j..j+k-1 — with every expression codegen'd.
  *
  * Semantics match the transform spelling exactly: documents with
  * fewer than k tokens emit no rows (the `when` leaves the zip NULL
  * and explode drops NULL arrays), tokens are NOT empty-filtered (the
  * oracles enumerate the same raw split), and the shingle string is
  * the k tokens joined by single spaces.
  */
object Shingles {
  /** Append an exploded `shingle` column to `keys`, consuming `text`.
    * One Generate per row — no shuffle, no lambda. */
  def kgramRows(df: DataFrame, keys: Seq[String], k: Int): DataFrame =
    kgram(df, keys, k, distinct = false)

  /** [[kgramRows]] with the PER-DOC duplicates removed in-row
    * (`array_distinct` on the zipped k-gram structs, before the
    * explode). When `keys` identify the row (doc_id), per-row dedup
    * IS global dedup — the output multiset is exactly
    * `kgramRows(...).distinct()` — but the corpus-sized
    * (key, shingle) distinct EXCHANGE is gone: the dedup runs inside
    * the scan projection. (Struct-triple dedup ≡ string dedup because
    * tokens are space-free, so `concat_ws(" ", ...)` is injective on
    * the triples.) This was the single biggest shuffle in the LSH
    * verify family — d8's fourth-decade run filled the box's disk on
    * exactly this exchange. */
  def kgramRowsDistinct(df: DataFrame, keys: Seq[String], k: Int): DataFrame =
    kgram(df, keys, k, distinct = true)

  private def kgram(df: DataFrame, keys: Seq[String], k: Int,
      distinct: Boolean): DataFrame = {
    require(k >= 2, s"shingle width $k must be >= 2")
    val keyCols = keys.map(col)
    val n = size(col("__arr"))
    val slices: Seq[Column] =
      (0 until k).map(i => slice(col("__arr"), lit(i + 1), n - (k - 1)).as(s"w$i"))
    val zipped = when(n >= k, arrays_zip(slices: _*))
    val grams = (0 until k).map(i => col(s"__g.w$i"))
    df.select(keyCols :+ split(col("text"), " ").as("__arr"): _*)
      .select(keyCols :+
        explode(if (distinct) array_distinct(zipped) else zipped).as("__g"): _*)
      .select(keyCols :+ concat_ws(" ", grams: _*).as("shingle"): _*)
  }
}
