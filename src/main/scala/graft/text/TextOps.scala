package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables

/** Text-analysis operators for training-data pipelines, over `documents`.
  *
  * All per-document metrics are single-pass projections (no shuffle at
  * all — a 100 TB corpus maps partition-by-partition); only the
  * aggregated views group. Everything is Column algebra / built-in
  * regex — no UDFs, so whole-stage codegen applies.
  */
object TextOps {

  /** Per-language token profiles for the n-gram/stopword language-ID
    * heuristic. Tiny fixed lists — inlined as literals in both engines. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "query", "table", "row"),
    "es" -> Seq("the", "order", "part", "filter", "value"),
    "de" -> Seq("stream", "batch", "spark", "window", "hash"),
    "fr" -> Seq("join", "merge", "sort", "agg", "column"),
    "zh" -> Seq("fast", "slow", "big", "small", "key"),
  )

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")

  /** T-1 — language ID: score each doc's tokens against the per-language
    * profiles; prediction = argmax with a fixed tie-break order (profile
    * declaration order). Emits prediction + whether it matches the
    * labelled lang. */
  def t1LangId(s: SparkSession, dir: String): DataFrame = {
    val scores = LangProfiles.map { case (lang, words) =>
      sum(when($"tok".isin(words: _*), 1).otherwise(0)).as(s"s_$lang")
    }
    val scored = tokens(s, dir).groupBy($"doc_id", $"lang")
      .agg(scores.head, scores.tail: _*)
    // argmax with declaration-order tie-break: first profile with score == max
    val maxScore = greatest(LangProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    // argmax with declaration-order tie-break (first profile hitting the max)
    val predFirst = LangProfiles.reverse.foldLeft(lit("und"): Column) { case (acc, (l, _)) =>
      when(col(s"s_$l") === maxScore, lit(l)).otherwise(acc)
    }
    scored.select($"doc_id", $"lang", predFirst.as("pred_lang"),
        maxScore.as("best_score"))
      .withColumn("is_match", ($"pred_lang" === $"lang").cast("int"))
      .orderBy($"doc_id")
  }

  /** T-2 — quality scoring: length / punctuation / stopword ratios
    * combined into one bounded score. */
  def t2Quality(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val nChars = length($"text")
    val nTokens = size(split($"text", "\\s+")) -
      when(trim($"text") === "", 1).otherwise(0)
    val alphaChars = length(regexp_replace($"text", "[^a-z]", ""))
    val stopHits = size(filter(split($"text", " "), t => t.isin(Stopwords.map(lit): _*)))
    d.select($"doc_id", nChars.as("n_chars"), nTokens.as("n_tokens"),
        round(alphaChars / greatest(nChars, lit(1)).cast("double"), 4).as("alpha_ratio"),
        round(stopHits / greatest(nTokens, lit(1)).cast("double"), 4).as("stopword_ratio"))
      .withColumn("quality",
        round(least(lit(1.0),
          ($"n_tokens" / 100.0) * 0.4 + $"alpha_ratio" * 0.4 + $"stopword_ratio" * 0.2), 4))
      .orderBy($"doc_id")
  }

  /** T-3 — token counting: whitespace tokens + a BPE-ish subword
    * estimate (chars/4, the classic bytes-per-token heuristic). */
  def t3TokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        $"doc_id",
        (size(split($"text", "\\s+")) - when(trim($"text") === "", 1).otherwise(0)).as("n_ws_tokens"),
        size(split($"text", "[^a-z0-9]+")).as("n_word_tokens_raw"),
        ceil(length($"text") / 4.0).cast("bigint").as("n_bpe_est"))
      .orderBy($"doc_id")

  /** T-4 — document fingerprinting: md5 of the whitespace-normalized
    * text (order-sensitive) + the minimum shingle hash (order-robust,
    * rolling-window flavored). */
  def t4Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = lower(trim(regexp_replace($"text", "\\s+", " ")))
    val arr = split(norm, " ")
    val shingleMin = array_min(expr(
      """CASE WHEN size(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')) >= 3
           THEN transform(
             sequence(0, size(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')) - 3),
             i -> md5(concat(
               split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')[i], ' ',
               split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')[i+1], ' ',
               split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')[i+2])))
           ELSE array(md5(lower(trim(regexp_replace(text, '\\s+', ' '))))) END"""))
    Tables.documents(s, dir).select(
        $"doc_id", md5(norm).as("fingerprint"), shingleMin.as("min_shingle_fp"))
      .orderBy($"doc_id")
  }

  private def profileSumSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("CAST(sum(CASE WHEN tok IN (", ",", ") THEN 1 ELSE 0 END) AS BIGINT)")

  val oracles: Map[String, String] = Map(
    "t1_langid" -> {
      val scores = LangProfiles.map { case (l, ws) => s"${profileSumSql(ws)} AS s_$l" }.mkString(", ")
      val maxExpr = LangProfiles.map { case (l, _) => s"s_$l" }.mkString("greatest(", ",", ")")
      val pred = LangProfiles.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok FROM documents),
          scored AS (SELECT doc_id, lang, $scores FROM tok WHERE tok <> '' GROUP BY doc_id, lang),
          m AS (SELECT *, $maxExpr AS m FROM scored)
          SELECT doc_id, lang, $pred AS pred_lang, CAST(m AS BIGINT) AS best_score,
                 CAST(($pred = lang) AS INT) AS is_match
          FROM m ORDER BY doc_id"""
    },
    "t2_quality" -> {
      val stop = Stopwords.map(w => s"'$w'").mkString("(", ",", ")")
      s"""WITH base AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(regexp_split_to_array(text, '\\s+')) -
                     (CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS n_tokens,
                   length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
                   len(list_filter(string_split(text, ' '), t -> t IN $stop)) AS stop_hits
            FROM documents)
          SELECT doc_id, n_chars, n_tokens,
                 round(n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE), 4) AS alpha_ratio,
                 round(stop_hits / CAST(greatest(n_tokens, 1) AS DOUBLE), 4) AS stopword_ratio,
                 round(least(1.0,
                   (n_tokens/100.0)*0.4
                   + round(n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE), 4)*0.4
                   + round(stop_hits / CAST(greatest(n_tokens, 1) AS DOUBLE), 4)*0.2), 4) AS quality
          FROM base ORDER BY doc_id"""
    },
    "t3_token_count" ->
      """SELECT doc_id,
                len(regexp_split_to_array(text, '\s+')) -
                  (CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS n_ws_tokens,
                len(regexp_split_to_array(text, '[^a-z0-9]+')) AS n_word_tokens_raw,
                CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
         FROM documents ORDER BY doc_id""",
    "t4_fingerprint" ->
      """WITH n AS (SELECT doc_id,
                    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm FROM documents),
          w AS (SELECT doc_id, norm, string_split(norm, ' ') AS arr FROM n)
          SELECT doc_id, md5(norm) AS fingerprint,
                 CASE WHEN len(arr) >= 3
                   THEN list_min([md5(arr[i]||' '||arr[i+1]||' '||arr[i+2])
                                  for i in range(1, len(arr)-1)])
                   ELSE md5(norm) END AS min_shingle_fp
          FROM w ORDER BY doc_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_langid" -> t1LangId _,
    "t2_quality" -> t2Quality _,
    "t3_token_count" -> t3TokenCount _,
    "t4_fingerprint" -> t4Fingerprint _,
  )
}
