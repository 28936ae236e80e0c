package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-snapshot selection + snapshot writers (SURVEY.md §2.3, §2.2).
  *
  * O-13 is the reference's signature scan op: every consumer picks the
  * single most-recent object by LastModified
  * (ref `elt/clean_sheets.py:42-51` + 4 more copies). Re-expressed as a
  * top-1 sort-limit. Two forms:
  *
  *  - global top-1: `max_by(struct(*), (ts, tiebreak))` — a single
  *    partial-aggregate + 1-row final merge: NO full shuffle, NO global
  *    sort. At 100 TB this is one pass, map-side combined.
  *  - top-1 per group: `row_number` window — shuffles once on the group
  *    key (unavoidable: result is per-key), then a per-partition sort.
  *
  * Ties on the timestamp are broken by an explicit total-order tiebreak
  * column (SURVEY.md §7.4: the reference's sort is stable; we make the
  * order explicit instead).
  */
object Snapshot {

  /** THE Delta seam (SURVEY.md §7.2a): every clean/curated ZONE
    * writer and reader resolves its table format through this one
    * constant. The reference stores zones as Delta Lake; this
    * environment has no delta jars (verified impossible, round 3), and
    * the reference uses none of Delta's distinguishing features (always
    * full-snapshot overwrite — no MERGE/time-travel), so parquet is
    * semantics-complete here. On a cluster with delta-spark on the
    * classpath, switching the engine's storage to real Delta is editing
    * THIS LITERAL to "delta" — provably one line, because no zone
    * writer/reader names a format directly. */
  val ZoneFormat = "parquet"

  /** O-13/O-31 — global latest row (k=1 sort-limit without the sort):
    * ORDER BY ts DESC, tiebreak DESC LIMIT 1 via max_by over a struct.
    * Aggregation is map-side partial → single-row reduce. */
  def latestRow(df: DataFrame, ts: String, tiebreak: String): DataFrame = {
    val cols = df.columns
    val ordKey = struct(col(ts), col(tiebreak))
    df.agg(max_by(struct(cols.map(col): _*), ordKey).as("r"))
      .select(cols.map(c => col(s"r.$c").as(c)): _*)
  }

  /** O-13 variant — latest row per group key (one window shuffle). */
  def latestRowPerGroup(df: DataFrame, group: String, ts: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col(ts).desc, col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** O-29 — scalar max/min with null-fallback + future-clamp
    * (ref `prescriptive_logic.py:78-85`): last-bath = max(bath ts),
    * falling back to min(activity ts) when the bath log is empty, and
    * clamped to "now" so the clock never goes negative. Returns a 1-row
    * DataFrame (broadcast-joinable scalar, never `.collect()`). */
  def clampedMax(df: DataFrame, ts: String, fallback: Column, now: Column): Column =
    least(coalesce(max(col(ts)), fallback), now)

  /** O-32 — global sort before write (ref `elt/clean_bmkg.py:73`).
    * Range-partitioned sort: sampling pass + shuffle; keep it at the
    * very end of a plan, after aggregation shrank the data. */
  def globalSort(df: DataFrame, ts: String): DataFrame = df.orderBy(col(ts))

  /** O-9/O-11 — full-snapshot overwrite writer (ref
    * `write_deltalake(mode="overwrite", schema_mode="overwrite")`,
    * `elt/clean_sheets.py:70-82`). */
  def overwriteSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("overwriteSchema", "true")
      .format(ZoneFormat).save(path)

  /** O-10 — append history sink (ref `load_prescriptive_to_sql.py:51-56`). */
  def appendHistory(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).format(ZoneFormat).save(path)

  /** Zone-table reader twin of the writers above — same seam. */
  def readZone(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.format(ZoneFormat).load(path)

  /** O-12 — single-row CSV audit log (ref `prescriptive_logic.py:191-197`).
    * coalesce(1) is safe here by construction: the input is a 1-row
    * aggregate result, not a large table. */
  def auditLogCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
}
