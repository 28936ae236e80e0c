package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / rename / coercion operators (SURVEY.md §2.4-2.5).
  *
  * Each is a pure `DataFrame => DataFrame` so they compose lazily into a
  * single Catalyst plan — coercions and null-drops run inside whole-stage
  * codegen over the scan, never as a separate materialized pass (unlike
  * the reference's eager pandas steps).
  */
object Cleaning {

  /** O-14 — column-name normalization (ref `elt/clean_sheets.py:59-68`):
    * strip → lowercase → spaces→underscores → BOM strip. Pure metadata
    * rename: zero execution cost. Idempotent. */
  def normalizeName(c: String): String =
    c.replace("﻿", "").trim.toLowerCase.replaceAll("\\s+", "_")

  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)

  /** O-15 — timestamp coercion, null on failure
    * (ref `pd.to_datetime(errors="coerce")`, `elt/clean_sheets.py:104-105`). */
  def tryTimestamp(c: Column): Column = try_to_timestamp(c)

  /** O-16 — numeric coercion, null on failure
    * (ref `pd.to_numeric(errors="coerce")`, `elt/clean_sheets.py:107-108`). */
  def tryDouble(c: Column): Column = c.try_cast("double")

  def tryLong(c: Column): Column = c.try_cast("bigint")

  /** O-17 — derive canonical timestamp column from a source column
    * (ref `waktu_mandi` → `timestamp`, `elt/clean_sheets.py:116-117`). */
  def deriveTimestamp(df: DataFrame, src: String, dst: String): DataFrame =
    df.withColumn(dst, tryTimestamp(col(src)))

  /** O-18 — prune to an exact serving schema
    * (ref `elt/load/load_aktivitas_to_neon.py:65-72`). Catalyst pushes
    * this into the parquet scan (`ReadSchema`) — at 100 TB this is the
    * difference between reading 2 columns and reading 11. */
  def prune(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** O-19 — local-clock shift (ref WITA = UTC+8,
    * `prescriptive_logic.py:57-59`): session TZ is pinned UTC; local
    * wall-clock = ts + 8h. Clock is always *injected* (a Column), never
    * `now()`, so every tested path is deterministic. */
  def toLocalClock(ts: Column, offsetHours: Int = 8): Column =
    ts + expr(s"INTERVAL $offsetHours HOURS")

  /** O-20 — drop rows whose key timestamp failed coercion
    * (ref `dropna(subset=["timestamp"])`, `elt/clean_sheets.py:111`). */
  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop(keys)

  /** O-22 — sweat/odor row predicate (ref `filter_bau`,
    * `prescriptive_logic.py:124-132`): MET > 3.0 OR category contains
    * "outdoor". The reference runs this as a per-row Python `.apply`;
    * here it is pure Column algebra inside codegen. Null MET compares
    * false, matching the reference's `row.get(...) > 3.0` on missing. */
  def sweatyPredicate(met: Column, category: Column, outdoorToken: String): Column =
    (met > 3.0) || lower(coalesce(category, lit(""))).contains(outdoorToken)
}
