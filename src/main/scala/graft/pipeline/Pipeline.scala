package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables
import graft.ops.{Cleaning, Snapshot}
import graft.prescriptive.Scoring

/** The medallion composition (SURVEY.md §3.1-3.2): raw → clean →
  * curated → serving, inside ONE SparkSession as lazy plans — the
  * reference's process-per-stage boundaries (`run_pipeline.py:25-91`,
  * Airflow fan-in `dags/hygiene_dag.py:103-110`) become plan
  * composition; zones are parquet/CSV dirs.
  *
  * The raw zone gets TWO timestamped CSV snapshots of the activity log
  * (the reference's `name_YYYYMMDD_HHMMSS.csv` convention) with messy
  * headers; clean picks the LATEST by the name-embedded timestamp
  * (O-13), normalizes (O-14), coerces (O-15/16), drops bad keys (O-20)
  * and snapshots to parquet (O-9). Curated = prescriptive score (O-30)
  * + 1-row audit CSV (O-12). Serving = append history (O-10) +
  * replace snapshot (O-11).
  *
  * Values round-trip the CSV hop exactly (explicit timestampFormat,
  * shortest-round-trip doubles), so the end-to-end result must equal
  * the direct [[Scoring.hygieneScore]] — and shares its oracle.
  */
object Pipeline {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def run(s: SparkSession, dir: String, work: String): DataFrame = {
    val li = Tables.lineitem(s, dir)

    // ---- RAW zone: timestamped immutable snapshots (O-7), messy headers ----
    // timestamps serialized explicitly (full control of the format on
    // both sides of the CSV hop)
    val messy = li.select(
      $"l_orderkey".as("L OrderKey"), $"l_partkey".as(" L PartKey"),
      $"l_quantity".as("L Quantity "), date_format($"l_shipdate", TsFmt).as("L ShipDate"))
    def writeRaw(df: DataFrame, ts: String): Unit =
      df.write.mode(SaveMode.Overwrite).option("header", "true")
        .csv(s"$work/raw-zone/sheets/activity_$ts")
    writeRaw(messy.limit(10), "20010101_000000") // stale partial snapshot
    writeRaw(messy, "20010102_000000")           // latest complete snapshot

    // ---- CLEAN zone: latest-object pick (O-13, the reference's
    // list_objects+max(LastModified) done on the name-embedded ts),
    // then normalize/coerce/dropna, snapshot-overwrite (O-9) ----
    val rawRoot = Paths.get(s"$work/raw-zone/sheets")
    val listing = Files.list(rawRoot)
    val latest = try listing.toArray.map(_.toString)
      .filter(_.contains("activity_")).max // total order on embedded ts
    finally listing.close()
    val cleaned = Cleaning.dropNullKeys(
      Cleaning.normalizeColumns(
        s.read.option("header", "true")
          .schema("`L OrderKey` STRING, ` L PartKey` STRING, `L Quantity ` STRING, `L ShipDate` STRING")
          .csv(latest))
        .select(
          Cleaning.tryLong($"l_orderkey").as("l_orderkey"),
          Cleaning.tryLong($"l_partkey").as("l_partkey"),
          Cleaning.tryDouble($"l_quantity").as("l_quantity"),
          to_timestamp($"l_shipdate", TsFmt).as("l_shipdate")),
      Seq("l_shipdate"))
    Snapshot.overwriteSnapshot(cleaned, s"$work/clean-zone/sheets/catatan_aktivitas")

    // ---- CURATED zone: prescriptive score over cleaned activity +
    // pass-through dims, then snapshot + audit CSV ----
    val cleanLi = s.read.parquet(s"$work/clean-zone/sheets/catatan_aktivitas")
    val result = Scoring.score(cleanLi, Tables.orders(s, dir),
      Tables.events(s, dir), Tables.part(s, dir))
    Snapshot.overwriteSnapshot(result, s"$work/curated-zone/prescriptive_hygiene")
    Snapshot.auditLogCsv(result, s"$work/curated-zone/logs/last_calculation")

    // ---- SERVING: history append (O-10) + snapshot replace (O-11) ----
    Snapshot.appendHistory(result, s"$work/serving/rekomendasi_history")
    Snapshot.overwriteSnapshot(result, s"$work/serving/rekomendasi_snapshot")

    s.read.parquet(s"$work/curated-zone/prescriptive_hygiene")
  }

  /** Driver-contract entry: run the whole pipeline into a unique temp
    * workdir and return the curated result. Shares O-30's oracle — the
    * zone round-trip must be value-exact. */
  def p1Pipeline(s: SparkSession, dir: String): DataFrame = {
    // reclaim previous invocations' zones (each run writes full CSV+parquet
    // copies; repeated rounds would otherwise fill the tmp filesystem)
    val tmpRoot = Paths.get(System.getProperty("java.io.tmpdir"))
    val old = Files.list(tmpRoot)
    try old.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("graft_pipeline_"))
      .foreach { p =>
        try Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(Files.delete(_))
        catch { case _: java.io.IOException => () }
      }
    finally old.close()
    val work = Files.createTempDirectory("graft_pipeline_").toString
    run(s, dir, work)
  }

  val oracles: Map[String, String] = Map(
    "p1_pipeline_e2e" -> Scoring.oracleSql,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_pipeline_e2e" -> p1Pipeline _,
  )
}
