package graft.prescriptive

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables
import graft.ops.{Cleaning, Enrich}

/** O-30 — the weighted "should you shower" prescriptive scoring block
  * (ref `elt/prescriptive/prescriptive_logic.py:95-188`), re-hosted on
  * the driver's star schema (SURVEY.md §7.1):
  *
  *   activity log  = lineitem  (ts=l_shipdate, duration=l_quantity, key=l_partkey)
  *   master dim    = part      (met=p_size/10, category=p_type; "outdoor" token = "promo";
  *                              dim filtered to p_size > 5 so ~10% of
  *                              activities carry a NULL met — exercising
  *                              the reference's missing-MET semantics)
  *   bath log      = orders with o_orderstatus='F' (bath ts = o_orderdate)
  *   env readings  = events    (latest click=temperature, view=humidity, error=aqi)
  *   "now"         = injected clock = greatest(max activity ts, max order ts)
  *                   — never wall-clock `now()` in a tested path (SURVEY.md §7.4)
  *
  * Semantics mirrored exactly from the reference:
  *  - last bath = max(bath ts), fallback min(activity ts), clamped to now
  *    (`prescriptive_logic.py:78-85`)
  *  - dirtiness = round(min(Σ dur·(met/10)·[outdoor→env_factor] / 15, 10), 2)
  *    where env_factor = max(1, (temp/25)·0.6 + (aqi/50)·0.4) (`:99-110`);
  *    NULL met rows contribute nothing (pandas NaN-skipping sum ≡ SQL SUM)
  *  - odor = round(min(0.3·hours_since_bath + 0.7·#sweaty + 2·humidity/100, 10), 2)
  *    where sweaty = met>3 OR outdoor, NULL met → false (`:113-146`)
  *  - aqi score = round(min(aqi/50, 10), 2), 0 when absent (`:151`)
  *  - final = round(0.4·dirt + 0.4·odor + 0.2·aqi, 2) of the *rounded*
  *    components (`:153-154`), tiers at ≥6 / ≥5 / ≥4, odor≥9 override
  *    fires after tiering (`:157-173`)
  *
  * Execution shape (the 100 TB story): one pass over the fact table for
  * the scalar aggregates, one pass for the scored window; every scalar is
  * a 1-row broadcast cross-join (no collect), the dim join is a broadcast
  * hash join, and all arithmetic is whole-stage-codegen Column algebra —
  * no UDFs anywhere.
  */
object Scoring {

  val OutdoorToken = "promo"

  /** The full prescriptive computation as one lazy plan over the driver
    * testdata tables. */
  def hygieneScore(spark: SparkSession, dir: String): DataFrame =
    score(
      Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.events(spark, dir), Tables.part(spark, dir))

  /** Same computation over caller-supplied tables (the pipeline feeds
    * zone-round-tripped inputs through this). */
  def score(li: DataFrame, ord: DataFrame, ev: DataFrame, prt: DataFrame): DataFrame = {
    // --- injected deterministic clock + last-bath scalar (O-29) ---
    val liAgg  = li.agg(max($"l_shipdate").as("max_ship"), min($"l_shipdate").as("min_ship"))
    val ordAgg = ord.agg(
      max($"o_orderdate").as("max_ord"),
      max(when($"o_orderstatus" === "F", $"o_orderdate")).as("max_bath"))
    val clock = liAgg.crossJoin(ordAgg).select(
      date_trunc("second", greatest($"max_ship", $"max_ord")).as("now"),
      date_trunc("second",
        least(coalesce($"max_bath", $"min_ship"), greatest($"max_ship", $"max_ord")))
        .as("last_bath"))

    // --- latest env readings (O-31: top-1 per type, deterministic tiebreak) ---
    // ONE pass over events for all three scalars (round-1 ran three
    // Snapshot.latestRow scans): max over a conditional struct — max
    // skips nulls, struct compares lexicographically on (ts, event_id),
    // so this is exactly ORDER BY ts DESC, event_id DESC LIMIT 1 per type.
    def latestOf(tpe: String) =
      max(when($"event_type" === tpe, struct($"ts", $"event_id", $"value")))
        .getField("value")
    val env = ev.agg(
      latestOf("click").as("temperature"),
      latestOf("view").as("humidity"),
      latestOf("error").as("aqi"))

    // --- master dim (reference aktivitas_joined_master analog) ---
    // met10 = p_size carries the MET score in exact tenths (met = p_size/10)
    val master = prt.filter($"p_size" > 5)
      .select($"p_partkey", ($"p_size" / 10.0).as("met"),
        $"p_size".cast("bigint").as("met10"), $"p_type".as("category"))

    // --- activity window since last bath (O-21) + enrichment (O-26/27) ---
    val recent = li.select($"l_partkey", $"l_shipdate", $"l_quantity".as("dur"))
      .crossJoin(broadcast(clock))
      .filter($"l_shipdate" > $"last_bath")
    val joined = Enrich.enrich(recent, master.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey")
      .crossJoin(broadcast(env))

    val isOutdoor = lower(coalesce($"category", lit(""))).contains(OutdoorToken)
    // per-row contribution dur*(met/10) in EXACT 1e-4 units:
    // dur is 2-decimal and met/10 = p_size/100, so u = round(dur*100)*p_size
    // is an exact bigint. The env factor is a per-run SCALAR, so it
    // factors out of the outdoor subtotal — the whole dirtiness sum
    // becomes two exact integer sums combined with ONE double multiply,
    // making the accumulation immune to partial-agg reassociation
    // (cross-engine and cross-partitioning deterministic).
    val u = (round($"dur" * 100).cast("bigint") * $"met10").as("u")
    val sweaty = when(Cleaning.sweatyPredicate($"met", $"category", OutdoorToken), 1).otherwise(0)

    // GLOBAL aggregate (no grouping): an empty activity window must
    // still yield one zero-score row (ref returns a result even with no
    // activity since the last bath, `prescriptive_logic.py:95-97`) —
    // grouping by the env scalars would emit zero rows instead. Env
    // scalars rejoin afterwards as a 1-row broadcast.
    val envFactor = greatest(lit(1.0),
      (coalesce($"temperature", lit(25.0)) / 25) * 0.6 + (coalesce($"aqi", lit(50.0)) / 50) * 0.4)
    val agg = joined
      .select(u, isOutdoor.as("outdoor"), sweaty.as("sweaty"))
      .agg(
        sum(when(!$"outdoor", $"u")).as("sum_indoor_u"),
        sum(when($"outdoor", $"u")).as("sum_outdoor_u"),
        coalesce(sum($"sweaty"), lit(0L)).as("n_bau"),
        count(lit(1)).as("n_recent"))
      .crossJoin(broadcast(env))
      .withColumn("sum_skor",
        (coalesce($"sum_indoor_u", lit(0L)) + envFactor * coalesce($"sum_outdoor_u", lit(0L)))
          / 10000.0)

    // --- score algebra on the 1-row aggregate ---
    val jam = greatest(lit(0.0),
      (unix_timestamp($"now") - unix_timestamp($"last_bath")) / lit(3600.0))
    val out = agg.crossJoin(broadcast(clock))
      .withColumn("jam_sejak_mandi_raw", jam)
      .withColumn("skor_kekotoran", round(least($"sum_skor" / 15, lit(10.0)), 2))
      .withColumn("skor_bau", round(least(
        $"jam_sejak_mandi_raw" * 0.3 + $"n_bau" * 0.7 + (coalesce($"humidity", lit(50.0)) / 100) * 2,
        lit(10.0)), 2))
      .withColumn("skor_aqi",
        when($"aqi".isNull, lit(0.0)).otherwise(round(least($"aqi" / 50, lit(10.0)), 2)))
      .withColumn("skor_final",
        round($"skor_kekotoran" * 0.4 + $"skor_bau" * 0.4 + $"skor_aqi" * 0.2, 2))
      .withColumn("rekomendasi",
        when($"skor_bau" >= 9.0, lit("WAJIB MANDI (Faktor Bau)"))
          .when($"skor_final" >= 6.0, lit("WAJIB MANDI SEKARANG"))
          .when($"skor_final" >= 5.0, lit("SANGAT DISARANKAN"))
          .when($"skor_final" >= 4.0, lit("MANDI BISA DITUNDA"))
          .otherwise(lit("Tidak Perlu Mandi")))
    out.select(
      $"last_bath".as("waktu_mandi_terakhir"),
      round($"jam_sejak_mandi_raw", 1).as("jam_sejak_mandi"),
      $"skor_kekotoran", $"skor_bau", $"skor_aqi", $"skor_final", $"rekomendasi",
      $"now".as("generated_at"),
      $"n_recent", $"n_bau")
  }

  /** DuckDB oracle twin of [[hygieneScore]] — identical arithmetic,
    * identical token order (fp determinism), identical rounding. */
  val oracleSql: String = s"""
    WITH clock AS (
      SELECT date_trunc('second', greatest(
               (SELECT max(l_shipdate) FROM lineitem),
               (SELECT max(o_orderdate) FROM orders))) AS now,
             date_trunc('second', least(
               coalesce((SELECT max(o_orderdate) FROM orders WHERE o_orderstatus='F'),
                        (SELECT min(l_shipdate) FROM lineitem)),
               greatest((SELECT max(l_shipdate) FROM lineitem),
                        (SELECT max(o_orderdate) FROM orders)))) AS last_bath
    ),
    env AS (
      SELECT
        (SELECT value FROM events WHERE event_type='click' ORDER BY ts DESC, event_id DESC LIMIT 1) AS temperature,
        (SELECT value FROM events WHERE event_type='view'  ORDER BY ts DESC, event_id DESC LIMIT 1) AS humidity,
        (SELECT value FROM events WHERE event_type='error' ORDER BY ts DESC, event_id DESC LIMIT 1) AS aqi
    ),
    masterdim AS (
      SELECT p_partkey, p_size/10.0 AS met, CAST(p_size AS BIGINT) AS met10,
             p_type AS category FROM part WHERE p_size > 5
    ),
    joined AS (
      SELECT l.l_quantity AS dur, m.met, m.met10, m.category
      FROM lineitem l
      CROSS JOIN clock c
      LEFT JOIN masterdim m ON l.l_partkey = m.p_partkey
      WHERE l.l_shipdate > c.last_bath
    ),
    scored AS (
      SELECT CAST(round(dur*100) AS BIGINT) * met10 AS u,
        lower(coalesce(category,'')) LIKE '%$OutdoorToken%' AS outdoor,
        CASE WHEN met > 3.0 OR lower(coalesce(category,'')) LIKE '%$OutdoorToken%'
             THEN 1 ELSE 0 END AS sweaty
      FROM joined
    ),
    agg AS (
      SELECT sum(CASE WHEN NOT outdoor THEN u END) AS sum_indoor_u,
             sum(CASE WHEN outdoor THEN u END) AS sum_outdoor_u,
             CAST(coalesce(sum(sweaty), 0) AS BIGINT) AS n_bau,
             count(*) AS n_recent
      FROM scored
    ),
    base AS (
      SELECT *,
        greatest(0.0, (epoch(now) - epoch(last_bath)) / 3600.0) AS jam_raw,
        round(least(
          ((coalesce(sum_indoor_u, 0) +
            greatest(1.0, (coalesce(temperature,25.0)/25)*0.6 + (coalesce(aqi,50.0)/50)*0.4)
              * coalesce(sum_outdoor_u, 0)) / 10000.0)
          / 15, 10.0), 2) AS skor_kekotoran
      FROM agg CROSS JOIN env CROSS JOIN clock
    ),
    base2 AS (
      SELECT *,
        round(least(jam_raw*0.3 + n_bau*0.7 + (coalesce(humidity,50.0)/100)*2, 10.0), 2) AS skor_bau,
        CASE WHEN aqi IS NULL THEN 0.0 ELSE round(least(aqi/50, 10.0), 2) END AS skor_aqi
      FROM base
    ),
    base3 AS (
      SELECT *, round(skor_kekotoran*0.4 + skor_bau*0.4 + skor_aqi*0.2, 2) AS skor_final
      FROM base2
    )
    SELECT last_bath AS waktu_mandi_terakhir,
           round(jam_raw, 1) AS jam_sejak_mandi,
           skor_kekotoran, skor_bau, skor_aqi, skor_final,
           CASE WHEN skor_bau >= 9.0 THEN 'WAJIB MANDI (Faktor Bau)'
                WHEN skor_final >= 6.0 THEN 'WAJIB MANDI SEKARANG'
                WHEN skor_final >= 5.0 THEN 'SANGAT DISARANKAN'
                WHEN skor_final >= 4.0 THEN 'MANDI BISA DITUNDA'
                ELSE 'Tidak Perlu Mandi' END AS rekomendasi,
           now AS generated_at,
           n_recent, n_bau
    FROM base3
  """
}
