package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.prescriptive.Scoring

/** The §4 semantic quirks of the reference scoring, on hand-built
  * micro-DataFrames (SURVEY.md §5 item 2): empty activity window,
  * empty bath log fallback, empty env tables, null-MET rows.
  */
class ScoringEdgeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def li(rows: (Long, Timestamp, Double)*) =
    rows.toSeq.toDF("l_partkey", "l_shipdate", "l_quantity")
  private def ord(rows: (String, Timestamp)*) =
    rows.toSeq.toDF("o_orderstatus", "o_orderdate")
  private def ev(rows: (Long, Timestamp, String, Double)*) =
    rows.toSeq.toDF("event_id", "ts", "event_type", "value")
  private def prt(rows: (Long, Int, String)*) =
    rows.toSeq.toDF("p_partkey", "p_size", "p_type")

  val env = ev((1L, ts("2020-01-05 00:00:00"), "click", 30.0),
    (2L, ts("2020-01-05 00:00:00"), "view", 80.0),
    (3L, ts("2020-01-05 00:00:00"), "error", 100.0))
  val dims = prt((10L, 40, "PROMO X"), (11L, 20, "STANDARD Y"))

  test("empty activity window still yields one zero-dirtiness row (ref :95-97)") {
    // last F order AFTER every shipment => empty window
    val out = Scoring.score(
      li((10L, ts("2020-01-01 00:00:00"), 5.0)),
      ord(("F", ts("2020-01-10 00:00:00"))), env, dims).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("skor_kekotoran") == 0.0)
    assert(r.getAs[Long]("n_recent") == 0L)
    assert(r.getAs[Long]("n_bau") == 0L)
    // odor still accrues from hours-since-bath + humidity
    assert(r.getAs[Double]("skor_bau") >= 0.0)
  }

  test("empty bath log falls back to min activity ts (ref :78-81)") {
    val out = Scoring.score(
      li((10L, ts("2020-01-02 00:00:00"), 5.0), (11L, ts("2020-01-03 00:00:00"), 2.0)),
      ord(("O", ts("2020-01-04 00:00:00"))), // no 'F' rows => no bath
      env, dims).collect().head
    // last_bath = min ship = 01-02; only the 01-03 activity is "recent"
    assert(out.getAs[Long]("n_recent") == 1L)
    assert(out.getAs[Timestamp]("waktu_mandi_terakhir") == ts("2020-01-02 00:00:00"))
  }

  test("future bath timestamp is clamped to the injected now (ref :84-85)") {
    val out = Scoring.score(
      li((10L, ts("2020-01-01 00:00:00"), 5.0)),
      ord(("F", ts("2030-01-01 00:00:00"))), env, dims).collect().head
    // now = greatest(max ship, max order) = 2030 order... clamp makes
    // last_bath == now => jam_sejak_mandi == 0
    assert(out.getAs[Double]("jam_sejak_mandi") == 0.0)
  }

  test("empty env tables use the reference defaults (ref :99-100,136,151)") {
    val noEnv = ev() // no click/view/error rows at all
    val out = Scoring.score(
      li((10L, ts("2020-01-05 00:00:00"), 6.0)),
      ord(("F", ts("2020-01-01 00:00:00"))), noEnv, dims).collect().head
    // aqi absent => skor_aqi = 0 (NOT min(default/50,10))
    assert(out.getAs[Double]("skor_aqi") == 0.0)
    // humidity absent => 0.5 factor => odor includes +1.0
    val jam = (4 * 24) * 0.3 // 96h * 0.3
    val expectedBau = math.min(jam + 1 * 0.7 + 0.5 * 2, 10.0)
    assert(out.getAs[Double]("skor_bau") == math.rint(expectedBau * 100) / 100)
  }

  test("null-MET rows contribute nothing to dirtiness and are not sweaty (ref :104,125-129)") {
    val partialDims = prt((10L, 40, "PROMO X")) // partkey 99 missing => null met
    val withNull = Scoring.score(
      li((10L, ts("2020-01-05 00:00:00"), 5.0), (99L, ts("2020-01-05 00:00:00"), 500.0)),
      ord(("F", ts("2020-01-01 00:00:00"))), env, partialDims).collect().head
    val without = Scoring.score(
      li((10L, ts("2020-01-05 00:00:00"), 5.0)),
      ord(("F", ts("2020-01-01 00:00:00"))), env, partialDims).collect().head
    assert(withNull.getAs[Double]("skor_kekotoran") == without.getAs[Double]("skor_kekotoran"))
    assert(withNull.getAs[Long]("n_bau") == without.getAs[Long]("n_bau"))
    assert(withNull.getAs[Long]("n_recent") == without.getAs[Long]("n_recent") + 1)
  }
}
