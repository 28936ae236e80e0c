package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._

/** O-3/O-4 — REST JSON sources (ref BMKG weather
  * `ingestion/api_bmkg/bmkg_to_raw.py:40-57`, AQICN
  * `ingestion/api_aqicn/aqicn_to_raw.py:28-38`): the transport (HTTP
  * GET) is driver-side and zero-egress here, so the payload is a
  * verbatim fixture — the operator under test is the schema-on-read
  * parse + 3-level nested-array flatten (`elt/clean_bmkg.py:59-71`)
  * and the dict-path + status-guard extraction
  * (`elt/clean_aqicn.py:56-70`).
  *
  * The flatten is the built-in Catalyst Generator (explode ×3): at
  * scale each payload row fans out independently — a narrow map-side
  * op, no shuffle.
  */
object RestJson {

  /** Verbatim BMKG-shaped payload (data[].cuaca[][] 3-deep) — ONE
    * constant shared by the Spark query and the DuckDB oracle. */
  val BmkgPayload: String =
    """{"data":[{"cuaca":[[{"datetime":"2024-01-01 00:00:00","t":28.5,"hu":80.0,"weather_desc":"Cerah","ws":3.1},
      |{"datetime":"2024-01-01 03:00:00","t":27.0,"hu":85.0,"weather_desc":"Hujan Ringan","ws":4.0}],
      |[{"datetime":"2024-01-02 00:00:00","t":29.0,"hu":70.0,"weather_desc":"Cerah Berawan","ws":2.0},
      |{"datetime":"2024-01-02 03:00:00","t":26.5,"hu":90.0,"weather_desc":"Hujan","ws":5.5}]]}]}"""
      .stripMargin.replace("\n", "")

  /** AQICN-shaped payload: status guard + nested dict-path `iaqi.pm25.v`. */
  val AqicnPayload: String =
    """{"status":"ok","data":{"aqi":57,"iaqi":{"pm25":{"v":57.0},"h":{"v":62.0},"t":{"v":30.1}},"city":{"name":"Balikpapan"}}}"""

  val AqicnBadPayload: String = """{"status":"error","data":{"aqi":-1}}"""

  private val bmkgSchema =
    "STRUCT<data: ARRAY<STRUCT<cuaca: ARRAY<ARRAY<STRUCT<datetime: STRING, t: DOUBLE, hu: DOUBLE, weather_desc: STRING, ws: DOUBLE>>>>>>"

  /** O-3 — BMKG parse + triple explode + sort (O-32). */
  def o3BmkgSource(s: SparkSession, dir: String): DataFrame = {
    val raw = s.createDataset(Seq(BmkgPayload))(org.apache.spark.sql.Encoders.STRING).toDF("j")
    raw.select(from_json($"j", org.apache.spark.sql.types.DataType.fromDDL(bmkgSchema)).as("s"))
      .select(explode($"s.data").as("d"))
      .select(explode($"d.cuaca").as("cc"))
      .select(explode($"cc").as("c"))
      .select(to_timestamp($"c.datetime").as("datetime"), $"c.t", $"c.hu",
        $"c.weather_desc", $"c.ws")
      .orderBy($"datetime")
  }

  /** O-4/O-23 — AQICN parse: status guard rejects the bad payload, then
    * dict-path extraction. */
  def o4AqicnSource(s: SparkSession, dir: String): DataFrame = {
    val raw = s.createDataset(Seq(AqicnPayload, AqicnBadPayload))(
      org.apache.spark.sql.Encoders.STRING).toDF("j")
    raw.select(
        get_json_object($"j", "$.status").as("status"),
        get_json_object($"j", "$.data.aqi").try_cast("double").as("aqi"),
        get_json_object($"j", "$.data.iaqi.pm25.v").try_cast("double").as("pm25"),
        get_json_object($"j", "$.data.iaqi.h.v").try_cast("double").as("humidity"),
        get_json_object($"j", "$.data.city.name").as("city"))
      .filter($"status" === "ok")
  }

  val oracles: Map[String, String] = {
    val j = BmkgPayload.replace("'", "''")
    Map(
      "o3_bmkg_source" ->
        s"""WITH raw AS (SELECT '$j' AS j),
            typed AS (SELECT json_transform(j,
              '{"data":[{"cuaca":[[{"datetime":"VARCHAR","t":"DOUBLE","hu":"DOUBLE","weather_desc":"VARCHAR","ws":"DOUBLE"}]]}]}') AS s
              FROM raw),
            lvl1 AS (SELECT unnest(s.data) AS d FROM typed),
            lvl2 AS (SELECT unnest(d.cuaca) AS cc FROM lvl1),
            lvl3 AS (SELECT unnest(cc) AS c FROM lvl2)
            SELECT try_cast(c.datetime AS TIMESTAMP) AS datetime, c.t AS t, c.hu AS hu,
                   c.weather_desc AS weather_desc, c.ws AS ws
            FROM lvl3 ORDER BY datetime""",
      "o4_aqicn_source" -> {
        val ok = AqicnPayload.replace("'", "''")
        val bad = AqicnBadPayload.replace("'", "''")
        s"""WITH raw AS (SELECT unnest(['$ok', '$bad']) AS j)
            SELECT json_extract_string(j, '$$.status') AS status,
                   try_cast(json_extract_string(j, '$$.data.aqi') AS DOUBLE) AS aqi,
                   try_cast(json_extract_string(j, '$$.data.iaqi.pm25.v') AS DOUBLE) AS pm25,
                   try_cast(json_extract_string(j, '$$.data.iaqi.h.v') AS DOUBLE) AS humidity,
                   json_extract_string(j, '$$.data.city.name') AS city
            FROM raw WHERE json_extract_string(j, '$$.status') = 'ok'"""
      },
    )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o3_bmkg_source" -> o3BmkgSource _,
    "o4_aqicn_source" -> o4AqicnSource _,
  )
}
