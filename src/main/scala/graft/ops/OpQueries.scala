package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables

/** Driver-contract query entries for the operator inventory
  * (SURVEY.md §2.1-2.7, O-1…O-33). Each entry exercises one operator
  * over the driver testdata and has an ANSI-SQL oracle twin (DuckDB).
  *
  * Connector-shaped operators (O-1 CSV sniffing, O-24 malformed guards)
  * run on in-memory fixtures built inside the query — the *parser* is
  * the operator under test, not the transport (zero-egress env,
  * SURVEY.md §7.4).
  */
object OpQueries {

  /** O-1 — permissive CSV source: BOM strip, delimiter inference,
    * drop-malformed rows (ref `ingestion/sheets/sheets_to_raw.py:40-68`).
    * Delimiter sniffing = tiny driver-side probe of the first line, like
    * the reference's csv.Sniffer; parsing itself is distributed. */
  def o1CsvSource(s: SparkSession, dir: String): DataFrame = {
    
    val raw = Seq(
      "﻿Id Col;Total Val", // BOM + header needing normalization
      "1;10.5", "2;20.25", "malformed_single_field", "3;30.75")
    val header = raw.head.replace("﻿", "")
    val sep = Seq(";", ",", "\t", "|").maxBy(d => header.split(java.util.regex.Pattern.quote(d)).length)
    val parsed = s.read
      .option("sep", sep).option("header", "true").option("mode", "DROPMALFORMED")
      .schema("`Id Col` INT, `Total Val` DOUBLE")
      .csv(s.createDataset(raw)(org.apache.spark.sql.Encoders.STRING))
    Cleaning.normalizeColumns(parsed).filter($"id_col".isNotNull).orderBy($"id_col")
  }

  /** O-34 — CSV DIALECT round-trip: the quoting/escaping edge o1's
    * permissive reader never exercises. Fields are made adversarial
    * (embedded commas, double quotes, newlines), written RFC-4180
    * style (quoteAll + doubled-quote escaping), and read back with
    * `multiLine`; the audit aggregates (row count, char volume,
    * distinct content digests, id checksum) must equal the same
    * aggregates computed directly from the source table — any quoting
    * loss changes a digest. Scale note: `multiLine` makes CSV files
    * unsplittable (a record may cross any byte offset), so at 100 TB
    * embedded newlines belong in ESCAPED single-line CSV or a columnar
    * format; this entry is the correctness edge, not the scale path. */
  def o34CsvDialect(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_o34_").toString
    val tricky = Tables.documents(s, dir).select($"doc_id",
      concat(lit("\"start\", "),
        regexp_replace(substring($"text", 1, 80), " ", ",\n")).as("field"))
    tricky.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      // the WRITER trims value whitespace by default — that silently
      // eats field-trailing newlines; a round-trip must write verbatim
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(s"$work/t")
    s.read.option("header", "true").option("multiLine", "true").option("escape", "\"")
      .schema("doc_id LONG, field STRING").csv(s"$work/t")
      .agg(count(lit(1)).as("n_rows"),
        sum(length($"field")).as("sum_chars"),
        countDistinct(md5($"field")).as("n_digests"),
        expr("bit_xor(doc_id)").as("id_checksum"))
  }

  /** O-37 — XML source round-trip over Spark 4's NATIVE StAX datasource
    * (`org.apache.spark.sql.execution.datasources.xml`, the spark-xml
    * package folded into core — no extra jar). Exercises the two
    * XML-specific mappings a columnar round-trip never touches:
    * attribute↔struct-field (`_nation` ↔ `nation="…"` via the default
    * `attributePrefix`) and element-text↔`_VALUE`, plus entity
    * escaping — the text is prefixed with `<tag> & "quoted"` so every
    * row forces `&lt;`/`&amp;`/`&quot;` encoding on write and decoding
    * on read; any escaping loss breaks the value compare. Text is
    * trimmed on both sides (the reader's `ignoreSurroundingSpaces`
    * default) so the gate pins parser semantics, not whitespace.
    * Scale note: XML rows parse per-file via StAX — fine for ingest
    * of many modest files; rewrite to parquet before heavy reuse. */
  def o37XmlSource(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_o37_").toString
    Tables.supplier(s, dir).select(
        $"s_suppkey".cast("long").as("s_key"),
        struct(
          $"s_nationkey".cast("long").as("_nation"),
          concat(lit("<tag> & \"quoted\" "), $"s_name").as("_VALUE")).as("annotation"),
        $"s_acctbal")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("rowTag", "supplier").option("rootTag", "suppliers")
      .format("xml").save(s"$work/t")
    s.read
      .option("rowTag", "supplier")
      .schema("s_key LONG, annotation STRUCT<_VALUE: STRING, _nation: LONG>, s_acctbal DOUBLE")
      .format("xml").load(s"$work/t")
      .select($"s_key",
        $"annotation._nation".as("nation_attr"),
        trim($"annotation._VALUE").as("name_text"),
        $"s_acctbal")
      .orderBy($"s_key")
  }

  /** O-5/O-6 — object-store reader + tz-normalizing table reader: scan
    * with projection/filter pushed into parquet (`PushedFilters`). */
  def o5PushdownScan(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" < lit("2001-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_extendedprice")

  /** O-13 — latest-snapshot pick: global top-1 by (ts, id) without a
    * global sort (ref `elt/clean_sheets.py:42-51`). */
  def o13LatestSnapshot(s: SparkSession, dir: String): DataFrame =
    Snapshot.latestRow(Tables.events(s, dir), "ts", "event_id")
      .select($"event_id", $"event_type", $"value")

  /** O-14 — column normalization round-trip on deliberately messy names
    * (idempotence: norm∘norm = norm). */
  def o14Normalize(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_returnflag", $"l_quantity")
    val messy = li.toDF("﻿ L OrderKey ", "L ReturnFlag", "  l Quantity")
    Cleaning.normalizeColumns(Cleaning.normalizeColumns(messy))
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"),
        sum(round($"l_quantity" * 100).cast("bigint")).as("qty_c"))
      .orderBy($"l_returnflag")
  }

  /** O-15 — timestamp coercion with null-on-error. */
  def o15TryTimestamp(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).agg(
      count(Cleaning.tryTimestamp($"o_orderdate".cast("date").cast("string"))).as("n_ok"),
      count(Cleaning.tryTimestamp($"o_orderpriority")).as("n_bad"))

  /** O-16 — numeric coercion with null-on-error (round-trip + garbage). */
  def o16TryNumeric(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).agg(
      count(Cleaning.tryDouble($"o_orderpriority")).as("n_bad"),
      sum(round(Cleaning.tryDouble($"o_totalprice".cast("string")) * 100).cast("bigint")).as("roundtrip_sum_c"))

  /** O-17 — derive a canonical `timestamp` column from a renamed source
    * column, null-on-error (ref `waktu_mandi` → `timestamp`,
    * `elt/clean_sheets.py:116-117`). Two derives over one scan: a clean
    * date-string column (all parse) and a junk column (none parse) — the
    * asymmetric counts prove coercion, not just column copying. */
  def o17Derive(s: SparkSession, dir: String): DataFrame = {
    val messy = Tables.orders(s, dir).select(
      $"o_orderkey",
      $"o_orderdate".cast("date").cast("string").as("waktu_mandi"),
      $"o_orderpriority".as("junk"))
    val derived = Cleaning.deriveTimestamp(
      Cleaning.deriveTimestamp(messy, "waktu_mandi", "timestamp"), "junk", "junk_ts")
    derived.agg(
      count($"timestamp").as("n_ts"),
      count($"junk_ts").as("n_junk"),
      date_trunc("second", max($"timestamp")).as("max_ts"))
  }

  /** O-18 — prune to serving schema over a derived column. */
  def o18Prune(s: SparkSession, dir: String): DataFrame =
    Cleaning.prune(
      Tables.orders(s, dir).withColumn("generated_at", $"o_orderdate"),
      Seq("o_orderkey", "generated_at", "o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** O-19 — local-clock shift (WITA = UTC+8) on second-truncated ts. */
  def o19TzShift(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      $"event_id",
      Cleaning.toLocalClock(date_trunc("second", $"ts")).as("local_ts"))
      .orderBy($"event_id")

  /** O-20 — null-key drop after coercion (json-path k, then dropna). */
  def o20DropNull(s: SparkSession, dir: String): DataFrame = {
    val withK = Enrich.jsonField(Tables.events(s, dir), "props", "k", "k")
    Cleaning.dropNullKeys(withK, Seq("k"))
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
  }

  /** O-21 — window filter vs cross-table scalar, as a broadcast
    * cross-join of a 1-row aggregate (no collect, no subquery). */
  def o21WindowFilter(s: SparkSession, dir: String): DataFrame = {
    val lastBath = Tables.orders(s, dir)
      .agg(max(when($"o_orderstatus" === "F", $"o_orderdate")).as("last_bath"))
    Tables.lineitem(s, dir).crossJoin(broadcast(lastBath))
      .filter($"l_shipdate" > $"last_bath")
      .agg(count(lit(1)).as("n_after"),
        sum(round($"l_quantity" * 100).cast("bigint")).as("qty_after_c"))
  }

  /** O-22 — boolean row predicate as Column algebra (no UDF). */
  def o22BoolPredicate(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(s, dir)
      .select($"p_partkey".as("l_partkey"), ($"p_size" / 10.0).as("met"), $"p_type".as("category"))
    Enrich.enrich(Tables.lineitem(s, dir), dim, "l_partkey")
      .filter(Cleaning.sweatyPredicate($"met", $"category", "promo"))
      .agg(count(lit(1)).as("n_sweaty"))
  }

  /** O-23 — status guard filter. */
  def o23StatusGuard(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter($"event_type".isin("click", "view", "error"))
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"event_type")

  /** O-24 — malformed-parse guards: count surviving rows + column-count
    * guard on a fixture with broken lines (ref `sheets_to_raw.py:53`). */
  def o24MalformedGuard(s: SparkSession, dir: String): DataFrame = {
    
    val raw = Seq("a,b", "1,2", "oops", "3,4", ",,,,")
    val parsed = s.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema("a INT, b INT").csv(s.createDataset(raw)(org.apache.spark.sql.Encoders.STRING))
    require(parsed.columns.length > 1, "1-column parse rejected (O-24 guard)")
    parsed.filter($"a".isNotNull).agg(count(lit(1)).as("n_rows"), sum($"b").as("sum_b"))
  }

  /** O-25 — fact ⋈ broadcast(dim) enrichment, aggregated by dim attr. */
  def o25JoinEnrich(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(s, dir).select($"p_partkey".as("l_partkey"), $"p_type")
    Enrich.enrich(Tables.lineitem(s, dir), dim, "l_partkey")
      .groupBy($"p_type")
      .agg(sum(round($"l_extendedprice" * 100).cast("bigint") *
          (lit(100L) - round($"l_discount" * 100).cast("bigint"))).as("revenue_c4"),
        count(lit(1)).as("n"))
      .orderBy($"p_type")
  }

  /** O-26 — two-hop dim chain orders⋈customer⋈nation (dirtiness path). */
  def o26JoinChain(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select($"c_custkey".as("o_custkey"), $"c_nationkey")
    val n = Tables.nation(s, dir).select($"n_nationkey".as("c_nationkey"), $"n_name")
    Enrich.enrich(Enrich.enrich(Tables.orders(s, dir), c, "o_custkey"), n, "c_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("bigint")).as("total_c"))
      .orderBy($"n_name")
  }

  /** O-27 — same join chain reused under a different filter (odor path;
    * the reference computes the identical join twice — we share the
    * plan, Catalyst reuses the broadcast exchange). */
  def o27JoinFiltered(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select($"c_custkey".as("o_custkey"), $"c_nationkey")
    val n = Tables.nation(s, dir).select($"n_nationkey".as("c_nationkey"), $"n_name")
    Enrich.enrich(Enrich.enrich(
      Tables.orders(s, dir).filter($"o_orderstatus" === "F"), c, "o_custkey"), n, "c_nationkey")
      .groupBy($"n_name").agg(count(lit(1)).as("n_f_orders"))
      .orderBy($"n_name")
  }

  /** O-28 — serving-table enrichment: full history rows + dim attrs. */
  def o28ServingEnrich(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select($"c_custkey".as("o_custkey"), $"c_name", $"c_nationkey")
    val n = Tables.nation(s, dir).select($"n_nationkey".as("c_nationkey"), $"n_name")
    Enrich.enrich(Enrich.enrich(Tables.orders(s, dir), c, "o_custkey"), n, "c_nationkey")
      .select($"o_orderkey", $"o_totalprice", $"c_name", $"n_name")
      .orderBy($"o_orderkey")
  }

  /** O-29 — scalar max/min with clamp (future-timestamp guard). */
  def o29MinMax(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      date_trunc("second", max($"l_shipdate")).as("max_ship"),
      date_trunc("second", min($"l_shipdate")).as("min_ship"),
      date_trunc("second",
        least(max($"l_shipdate"), lit("2001-09-01 00:00:00").cast("timestamp"))).as("clamped"))

  /** O-31 — latest row per group (window rank=1: the one window fn). */
  def o31LatestPerGroup(s: SparkSession, dir: String): DataFrame =
    Snapshot.latestRowPerGroup(Tables.events(s, dir), "event_type", "ts", "event_id")
      .select($"event_type", $"event_id", $"value")
      .orderBy($"event_type")

  /** O-32 — global sort by time before write. */
  def o32GlobalSort(s: SparkSession, dir: String): DataFrame =
    Snapshot.globalSort(
      Tables.events(s, dir).select($"event_id", date_trunc("second", $"ts").as("ts2"), $"value"),
      "ts2").orderBy($"ts2", $"event_id")

  /** O-33 — nested-array flattening via the built-in Generator
    * (explode), token-frequency shape. */
  def o33Flatten(s: SparkSession, dir: String): DataFrame =
    Enrich.explodeTokens(Tables.documents(s, dir), "text", "token")
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"token")

  /** O-33b — JSON dict-path extraction (ref AQICN `iaqi.pm25.v`). */
  def o33JsonPath(s: SparkSession, dir: String): DataFrame =
    Enrich.jsonField(Tables.events(s, dir), "props", "k", "k")
      .agg(sum($"k").as("sum_k"), count($"k").as("n_k"))

  /** O-35 — raw text-line source (`spark.read.text`): the log-file
    * ingestion shape. Lines land as one `value` column; a codegen'd
    * regexp projection structures them and a null-guard drops
    * unparseable lines (the DROPMALFORMED analogue for free-form
    * text). At 100 TB: text scans split by line on block boundaries so
    * the parse is embarrassingly parallel, and regexp_extract runs
    * inside whole-stage codegen — no UDF in the hot path. */
  def o35TextSource(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_o35_").toString
    val lines = Seq(
      "10.0.0.1 GET /index.html 200 5120",
      "10.0.0.2 GET /img/logo.png 200 814",
      "10.0.0.1 POST /api/login 401 98",
      "#comment: not a log line",
      "10.0.0.3 GET /index.html 304 0")
    java.nio.file.Files.write(java.nio.file.Paths.get(work, "access.log"),
      lines.mkString("\n").getBytes("UTF-8"))
    val re = "^(\\S+) (GET|POST|PUT|DELETE) (\\S+) (\\d{3}) (\\d+)$"
    s.read.text(s"$work/access.log").select(
      regexp_extract($"value", re, 1).as("host"),
      regexp_extract($"value", re, 2).as("method"),
      regexp_extract($"value", re, 3).as("path"),
      regexp_extract($"value", re, 4).cast("int").as("status"),
      regexp_extract($"value", re, 5).cast("bigint").as("bytes"))
      .filter($"host" =!= "")
      .orderBy($"host", $"path")
  }

  /** O-36 — PERMISSIVE JSON ingestion with a corrupt-record column:
    * the raw-zone contract that malformed upstream lines are KEPT, not
    * dropped (o1/o24 carry the DROPMALFORMED face; this is the
    * quarantine face). Parseable lines land typed, unparseable ones
    * land whole in `_corrupt_record` for replay/forensics — at 100 TB
    * silent drops are unauditable, so production raw zones ingest
    * permissive and route the corrupt column to a quarantine sink. The
    * frame is cached before the audit: Spark refuses queries that
    * reference ONLY the corrupt column on the lazy raw scan. */
  def o36CorruptRecord(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_o36_").toString
    val lines = Seq(
      """{"id": 1, "v": 10}""",
      """{"id": 2, "v": 20}""",
      """{"id": 3, "v": }""",
      """not json at all""",
      """{"id": 5, "v": 50}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(work, "batch.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val parsed = s.read
      .schema("id BIGINT, v BIGINT, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$work/batch.jsonl")
    parsed.agg(
      count(lit(1)).as("n_rows"),
      count($"_corrupt_record").as("n_corrupt"),
      sum($"v").as("sum_v"),
      max(length($"_corrupt_record")).as("max_corrupt_len"))
  }

  val oracles: Map[String, String] = Map(
    "o36_corrupt_record" ->
      """SELECT CAST(5 AS BIGINT) AS n_rows, CAST(2 AS BIGINT) AS n_corrupt,
                CAST(80 AS BIGINT) AS sum_v, CAST(16 AS INT) AS max_corrupt_len""",
    "o35_text_source" ->
      """SELECT host, method, path, CAST(status AS INT) AS status,
                CAST(bytes AS BIGINT) AS bytes
         FROM (VALUES ('10.0.0.1', 'GET', '/index.html', 200, 5120),
                      ('10.0.0.1', 'POST', '/api/login', 401, 98),
                      ('10.0.0.2', 'GET', '/img/logo.png', 200, 814),
                      ('10.0.0.3', 'GET', '/index.html', 304, 0))
           AS t(host, method, path, status, bytes)
         ORDER BY host, path""",
    "o1_csv_source" ->
      """SELECT CAST(id_col AS INT) AS id_col, CAST(total_val AS DOUBLE) AS total_val
         FROM (VALUES (1, 10.5), (2, 20.25), (3, 30.75)) AS t(id_col, total_val)
         ORDER BY id_col""",
    "o34_csv_dialect" ->
      """WITH f AS (
           SELECT doc_id,
                  '"start", ' || replace(substr(text, 1, 80), ' ', ',' || chr(10))
                    AS field
           FROM documents)
         SELECT count(*) AS n_rows,
                CAST(sum(length(field)) AS BIGINT) AS sum_chars,
                count(DISTINCT md5(field)) AS n_digests,
                CAST(bit_xor(doc_id) AS BIGINT) AS id_checksum
         FROM f""",
    "o37_xml_source" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_key,
                CAST(s_nationkey AS BIGINT) AS nation_attr,
                trim('<tag> & "quoted" ' || s_name) AS name_text,
                s_acctbal
         FROM supplier ORDER BY s_key""",
    "o5_pushdown_scan" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
         WHERE l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
         ORDER BY l_orderkey, l_extendedprice""",
    "o13_latest_snapshot" ->
      """SELECT event_id, event_type, value FROM events
         ORDER BY ts DESC, event_id DESC LIMIT 1""",
    "o14_normalize" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "o15_try_timestamp" ->
      """SELECT count(TRY_CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS TIMESTAMP)) AS n_ok,
                count(TRY_CAST(o_orderpriority AS TIMESTAMP)) AS n_bad FROM orders""",
    "o16_try_numeric" ->
      """SELECT count(TRY_CAST(o_orderpriority AS DOUBLE)) AS n_bad,
                CAST(sum(CAST(round(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)
                  AS roundtrip_sum_c
         FROM orders""",
    "o17_derive" ->
      """SELECT count(TRY_CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS TIMESTAMP)) AS n_ts,
                count(TRY_CAST(o_orderpriority AS TIMESTAMP)) AS n_junk,
                date_trunc('second', max(TRY_CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS TIMESTAMP))) AS max_ts
         FROM orders""",
    "o18_prune" ->
      "SELECT o_orderkey, o_orderdate AS generated_at, o_totalprice FROM orders ORDER BY o_orderkey",
    "o19_tz_shift" ->
      """SELECT event_id, date_trunc('second', ts) + INTERVAL 8 HOUR AS local_ts FROM events
         ORDER BY event_id""",
    "o20_drop_null" ->
      """SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k FROM (
           SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
         WHERE k IS NOT NULL""",
    "o21_window_filter" ->
      """SELECT count(*) AS n_after,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_after_c FROM lineitem
         WHERE l_shipdate > (SELECT max(o_orderdate) FROM orders WHERE o_orderstatus = 'F')""",
    "o22_bool_predicate" ->
      """SELECT count(*) AS n_sweaty FROM lineitem l
         LEFT JOIN part p ON l.l_partkey = p.p_partkey
         WHERE p.p_size / 10.0 > 3.0 OR lower(coalesce(p.p_type, '')) LIKE '%promo%'""",
    "o23_status_guard" ->
      """SELECT event_type, count(*) AS n FROM events
         WHERE event_type IN ('click', 'view', 'error')
         GROUP BY 1 ORDER BY event_type""",
    "o24_malformed_guard" ->
      "SELECT CAST(2 AS BIGINT) AS n_rows, CAST(6 AS BIGINT) AS sum_b",
    "o25_join_enrich" ->
      """SELECT p.p_type,
                CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
                    (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4,
                count(*) AS n FROM lineitem l
         LEFT JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1 ORDER BY p_type""",
    "o26_join_chain" ->
      """SELECT n.n_name, count(*) AS n_orders,
                CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
         FROM orders o
         LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1 ORDER BY n_name""",
    "o27_join_filtered" ->
      """SELECT n.n_name, count(*) AS n_f_orders FROM orders o
         LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE o.o_orderstatus = 'F'
         GROUP BY 1 ORDER BY n_name""",
    "o28_serving_enrich" ->
      """SELECT o.o_orderkey, o.o_totalprice, c.c_name, n.n_name FROM orders o
         LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         ORDER BY o_orderkey""",
    "o29_minmax" ->
      """SELECT date_trunc('second', max(l_shipdate)) AS max_ship,
                date_trunc('second', min(l_shipdate)) AS min_ship,
                date_trunc('second', least(max(l_shipdate), TIMESTAMP '2001-09-01 00:00:00')) AS clamped
         FROM lineitem""",
    "o31_latest_per_group" ->
      """SELECT event_type, event_id, value FROM (
           SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY event_type""",
    "o32_global_sort" ->
      """SELECT event_id, date_trunc('second', ts) AS ts2, value FROM events
         ORDER BY ts2, event_id""",
    "o33_flatten" ->
      """SELECT token, count(*) AS n FROM (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         WHERE token <> '' GROUP BY 1 ORDER BY token""",
    "o33_json_path" ->
      """SELECT CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_k FROM (
           SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o1_csv_source" -> o1CsvSource _,
    "o34_csv_dialect" -> o34CsvDialect _,
    "o35_text_source" -> o35TextSource _,
    "o37_xml_source" -> o37XmlSource _,
    "o36_corrupt_record" -> o36CorruptRecord _,
    "o5_pushdown_scan" -> o5PushdownScan _,
    "o13_latest_snapshot" -> o13LatestSnapshot _,
    "o14_normalize" -> o14Normalize _,
    "o15_try_timestamp" -> o15TryTimestamp _,
    "o16_try_numeric" -> o16TryNumeric _,
    "o17_derive" -> o17Derive _,
    "o18_prune" -> o18Prune _,
    "o19_tz_shift" -> o19TzShift _,
    "o20_drop_null" -> o20DropNull _,
    "o21_window_filter" -> o21WindowFilter _,
    "o22_bool_predicate" -> o22BoolPredicate _,
    "o23_status_guard" -> o23StatusGuard _,
    "o24_malformed_guard" -> o24MalformedGuard _,
    "o25_join_enrich" -> o25JoinEnrich _,
    "o26_join_chain" -> o26JoinChain _,
    "o27_join_filtered" -> o27JoinFiltered _,
    "o28_serving_enrich" -> o28ServingEnrich _,
    "o29_minmax" -> o29MinMax _,
    "o31_latest_per_group" -> o31LatestPerGroup _,
    "o32_global_sort" -> o32GlobalSort _,
    "o33_flatten" -> o33Flatten _,
    "o33_json_path" -> o33JsonPath _,
  )
}
