package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet readers for the driver testdata star schema (TESTDATA.md).
  *
  * Mirrors the reference's zone readers (clean/curated Delta reads,
  * reference `elt/prescriptive/prescriptive_logic.py:39-50`) as plain
  * columnar scans: Catalyst pushes predicates and prunes columns into
  * the parquet scan, which is the scale path for 100 TB — never
  * materialize then filter like the reference's `.to_pandas()`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver's events.parquet has shipped `ts` under two encodings:
    * INT64 TIMESTAMP(NANOS) (rounds 1–5; vanilla Spark refuses it —
    * [PARQUET_TYPE_ILLEGAL] — so we read nanos as long and convert) and
    * plain TIMESTAMP(MICROS) without tz (round 6+; Spark infers
    * TIMESTAMP_NTZ, which watermarks and unix_micros reject). Both are
    * normalized HERE, the single batch seam, to TimestampType — the
    * same tz-normalization step the reference performs on every read
    * (`prescriptive_logic.py:43-46`). The session tz is UTC, so the
    * NTZ→TZ cast is value-preserving. Conversion is a pure projection:
    * pushdown/pruning on other columns is unaffected.
    */
  /** Memo of constructed table DataFrames per (session, dir, name).
    * `spark.read.parquet` lists files and reads a footer to infer the
    * schema on EVERY call — a constant metadata tax paid by all ~200
    * gate entries (round-7 advice). The testdata dirs are immutable for
    * a session's lifetime, so the logical plan (file index + schema +
    * ts normalization) is reusable verbatim; execution still re-scans
    * file CONTENT each run, exactly like a catalog table's cached
    * metadata in production. Keyed by session so a restarted session
    * (new file-index invalidation rules) never sees a stale entry. */
  private val tableMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Session-lifecycle hook (round-13 hygiene, generalized): ONE
    * application-end listener per SparkContext, registered from every
    * memoizing entry point — here at the shared table seam, so an app
    * that only ever reads tables/SQL (never a dedup entry) still gets
    * its stopped sessions purged (the r13 first cut hooked only from
    * Dedup's entry points, leaving tableMemo/rawTsMemo/registered to
    * leak in exactly that common case). The listener itself purges
    * only this object's lock-free ConcurrentHashMaps; module purges
    * that must take cache monitors (Dedup's LinkedHashMap caches) are
    * registered as callbacks and run on a DAEMON thread — a memo
    * build can hold its cache monitor for a whole multi-job compute,
    * and blocking the listener-bus thread on it would stall
    * SparkContext.stop() until the build finished. */
  private val evictHooked = java.util.Collections.synchronizedSet(
    new java.util.HashSet[org.apache.spark.SparkContext]())
  private val purgeCallbacks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Modules with their own (session, dir) memos register their
    * stopped-session purge here (Dedup does at object init — an app
    * that never touches Dedup has nothing to purge there either). */
  def registerPurgeCallback(cb: () => Unit): Unit =
    if (!purgeCallbacks.contains(cb)) purgeCallbacks.add(cb)

  /** Effective scan parallelism of `dir/name.parquet`, and the widen
    * predicate built on it (round-13 finding, measured): parquet
    * assigns each ROW GROUP to the byte-split containing its start
    * offset, so a file's non-empty scan tasks are
    * min(planned splits, row groups) — a 520 MB file written by one
    * task holds 4 × 128 MB row groups and runs its scan-stage
    * projection 4-wide on a 32-core box no matter how many byte
    * splits planning reports (probed: `graft.tools.ProbeSplits`).
    * Consumers that run corpus-sized per-row compute INSIDE the scan
    * projection (simhash/shingle digests, ANN dot products) widen
    * with one narrow round-robin exchange when this predicate holds.
    * At cluster scale a corpus is thousands of files/row groups and
    * the branch is dead; it exists so single-box runs over
    * coarse-row-group files (bench dirs, vendor dumps) measure the
    * plan, not the writer's layout. Only order-independent consumers
    * (digest/count/min/bit math) may widen — a round-robin exchange
    * reorders rows, which would move float-sum bits. */
  private val rowGroupMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Integer]()
  private val plannedSplitMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), Integer]()

  def scanStarved(s: SparkSession, dir: String, name: String): Boolean =
    effectiveScanSplits(s, dir, name) < s.sparkContext.defaultParallelism

  /** min(planned FilePartitions, footer row groups); both memoized —
    * `.rdd.getNumPartitions` costs a planning pass and the footer
    * read an open+parse, each paid once per (session,) dir/table.
    * Handles both layouts: the driver's single FILE named
    * `<name>.parquet` and a Spark-written DIRECTORY of part files
    * (row groups summed across parts, listed RECURSIVELY through the
    * Hadoop FileSystem API — a partitioned `key=val/` layout nests its
    * leaves, and the FS API means hdfs://s3a:// paths probe like local
    * ones instead of silently failing through java.io.File; both were
    * r13 ADVICE). If the footer probe fails or finds NO parquet leaves,
    * the row-group bound falls back to "unknown = not limiting"
    * (MaxValue) — the conservative direction: no widen, plan exactly as
    * before the predicate existed. (A literal 0 would be the opposite
    * failure: scanStarved pinned true, the widen exchange taxed onto
    * every consumer of that dir forever.) */
  def effectiveScanSplits(s: SparkSession, dir: String, name: String): Int = {
    val planned = plannedSplitMemo.computeIfAbsent((s, dir, name),
      _ => Integer.valueOf(table(s, dir, name).rdd.getNumPartitions))
    val groups = rowGroupMemo.computeIfAbsent((dir, name), { _ =>
      val conf = s.sessionState.newHadoopConf()
      def footerGroups(p: org.apache.hadoop.fs.Path): Long = {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
        try r.getRowGroups.size.toLong finally r.close()
      }
      scala.util.Try {
        val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        val fs = root.getFileSystem(conf)
        val leaves: Seq[org.apache.hadoop.fs.Path] =
          if (fs.getFileStatus(root).isDirectory) {
            val it = fs.listFiles(root, /* recursive = */ true)
            val buf = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.Path]()
            while (it.hasNext) {
              val f = it.next()
              if (f.isFile && f.getPath.getName.endsWith(".parquet"))
                buf += f.getPath
            }
            buf.toSeq
          } else Seq(root)
        if (leaves.isEmpty) Integer.MAX_VALUE.toLong
        else math.min(leaves.map(footerGroups).sum, Integer.MAX_VALUE.toLong)
      }.toOption.map(n => Integer.valueOf(n.toInt))
        .getOrElse(Integer.valueOf(Integer.MAX_VALUE))
    })
    math.min(planned.intValue(), groups.intValue())
  }

  private[graft] def hookEvictOnStop(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (evictHooked.add(sc)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          purgeStoppedSessions() // lock-free: safe on the bus thread
          if (!purgeCallbacks.isEmpty) {
            val t = new Thread(() => purgeCallbacks.forEach(_.apply()),
              "graft-memo-purge")
            t.setDaemon(true)
            t.start()
          }
          evictHooked.remove(sc)
        }
      })
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    hookEvictOnStop(spark)
    tableMemo.computeIfAbsent((spark, dir, name), { _ =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case Some(org.apache.spark.sql.types.TimestampNTZType) =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    })
  }

  /** Drop memoized plans (file index + schema) for `dir` — the
    * invalidation contract for the immutability assumption above. A
    * caller that rewrites a data dir it also reads through [[table]]
    * MUST call this (Dedup.invalidateSignatureCache cascades here), or
    * the stale file listing yields stale rows / FileNotFoundException.
    * Also forgets view registrations pointing at `dir`, since those
    * views wrap the dropped plans. Pass no dir to clear everything. */
  def invalidateTableCache(dir: String = null): Unit = {
    val it = tableMemo.keySet.iterator()
    while (it.hasNext) { val k = it.next(); if (dir == null || k._2 == dir) it.remove() }
    val rt = rawTsMemo.keySet.iterator()
    while (rt.hasNext) { val k = rt.next(); if (dir == null || k._2 == dir) rt.remove() }
    registered.synchronized {
      val rg = registered.entrySet().iterator()
      while (rg.hasNext) { val e = rg.next(); if (dir == null || e.getValue == dir) rg.remove() }
    }
    val rgm = rowGroupMemo.keySet.iterator()
    while (rgm.hasNext) { val k = rgm.next(); if (dir == null || k._1 == dir) rgm.remove() }
    val ps = plannedSplitMemo.keySet.iterator()
    while (ps.hasNext) { val k = ps.next(); if (dir == null || k._2 == dir) ps.remove() }
  }

  /** Drop memo entries owned by STOPPED sessions (round-13 lifecycle
    * hygiene — called from Dedup's application-end listener so a
    * stopped session's plans don't linger until LRU pressure). */
  def purgeStoppedSessions(): Unit = {
    val it = tableMemo.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    val rt = rawTsMemo.keySet.iterator()
    while (rt.hasNext) if (rt.next()._1.sparkContext.isStopped) rt.remove()
    val rg = registered.keySet.iterator()
    while (rg.hasNext) if (rg.next().sparkContext.isStopped) rg.remove()
    val ps = plannedSplitMemo.keySet.iterator()
    while (ps.hasNext) if (ps.next()._1.sparkContext.isStopped) ps.remove()
    // rowGroupMemo is session-free (keyed by dir/table only)
  }

  /** The documents table (optionally narrowed to `cols` first, so the
    * exchange ships only what the consumer reads), round-robin-widened
    * when [[scanStarved]] says the file's row-group layout would
    * starve a compute-heavy scan projection. ONLY for consumers whose
    * downstream math is order-independent (digest/count/min/bit
    * aggregation, or per-row outputs under a total-order final sort) —
    * the exchange reorders rows, which would move the bits of a float
    * sum. Consumers with order-sensitive float accumulation stay on
    * [[documents]]. */
  def documentsWide(s: SparkSession, dir: String,
      cols: Seq[String] = Nil): DataFrame = {
    val base = documents(s, dir)
    val docs = if (cols.isEmpty) base else base.select(cols.map(col): _*)
    if (scanStarved(s, dir, "documents"))
      docs.repartition(s.sparkContext.defaultParallelism)
    else docs
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view so spark.sql queries (scalar
    * subqueries, view layering) can reference them by name — the same
    * names the DuckDB oracle uses. Memoized on the CURRENT dir per
    * session (not a seen-set): alternating dirs within one session
    * re-registers, so the views always point at the requested dir.
    * The memo is recorded only AFTER all views registered successfully,
    * under a lock — a partial failure or a concurrent caller with a
    * different dir can never leave the memo claiming views it didn't
    * finish creating (round-2 advice). */
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  def registerViews(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != dir) {
        names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
      }
    }

  /** Drop the temp views created by [[registerViews]] and forget the
    * memo. Temp views SHADOW catalog names in resolution, so this is
    * the seam that makes the same SQL text resolve to the
    * [[registerCatalogTables]] stats-bearing relations instead —
    * SqlTwinCboSpec flips it per entry to prove CBO planning changes
    * no result. */
  def unregisterViews(spark: SparkSession): Unit = registered.synchronized {
    names.foreach(n => spark.catalog.dropTempView(n))
    registered.remove(spark)
  }

  /** Catalog-table registration path (round-9 verdict task 4): temp
    * views cannot carry ANALYZE statistics, so entries planned over
    * [[registerViews]] can never be CBO-planned — the stats story
    * ended one step short of the engine's own tables. This registers
    * every zone table as an EXTERNAL catalog table over the same
    * parquet, under the same names the SQL surface uses, then runs
    * `ANALYZE … COMPUTE STATISTICS FOR ALL COLUMNS`: a SQL-twin text
    * now resolves to stats-bearing relations and stats-driven
    * broadcast / CostBasedJoinReorder apply to REAL entries
    * (StorageSpec plan-asserts q7 and o25 through this path). At
    * 100 TB this is the production registration — ANALYZE runs at
    * ingest time and every ad-hoc query planner call consumes the
    * catalog's rowCount/ndv for free.
    *
    * The events table's ts-encoding normalization (the [[table]]
    * seam) is preserved: `events_raw` is the external table, `events`
    * a catalog view applying the same normalization expression. Temp
    * views of the same names are dropped first (temp views shadow
    * catalog names in resolution) and the registerViews memo cleared,
    * so a later registerViews(dir) round-trips cleanly. */
  def registerCatalogTables(s: SparkSession, dir: String,
      analyze: Boolean = true): Unit = {
    registered.synchronized { registered.remove(s) }
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    names.foreach { n =>
      s.catalog.dropTempView(n)
      val tbl = if (n == "events") "events_raw" else n
      // an old run may have left either object kind under either name
      scala.util.Try(s.sql(s"DROP VIEW IF EXISTS $n"))
      scala.util.Try(s.sql(s"DROP TABLE IF EXISTS $tbl"))
      s.sql(s"CREATE EXTERNAL TABLE $tbl USING parquet LOCATION '$dir/$n.parquet'")
      if (n == "events") {
        val raw = s.table("events_raw").schema
        val cols = raw.fields.map { f =>
          if (f.name == "ts") f.dataType match {
            case LongType => "timestamp_micros(ts div 1000) AS ts"
            case org.apache.spark.sql.types.TimestampNTZType =>
              "CAST(ts AS TIMESTAMP) AS ts"
            case _ => "ts"
          } else f.name
        }.mkString(", ")
        s.sql(s"CREATE VIEW events AS SELECT $cols FROM events_raw")
      }
      if (analyze) {
        // table-level stats (rowCount + size) always; column stats
        // only for types ANALYZE supports — embeddings' ARRAY<FLOAT>
        // (and any future nested/binary column) has no ndv/min/max
        // representation in the catalog and would abort the command
        s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
        val statable = s.table(tbl).schema.fields.filterNot(f =>
          f.dataType match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.StructType |
                 org.apache.spark.sql.types.BinaryType => true
            case _ => false
          }).map(f => s"`${f.name}`")
        if (statable.nonEmpty)
          s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS " +
            statable.mkString(", "))
      }
    }
  }

  /** Tear-down twin of [[registerCatalogTables]] (test hygiene — the
    * metastore outlives a suite run). */
  def dropCatalogTables(s: SparkSession): Unit = {
    scala.util.Try(s.sql("DROP VIEW IF EXISTS events"))
    scala.util.Try(s.sql("DROP TABLE IF EXISTS events_raw"))
    names.filterNot(_ == "events")
      .foreach(n => scala.util.Try(s.sql(s"DROP TABLE IF EXISTS $n")))
  }

  /** Streaming reader schema for the events table — the single home of
    * the ts-encoding policy on the streaming path. The driver's testdata
    * has shipped `ts` as both INT64 TIMESTAMP(NANOS) (rounds 1–5) and
    * plain TIMESTAMP(MICROS) (round 6+), so the stream schema's ts type
    * is taken from the actual file footer (one cheap batch footer read)
    * rather than hardcoded: a streaming source needs its schema declared
    * up front, but nothing says it must be declared blind. */
  def eventsStreamSchema(tsType: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", LongType),
      org.apache.spark.sql.types.StructField("ts", tsType),
      org.apache.spark.sql.types.StructField("user_id", LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))

  val documentsStreamSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", LongType)))

  /** Documents as a file-source stream (the ingest feed a curation
    * pipeline consumes) — same drained-replay protocol as
    * [[eventsStream]]. */
  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsStreamSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)

  private val rawTsMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), org.apache.spark.sql.types.DataType]()

  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    hookEvictOnStop(spark) // rawTsMemo is a memo too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Footer read decides the ts encoding; mirrors the batch reader's
    // LongType match so batch and stream always agree on semantics.
    // Memoized per (session, dir): a streaming source needs its schema
    // declared up front, but the footer only needs reading once.
    val rawTsType = rawTsMemo.computeIfAbsent((spark, dir),
      _ => spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType)
    val raw = spark.readStream.schema(eventsStreamSchema(rawTsType))
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    rawTsType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Watermarks demand TIMESTAMP (with tz); session tz is UTC so
        // the NTZ→TZ cast is value-preserving.
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // A new encoding (INT96, tz-annotated nanos, …) must fail loudly
        // at this seam, not propagate unnormalized into watermark logic.
        sys.error(
          s"events.parquet ts has unsupported encoding $other; " +
          "extend Tables.eventsStream/table to normalize it")
    }
  }
}
