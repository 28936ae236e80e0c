package graft.maintenance

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.io.Tables
import graft.ops.Snapshot

/** Lakehouse-hygiene maintenance operators — the table-upkeep half of
  * the medallion design (the reference gets these implicitly from its
  * full-snapshot overwrites; at 100 TB they are explicit jobs):
  *
  *  - small-file compaction: hourly micro-batch writes leave thousands
  *    of KB-files per partition; scans then pay per-file open cost.
  *    Compact = read → repartition to a target file size → atomic swap.
  *  - snapshot retention: the raw zone's immutable timestamped objects
  *    (`name_YYYYMMDD_HHMMSS`) accumulate forever; keep the newest K.
  *  - merge/upsert: the Delta `MERGE INTO` upgrade path (SURVEY §1.1)
  *    emulated on parquet: anti-join old vs updates + union = upsert,
  *    then snapshot-swap.
  *  - table stats: row counts / file counts / bytes per table — the
  *    inputs every maintenance decision (and the optimizer) needs.
  */
object Maintenance {

  /** Upsert semantics on plain parquet (Delta MERGE emulation): rows of
    * `updates` replace same-key rows of `target`, others append. Pure
    * plan: one anti-join (broadcast when updates are small) + union. */
  def mergeUpsert(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates.select(col(key)).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** Small-file compaction with atomic-ish swap (write aside, then
    * replace) — never overwrites the directory it is reading.
    * `maxFiles` caps the output file count regardless of row count, so
    * a caller can hold an SF-independent layout bound (mt9's audit). */
  def compact(spark: SparkSession, dir: String, targetRowsPerFile: Long,
      maxFiles: Int = Int.MaxValue): Unit = {
    val df = Snapshot.readZone(spark, dir)
    val n = df.count()
    // floor OUTERMOST: a non-positive maxFiles clamps to 1 instead of
    // producing repartition(0)
    val files = math.max(1,
      math.min(maxFiles, math.ceil(n.toDouble / targetRowsPerFile).toInt))
    val tmp = dir + ".compact_tmp"
    df.repartition(files).write.mode(SaveMode.Overwrite).format(Snapshot.ZoneFormat).save(tmp)
    publishSwap(tmp, dir, dir + ".compact_old")
  }

  /** Crash-safe publish: old aside -> new in -> drop old. A failure
    * between the two moves leaves the previous copy recoverable at
    * `oldAside`, never a window with no table at `live`. Shared by
    * compact() and mt13's write-audit-publish. */
  private def publishSwap(newData: String, live: String, oldAside: String): Unit = {
    deleteRecursively(Paths.get(oldAside))
    Files.move(Paths.get(live), Paths.get(oldAside))
    Files.move(Paths.get(newData), Paths.get(live))
    deleteRecursively(Paths.get(oldAside))
  }

  /** Keep the newest K timestamped snapshot objects under a prefix
    * (name-embedded `_YYYYMMDD_HHMMSS` gives the total order, same
    * convention the reference's consumers rely on). Returns
    * (deleted names, kept names) — both name-sorted ascending. */
  def retainSnapshots(root: String, keep: Int): (Seq[String], Seq[String]) = {
    val dirs = Option(new java.io.File(root).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.getName.matches(".*_\\d{8}_\\d{6}$")).sortBy(_.getName)
    val doomed = dirs.dropRight(keep)
    doomed.foreach(d => deleteRecursively(d.toPath))
    (doomed.map(_.getName), dirs.takeRight(keep).map(_.getName))
  }

  def fileStats(dir: String): (Long, Long) = {
    val fs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    (fs.length.toLong, fs.map(_.length).sum)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))

  /** MT-1 — per-table stats (row counts + key cardinalities): the
    * catalog-stat scan every maintenance/optimizer decision reads. */
  def mt1TableStats(s: SparkSession, dir: String): DataFrame = {
    def stat(name: String, keyCol: String) =
      Tables.table(s, dir, name).agg(count(lit(1)).as("n_rows"),
        countDistinct(col(keyCol)).as("n_keys"))
        .select(lit(name).as("table_name"), $"n_rows", $"n_keys")
    stat("lineitem", "l_orderkey")
      .unionAll(stat("orders", "o_orderkey"))
      .unionAll(stat("customer", "c_custkey"))
      .unionAll(stat("part", "p_partkey"))
      .unionAll(stat("events", "event_id"))
      .unionAll(stat("documents", "doc_id"))
      .unionAll(stat("embeddings", "vec_id"))
      .orderBy($"table_name")
  }

  /** MT-2 — merge/upsert as a checkable query: replace the 100 lowest
    * order keys with re-priced rows, append 5 synthetic new ones. */
  def mt2MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val target = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
    val repriced = target.filter($"o_orderkey" <= 100)
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice" * 100).cast("bigint").as("price_c"), lit("U").as("o_orderstatus"))
    val fresh = s.range(1, 6)
      .select((lit(9000000L) + $"id").as("o_orderkey"), lit(1L).as("o_custkey"),
        lit(0L).as("price_c"), lit("N").as("o_orderstatus"))
    val updates = repriced.unionByName(fresh)
    mergeUpsert(
      target.withColumn("price_c", round($"o_totalprice" * 100).cast("bigint"))
        .drop("o_totalprice"),
      updates, "o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"price_c").as("total_c"))
      .orderBy($"o_orderstatus")
  }

  /** MT-3 — join-key skew audit: per candidate shuffle key, the top-5
    * heavy hitters with their row share in ppm. This is the profiling
    * pass that decides WHERE the salting / AQE-skew-join treatment (x3)
    * is needed — at 100 TB you run it on a sample before committing a
    * partitioning. Per key: one partial-agg groupBy + a top-5 window
    * over the (already tiny) group counts; keys are stringified so the
    * audit unions across tables. Shares use integer ppm (div) so the
    * gate is bit-exact. */
  def mt3SkewAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def audit(table: String, key: String) = {
      val g = Tables.table(s, dir, table)
        .groupBy(col(key).cast("string").as("key_value"))
        .agg(count(lit(1)).as("n"))
      val total = g.agg(sum($"n").as("n_total"))
      // top-5 via orderBy+limit -> TakeOrderedAndProject (per-partition
      // heap + tiny merge), NOT a single-partition global window sort;
      // the 5 survivors are then ranked with a trivial window.
      g.crossJoin(total).orderBy($"n".desc, $"key_value").limit(5)
        .withColumn("rk", row_number().over(
          Window.orderBy($"n".desc, $"key_value")))
        .select(lit(s"$table.$key").as("join_key"), $"rk", $"key_value",
          $"n", expr("(n * 1000000) div n_total").as("share_ppm"))
    }
    audit("lineitem", "l_orderkey")
      .unionAll(audit("orders", "o_custkey"))
      .unionAll(audit("events", "user_id"))
      .orderBy($"join_key", $"rk")
  }

  /** MT-4 — referential-integrity audit: orphan counts along the
    * star-schema FK edges (the data-quality gate a lakehouse runs after
    * every ingest — silent orphans skew every downstream join). Each
    * edge is one LEFT ANTI join counted: anti joins BROADCAST the
    * parent's key set when it is dim-sized, and the child side never
    * shuffles for the dim edges; child counts ride the same scan. */
  def mt4FkAudit(s: SparkSession, dir: String): DataFrame = {
    def edge(childT: String, childK: String, parentT: String, parentK: String) = {
      val child = Tables.table(s, dir, childT).select(col(childK).as("ck"))
      val parent = Tables.table(s, dir, parentT).select(col(parentK).as("pk")).distinct()
      val orphans = child.join(parent, $"ck" === $"pk", "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      child.agg(count(lit(1)).as("n_child")).crossJoin(orphans)
        .select(lit(s"$childT.$childK -> $parentT.$parentK").as("fk_edge"),
          $"n_child", $"n_orphan")
    }
    edge("lineitem", "l_orderkey", "orders", "o_orderkey")
      .unionAll(edge("orders", "o_custkey", "customer", "c_custkey"))
      .unionAll(edge("customer", "c_nationkey", "nation", "n_nationkey"))
      .unionAll(edge("events", "user_id", "customer", "c_custkey"))
      .orderBy($"fk_edge")
  }

  /** MT-5 — schema evolution: two ingest batches land with DIFFERENT
    * schemas (an upstream added a column mid-stream — the normal state
    * of a long-lived raw zone), and `mergeSchema` reconciles them at
    * read time into the union schema with nulls for the absent columns.
    * The audit counts per-column presence so silent column loss (the
    * default non-merging read takes one file's schema!) is caught. At
    * 100 TB the same read works because merging is a FOOTER-metadata
    * operation — no data pass. */
  def mt5SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_mt5_").toString
    val ev = Tables.events(s, dir)
    // batch 1: schema (event_id, event_type); batch 2: (event_id, value)
    ev.filter($"event_id" % 2 === 0).select($"event_id", $"event_type")
      .write.mode("append").format(Snapshot.ZoneFormat).save(s"$work/zone")
    ev.filter($"event_id" % 2 === 1)
      .select($"event_id", round($"value" * 100).cast("bigint").as("value_c"))
      .write.mode("append").format(Snapshot.ZoneFormat).save(s"$work/zone")
    s.read.option("mergeSchema", "true").format(Snapshot.ZoneFormat).load(s"$work/zone")
      .agg(count(lit(1)).as("n_rows"),
        count($"event_type").as("n_with_type"),
        count($"value_c").as("n_with_value"),
        sum($"value_c").as("sum_value_c"))
  }

  /** Target file count for MT-6's rewrite (a literal: the write-side
    * repartition bound, and the audit's upper bound on files). */
  val ClusterFiles = 8

  /** MT-6 — clustered-layout rewrite (the OPTIMIZE/Z-ORDER maintenance
    * op of a lakehouse): rewrite a table range-partitioned + sorted on
    * its hot filter key, then AUDIT the resulting layout from the files
    * themselves. Per output file the audit reads (min, max, count) of
    * the cluster key and asserts zero overlapping key ranges across
    * files — the property that lets parquet min/max (and Delta file
    * stats) prune a key-range query to one file instead of all of
    * them. At 100 TB this rewrite is the difference between a point
    * lookup reading ~1/ClusterFiles of the table and reading ALL of it;
    * `repartitionByRange` sampling scales (no global sort), and
    * `sortWithinPartitions` keeps row groups internally ordered so
    * page-level indexes work too. */
  def mt6ClusteredLayout(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_mt6_").toString
    Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate", $"l_quantity")
      .repartitionByRange(ClusterFiles, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey", $"l_shipdate")
      .write.mode(SaveMode.Overwrite).format(Snapshot.ZoneFormat).save(s"$work/t")
    val stats = Snapshot.readZone(s, s"$work/t")
      .groupBy(input_file_name().as("f"))
      .agg(min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi"),
        count(lit(1)).as("n"))
    val totals = stats.agg(
      (count(lit(1)) <= ClusterFiles).cast("int").as("files_le_target"),
      sum($"n").as("n_rows"))
    // ≤ ClusterFiles × ClusterFiles bounded product — the audit joins
    // the per-file stat table (8 rows) against itself for range overlap
    val a = stats.select($"f".as("fa"), $"lo".as("la"), $"hi".as("ha"))
    val b = stats.select($"f".as("fb"), $"lo".as("lb"), $"hi".as("hb"))
    val overlaps = a.join(b, $"fa" < $"fb" && $"la" <= $"hb" && $"lb" <= $"ha")
      .agg(count(lit(1)).as("n_overlap"))
    totals.crossJoin(overlaps)
      .select($"files_le_target", $"n_rows", $"n_overlap")
  }

  /** MT-7 — dynamic partition overwrite (the replaceWhere/backfill op):
    * a day-partitioned table gets one day's data corrected by
    * REWRITING ONLY THAT PARTITION — `partitionOverwriteMode=dynamic`
    * replaces exactly the partitions present in the incoming frame,
    * leaving every other day's files untouched. At 100 TB this is how
    * a backfill touches 1/Nth of the table instead of rewriting it;
    * the patched day is data-derived (max event day) so the op is
    * deterministic at every SF. The audit re-reads the table and
    * proves the patched day carries doubled cents while all other
    * days round-trip unchanged. */
  def mt7PartitionOverwrite(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_mt7_").toString
    val ev = Tables.events(s, dir).select(
      $"event_id", $"ts".cast("date").as("day"),
      round($"value" * 100).cast("bigint").as("value_c"))
    ev.write.mode(SaveMode.Overwrite).partitionBy("day")
      .format(Snapshot.ZoneFormat).save(s"$work/t")
    val maxDay = ev.agg(max($"day").as("md"))
    val patch = ev.crossJoin(broadcast(maxDay)).filter($"day" === $"md")
      .select($"event_id", ($"value_c" * 2).as("value_c"), $"day")
    patch.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").format(Snapshot.ZoneFormat).save(s"$work/t")
    Snapshot.readZone(s, s"$work/t").crossJoin(broadcast(maxDay))
      .groupBy(($"day" === $"md").cast("int").as("is_patched"))
      .agg(countDistinct($"day").as("n_days"), count(lit(1)).as("n_rows"),
        sum($"value_c").as("sum_value_c"))
      .orderBy($"is_patched")
  }

  /** MT-8 — ORC zone round-trip: the second columnar format of the
    * source/sink surface (CSV o1, JSON o8, parquet everywhere, JDBC
    * o2). Orders write as ORC sorted within files on the filter key,
    * read back through a predicate that must reach the ORC reader
    * (`PushedFilters`, StorageSpec-asserted), and aggregate. Proves the
    * zone layer is format-agnostic beyond the `ZoneFormat` constant —
    * on a cluster the swap to ORC (or Delta's parquet) is config, not
    * code. */
  def mt8OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_mt8_").toString
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus",
        round($"o_totalprice" * 100).cast("bigint").as("cents"))
      .sortWithinPartitions($"o_orderstatus")
      .write.mode(SaveMode.Overwrite).orc(s"$work/orders_orc")
    s.read.orc(s"$work/orders_orc")
      .filter($"o_orderstatus" =!= "P") // pushed to the ORC reader
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"cents").cast("bigint").as("sum_cents"),
        min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus")
  }

  /** MT-9 — small-file compaction through the gate (the OPTIMIZE
    * bin-packing op): an hourly micro-batch pattern leaves the zone as
    * 64 KB-sized files (simulated with a round-robin `repartition(64)`
    * write); `compact` rewrites to ~`CompactRowsPerFile`-row files with
    * a crash-safe write-aside + atomic swap, and the audit proves (a)
    * the file count collapsed below the cluster bound, (b) not one row
    * or cent drifted across the rewrite. At 100 TB: per-file open +
    * footer cost dominates scans of a fragmented zone (thousands of
    * KB files per partition); the compaction plan is a single
    * round-robin shuffle sized off row count — no sort, no skew — and
    * on an object store the local-fs dir swap becomes the table
    * format's transactional commit (the `ZoneFormat` seam, §7.2a). */
  def mt9CompactSmallFiles(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_mt9_").toString
    val zone = s"$work/t"
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey",
        round($"l_extendedprice" * 100).cast("bigint").as("price_c"))
      .repartition(64) // fragment: 64 tiny files, the micro-batch smell
      .write.mode(SaveMode.Overwrite).format(Snapshot.ZoneFormat).save(zone)
    val (filesBefore, _) = fileStats(zone)
    // maxFiles holds the audit bound at EVERY SF: past ~1.6M rows the
    // row budget alone would exceed ClusterFiles files
    compact(s, zone, CompactRowsPerFile, maxFiles = ClusterFiles)
    val (filesAfter, _) = fileStats(zone)
    Snapshot.readZone(s, zone).agg(
      count(lit(1)).as("n_rows"),
      sum($"price_c").as("sum_price_c"),
      min($"l_orderkey").as("min_key"),
      max($"l_orderkey").as("max_key"))
      .select($"n_rows", $"sum_price_c", $"min_key", $"max_key",
        lit(filesBefore > ClusterFiles).cast("int").as("fragmented_before"),
        lit(filesAfter <= ClusterFiles).cast("int").as("compacted_after"))
  }

  /** Row budget per compacted file for MT-9: 200k rows ≈ one healthy
    * parquet file at this row width; sf0.1's 600k-row lineitem lands in
    * 3 files, every smaller SF in 1. Beyond ~1.6M rows the audit bound
    * is held by compact's maxFiles cap, not the row budget. */
  val CompactRowsPerFile = 200000L

  /** MT-10 — snapshot retention through the gate: the raw zone's
    * timestamped immutable objects (`name_YYYYMMDD_HHMMSS`, the
    * reference's convention — `elt/clean_sheets.py:42-51` consumers
    * sort by name) accumulate one per pipeline run forever;
    * `retainSnapshots` keeps the newest K and the audit proves the
    * latest snapshot's content survived the purge bit-for-bit while
    * exactly `total - K` objects were deleted. Snapshot timestamps are
    * synthetic literals so the entry is deterministic at every SF. At
    * 100 TB retention is a NAME-ordered metadata operation — no data is
    * read to decide what dies, and each delete is one object-store
    * prefix removal. */
  def mt10SnapshotRetention(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_mt10_").toString
    val orders = Tables.orders(s, dir)
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("bigint").as("price_c"))
    // five runs, each snapshotting a successively wider key slice;
    // the NEWEST name (day 05) carries slices 0..4 of o_orderkey % 10
    (1 to 5).foreach { i =>
      orders.filter($"o_orderkey" % 10 < i)
        .write.mode(SaveMode.Overwrite).format(Snapshot.ZoneFormat)
        .save(f"$work/orders_202601$i%02d_000000")
    }
    val (deleted, survivors) = retainSnapshots(work, keep = 2)
    val latest = survivors.last
    Snapshot.readZone(s, s"$work/$latest").agg(
      count(lit(1)).as("n_rows"), sum($"price_c").as("sum_price_c"))
      .select(
        lit(deleted.size).cast("int").as("n_deleted"),
        lit(survivors.size).cast("int").as("n_kept"),
        lit(latest.endsWith("20260105_000000")).cast("int").as("latest_is_newest"),
        $"n_rows", $"sum_price_c")
  }

  /** MT-11 — orphan-file VACUUM through the gate: failed/interrupted
    * writers leave non-data debris in a zone (staging temp files, crc
    * sidecars, `_started_*` markers); the vacuum identifies everything
    * that is not a live data file or a `_SUCCESS` marker, quarantines
    * it, and the audit proves (a) the expected orphan count was
    * removed, (b) not one data row or cent moved. On plain parquet the
    * manifest is implicit (part-* naming + _SUCCESS); on a table
    * format the same op diffs the file listing against the
    * transaction-log manifest — the seam is the `isDataFile`
    * predicate, nothing else. At 100 TB vacuum is a pure LISTING
    * operation (no data read) and each removal is one object delete. */
  def mt11VacuumOrphans(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_mt11_").toString
    val zone = s"$work/t"
    Tables.orders(s, dir)
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("bigint").as("price_c"))
      .write.mode(SaveMode.Overwrite).format(Snapshot.ZoneFormat).save(zone)
    // plant deterministic debris: a staging temp, an orphan crc, a
    // half-finished writer marker
    val debris = Seq("_started_0001", ".part-orphan.snappy.parquet.crc",
      "_temporary_stage.parquet.tmp")
    debris.foreach { n =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(zone, n), "junk".getBytes("UTF-8"))
    }
    def isDataFile(n: String): Boolean =
      n.startsWith("part-") && n.endsWith(".parquet")
    val all = Option(new java.io.File(zone).listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getName)
    val live = all.filter(n => isDataFile(n) || n == "_SUCCESS").toSet
    // a checksum sidecar (.X.crc) is live iff its base file X is live —
    // the planted .part-orphan crc has no base file, so it IS an orphan
    def isLiveSidecar(n: String): Boolean =
      n.startsWith(".") && n.endsWith(".crc") &&
        live.contains(n.stripPrefix(".").stripSuffix(".crc"))
    val orphans = all.filterNot(n => live.contains(n) || isLiveSidecar(n))
    orphans.foreach(n => java.nio.file.Files.delete(java.nio.file.Paths.get(zone, n)))
    Snapshot.readZone(s, zone).agg(
      count(lit(1)).as("n_rows"), sum($"price_c").as("sum_price_c"))
      .select(
        lit(orphans.length).cast("int").as("n_orphans_removed"),
        $"n_rows", $"sum_price_c")
  }

  /** MT-12 — snapshot DIFF audit (the reconciliation op between two
    * zone versions): classify every key as unchanged / changed /
    * added / removed via ONE full-outer join on the key, with exact
    * cents equality deciding "changed". This is how a backfill or
    * vendor re-delivery is accepted into a lakehouse — the diff
    * summary is reviewed before the swap. The patch here is
    * deterministic and data-derived (re-price every 7th key, drop
    * every 31st, add synthetic keys) so the audit is reproducible at
    * every SF. At 100 TB the join shuffles once on the key and the
    * summary is group-cardinality-sized; with both snapshots bucketed
    * on the key it is exchange-free. */
  def mt12SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select($"o_orderkey".as("k"), round($"o_totalprice" * 100).cast("bigint").as("c"))
    val next = base
      .filter($"k" % 31 =!= 0)                                // removals
      .select($"k", when($"k" % 7 === 0, $"c" * 2).otherwise($"c").as("c")) // changes
      .unionByName(s.range(1, 6).select(
        (lit(8000000L) + $"id").as("k"), lit(100L).as("c")))  // additions
    base.select($"k", $"c".as("ca")).join(
        next.select($"k", $"c".as("cb")), Seq("k"), "full_outer")
      .select(
        when($"ca".isNull, "added")
          .when($"cb".isNull, "removed")
          .when($"ca" === $"cb", "unchanged")
          .otherwise("changed").as("verdict"),
        coalesce($"cb", lit(0L)).as("cb"), $"k")
      .groupBy($"verdict")
      .agg(count(lit(1)).as("n_keys"), sum($"cb").as("sum_next_c"),
        expr("bit_xor(k)").as("key_checksum"))
      .orderBy($"verdict")
  }

  /** MT-13 — write-audit-publish (WAP): no batch reaches the served
    * table without passing its audit ON THE STAGED COPY. A candidate
    * snapshot is written aside, audited where readers can't see it
    * (key completeness, value sanity, non-emptiness), and only a clean
    * audit triggers the atomic publish swap; a dirty batch is
    * quarantined and the live table never observes it. The entry runs
    * one good batch (prices restated ×2 — publishes) and one poisoned
    * batch (nulled keys, negative cents — rejected), then proves the
    * served state is exactly the good version. At 100 TB this is the
    * standard ingestion contract (Iceberg/Delta WAP branches): the
    * audit reads only the staged batch, the swap is a metadata commit,
    * and a bad upstream delivery costs a quarantined directory instead
    * of a corrupted serving zone + backfill. */
  def mt13Wap(s: SparkSession, dir: String): DataFrame = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    mt13WapAt(s, dir, java.nio.file.Files.createTempDirectory("graft_mt13_").toString)
  }

  /** mt13 against a caller-owned work dir, so tests can inspect the
    * quarantine/publish layout of THIS run rather than scanning the
    * global tmpdir for any prior run's leftovers. */
  def mt13WapAt(s: SparkSession, dir: String, work: String): DataFrame = {
    val live = s"$work/t"
    val base = Tables.orders(s, dir).select($"o_orderkey", $"o_orderstatus",
      round($"o_totalprice" * 100).cast("bigint").as("price_c"))
    base.write.mode(SaveMode.Overwrite).format(Snapshot.ZoneFormat).save(live)

    var stagedSeq = 0
    /** Stage → audit → publish-or-quarantine. Returns true iff published. */
    def wap(candidate: DataFrame): Boolean = {
      stagedSeq += 1
      val staging = s"$work/staging_$stagedSeq"
      candidate.write.mode(SaveMode.Overwrite).format(Snapshot.ZoneFormat).save(staging)
      val staged = Snapshot.readZone(s, staging)
      val Row0 = staged.agg(
        count(lit(1)).as("n"),
        sum(($"o_orderkey".isNull || $"price_c" < 0).cast("bigint")).as("bad"))
        .collect()(0)
      val clean = Row0.getLong(0) > 0 && Row0.getLong(1) == 0
      if (clean) publishSwap(staging, live, s"$work/old_$stagedSeq")
      // else: staging stays as the quarantine dir for forensics
      clean
    }

    val goodPublished = wap(base.select($"o_orderkey", $"o_orderstatus",
      ($"price_c" * 2).as("price_c")))
    val badRejected = !wap(base.select(
      when($"o_orderkey" % 100 === 0, lit(null)).otherwise($"o_orderkey").as("o_orderkey"),
      $"o_orderstatus", ($"price_c" * -1).as("price_c")))
    Snapshot.readZone(s, live).agg(
      count(lit(1)).as("n_rows"), sum($"price_c").as("sum_price_c"))
      .select($"n_rows", $"sum_price_c",
        lit(goodPublished).cast("int").as("good_published"),
        lit(badRejected).cast("int").as("bad_rejected"))
  }

  /** Bit-interleave of two 4-bit buckets as portable integer arithmetic
    * (no `<<`/`&`, which the two engines spell differently): the 8-bit
    * Morton/Z value with x in the odd bit positions. `divTok` is the
    * integer-division token (`div` in Spark SQL, `//` in DuckDB). */
  private[graft] def zInterleaveSql(x: String, y: String, divTok: String): String =
    (3 to 0 by -1).flatMap { i =>
      val px = 1 << (2 * i + 1); val py = 1 << (2 * i)
      Seq(s"(($x $divTok ${1 << i}) % 2) * $px",
          s"(($y $divTok ${1 << i}) % 2) * $py")
    }.mkString(" + ")

  /** The bucketed events projection shared by the mt14 gate entry and
    * the physical-layout spec: 4-bit x (user shard) and y (cents mod
    * 16) buckets plus the 16-way z-file id (top 4 interleaved bits =
    * the 4×4 spatial quadrant grid). */
  private[graft] def zorderBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
        expr("CAST(user_id % 16 AS INT)").as("xb"),
        expr("CAST(CAST(round(value * 100) AS BIGINT) % 16 AS INT)").as("yb"))
      .withColumn("zb", expr(s"CAST((${zInterleaveSql("xb", "yb", "div")}) div 16 AS INT)"))

  /** MT-14 — Z-ORDER clustering audit (mt6's multi-dimensional
    * sibling): mt6's range-cluster on ONE key makes single-key lookups
    * cheap but leaves every OTHER predicate scanning all files; a
    * Z-order layout interleaves the bits of two filter columns so file
    * id = z-quadrant, and a 2-D box (or either 1-D slice) touches only
    * the quadrants it overlaps. The entry computes, from the bucketing
    * math alone (all integer, bit-reproducible), how many of the 16
    * files each layout would read: the x-linear layout needs 4/16 files
    * for the 2-D box and ALL 16 for a y-only slice; the z layout needs
    * 1/16 and 4/16 — the asymmetry that justifies the rewrite whenever
    * queries filter on more than one column. At 100 TB this is a
    * rewrite-side op (repartition on zb + min/max stats, mt6's
    * machinery); MaintenanceSpec proves the physical form — a
    * zb-partitioned table answers the box from exactly the predicted
    * file set. */
  def mt14Zorder(s: SparkSession, dir: String): DataFrame = {
    val b = zorderBuckets(s, dir)
    val box = $"xb".between(4, 7) && $"yb".between(4, 7)
    val yonly = $"yb".between(4, 7)
    b.agg(
      sum(box.cast("bigint")).as("n_box"),
      countDistinct(when(box, $"xb")).as("files_linear_box"),
      countDistinct(when(box, $"zb")).as("files_z_box"),
      sum(yonly.cast("bigint")).as("n_yonly"),
      countDistinct(when(yonly, $"xb")).as("files_linear_yonly"),
      countDistinct(when(yonly, $"zb")).as("files_z_yonly"))
  }

  /** MT-15 — declarative CONSTRAINT audit (the data-quality face of
    * mt4's FK audit): primary-key uniqueness and nullability, domain
    * membership, and value-range checks over the orders table, all in
    * ONE aggregate pass — uniqueness via n_rows − countDistinct(key)
    * (no self-join, no groupBy-then-filter second shuffle), the rest
    * as conditional counts fused into the same HashAggregate. This is
    * the CHECK-constraint surface a lakehouse table format declares
    * (Delta CHECK / Iceberg validation) executed as a scan: at 100 TB
    * one pass over the table produces the full violation report, and
    * the same expression set gates a WAP audit (mt13) before publish. */
  def mt15ConstraintAudit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).agg(
      count(lit(1)).as("n_rows"),
      // uniqueness over NON-NULL keys only: count(col) skips NULLs, so
      // NULL-keyed rows land solely in n_null_key, not double-counted
      // here as PK duplicates.
      (count($"o_orderkey") - countDistinct($"o_orderkey")).as("n_dup_key_rows"),
      sum($"o_orderkey".isNull.cast("bigint")).as("n_null_key"),
      sum((!$"o_orderstatus".isin("F", "O", "P")).cast("bigint")).as("n_bad_status"),
      sum(($"o_totalprice" <= 0.0).cast("bigint")).as("n_nonpositive_price"),
      sum($"o_custkey".isNull.cast("bigint")).as("n_null_custkey"))

  val oracles: Map[String, String] = Map(
    "mt15_constraint_audit" ->
      """SELECT count(*) AS n_rows,
                CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
                  AS n_dup_key_rows,
                CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null_key,
                CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
                CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_nonpositive_price,
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null_custkey
         FROM orders""",
    "mt14_zorder" -> {
      val z = zInterleaveSql("xb", "yb", "//")
      s"""WITH b AS (
            SELECT CAST(user_id % 16 AS INT) AS xb,
                   CAST(CAST(round(value * 100) AS BIGINT) % 16 AS INT) AS yb
            FROM events),
          zb AS (SELECT xb, yb, ($z) // 16 AS zb FROM b)
          SELECT CAST(sum(CASE WHEN xb BETWEEN 4 AND 7 AND yb BETWEEN 4 AND 7
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_box,
                 count(DISTINCT CASE WHEN xb BETWEEN 4 AND 7 AND yb BETWEEN 4 AND 7
                                     THEN xb END) AS files_linear_box,
                 count(DISTINCT CASE WHEN xb BETWEEN 4 AND 7 AND yb BETWEEN 4 AND 7
                                     THEN zb END) AS files_z_box,
                 CAST(sum(CASE WHEN yb BETWEEN 4 AND 7 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_yonly,
                 count(DISTINCT CASE WHEN yb BETWEEN 4 AND 7 THEN xb END)
                   AS files_linear_yonly,
                 count(DISTINCT CASE WHEN yb BETWEEN 4 AND 7 THEN zb END)
                   AS files_z_yonly
          FROM zb"""
    },
    "mt13_wap" ->
      """SELECT count(*) AS n_rows,
                CAST(sum(2 * CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_price_c,
                CAST(1 AS INT) AS good_published, CAST(1 AS INT) AS bad_rejected
         FROM orders""",
    "mt11_vacuum_orphans" ->
      """SELECT CAST(3 AS INT) AS n_orphans_removed,
                count(*) AS n_rows,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_price_c
         FROM orders""",
    "mt12_snapshot_diff" ->
      """WITH base AS (
           SELECT o_orderkey AS k,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
         next AS (
           SELECT k, CASE WHEN k % 7 = 0 THEN c * 2 ELSE c END AS c
           FROM base WHERE k % 31 <> 0
           UNION ALL
           SELECT 8000000 + i AS k, 100 AS c FROM generate_series(1, 5) t(i)),
         d AS (
           SELECT coalesce(b.k, n.k) AS k,
                  CASE WHEN b.k IS NULL THEN 'added'
                       WHEN n.k IS NULL THEN 'removed'
                       WHEN b.c = n.c THEN 'unchanged'
                       ELSE 'changed' END AS verdict,
                  coalesce(n.c, 0) AS cb
           FROM base b FULL OUTER JOIN next n ON b.k = n.k)
         SELECT verdict, count(*) AS n_keys,
                CAST(sum(cb) AS BIGINT) AS sum_next_c,
                CAST(bit_xor(k) AS BIGINT) AS key_checksum
         FROM d GROUP BY 1 ORDER BY verdict""",
    "mt9_compact_small_files" ->
      """SELECT count(*) AS n_rows,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
                min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
                CAST(1 AS INT) AS fragmented_before, CAST(1 AS INT) AS compacted_after
         FROM lineitem""",
    "mt10_snapshot_retention" ->
      """SELECT CAST(3 AS INT) AS n_deleted, CAST(2 AS INT) AS n_kept,
                CAST(1 AS INT) AS latest_is_newest,
                count(*) AS n_rows,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
         FROM orders WHERE o_orderkey % 10 < 5""",
    "mt8_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders WHERE o_orderstatus <> 'P'
         GROUP BY 1 ORDER BY o_orderstatus""",
    "mt6_clustered_layout" ->
      """SELECT CAST(1 AS INT) AS files_le_target, count(*) AS n_rows,
                CAST(0 AS BIGINT) AS n_overlap
         FROM lineitem""",
    "mt7_partition_overwrite" ->
      """WITH ev AS (
           SELECT event_id, CAST(ts AS DATE) AS day,
                  CAST(round(value * 100) AS BIGINT) AS value_c
           FROM events),
         m AS (SELECT max(day) AS md FROM ev)
         SELECT CAST(day = (SELECT md FROM m) AS INT) AS is_patched,
                count(DISTINCT day) AS n_days, count(*) AS n_rows,
                CAST(sum(CASE WHEN day = (SELECT md FROM m)
                              THEN value_c * 2 ELSE value_c END) AS BIGINT) AS sum_value_c
         FROM ev GROUP BY 1 ORDER BY is_patched""",
    "mt5_schema_evolution" ->
      """SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_type,
                CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_value,
                CAST(sum(CASE WHEN event_id % 2 = 1
                              THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sum_value_c
         FROM events""",
    "mt4_fk_audit" -> {
      def one(ct: String, ck: String, pt: String, pk: String) =
        s"""SELECT '$ct.$ck -> $pt.$pk' AS fk_edge,
                   (SELECT count(*) FROM $ct) AS n_child,
                   (SELECT count(*) FROM $ct WHERE $ck IS NULL OR $ck NOT IN
                      (SELECT $pk FROM $pt WHERE $pk IS NOT NULL)) AS n_orphan"""
      s"""${one("lineitem", "l_orderkey", "orders", "o_orderkey")}
          UNION ALL ${one("orders", "o_custkey", "customer", "c_custkey")}
          UNION ALL ${one("customer", "c_nationkey", "nation", "n_nationkey")}
          UNION ALL ${one("events", "user_id", "customer", "c_custkey")}
          ORDER BY fk_edge"""
    },
    "mt3_skew_audit" -> {
      def one(table: String, key: String) =
        s"""SELECT '$table.$key' AS join_key, rk, key_value, n,
                   CAST((n * 1000000) // n_total AS BIGINT) AS share_ppm
            FROM (
              SELECT CAST($key AS VARCHAR) AS key_value, count(*) AS n,
                     sum(count(*)) OVER () AS n_total,
                     row_number() OVER (ORDER BY count(*) DESC,
                                        CAST($key AS VARCHAR)) AS rk
              FROM $table GROUP BY 1)
            WHERE rk <= 5"""
      s"""SELECT join_key, CAST(rk AS BIGINT) AS rk, key_value, n, share_ppm FROM (
            ${one("lineitem", "l_orderkey")}
            UNION ALL ${one("orders", "o_custkey")}
            UNION ALL ${one("events", "user_id")})
          ORDER BY join_key, rk"""
    },
    "mt1_table_stats" ->
      """SELECT 'customer' AS table_name, count(*) AS n_rows, count(DISTINCT c_custkey) AS n_keys FROM customer
         UNION ALL SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
         UNION ALL SELECT 'embeddings', count(*), count(DISTINCT vec_id) FROM embeddings
         UNION ALL SELECT 'events', count(*), count(DISTINCT event_id) FROM events
         UNION ALL SELECT 'lineitem', count(*), count(DISTINCT l_orderkey) FROM lineitem
         UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
         UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
         ORDER BY table_name""",
    "mt2_merge_upsert" ->
      """WITH target AS (
           SELECT o_orderkey, o_custkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, o_orderstatus
           FROM orders),
         updates AS (
           SELECT o_orderkey, o_custkey, price_c, 'U' AS o_orderstatus
           FROM target WHERE o_orderkey <= 100
           UNION ALL
           SELECT 9000000 + i, 1, 0, 'N' FROM generate_series(1, 5) t(i)),
         merged AS (
           SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
           UNION ALL SELECT * FROM updates)
         SELECT o_orderstatus, count(*) AS n, CAST(sum(price_c) AS BIGINT) AS total_c
         FROM merged GROUP BY 1 ORDER BY o_orderstatus""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mt1_table_stats" -> mt1TableStats _,
    "mt2_merge_upsert" -> mt2MergeUpsert _,
    "mt3_skew_audit" -> mt3SkewAudit _,
    "mt4_fk_audit" -> mt4FkAudit _,
    "mt5_schema_evolution" -> mt5SchemaEvolution _,
    "mt6_clustered_layout" -> mt6ClusteredLayout _,
    "mt7_partition_overwrite" -> mt7PartitionOverwrite _,
    "mt8_orc_roundtrip" -> mt8OrcRoundtrip _,
    "mt9_compact_small_files" -> mt9CompactSmallFiles _,
    "mt10_snapshot_retention" -> mt10SnapshotRetention _,
    "mt11_vacuum_orphans" -> mt11VacuumOrphans _,
    "mt12_snapshot_diff" -> mt12SnapshotDiff _,
    "mt13_wap" -> mt13Wap _,
    "mt14_zorder" -> mt14Zorder _,
    "mt15_constraint_audit" -> mt15ConstraintAudit _,
  )
}
