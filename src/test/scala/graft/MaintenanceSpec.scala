package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.maintenance.Maintenance

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("compaction shrinks file count without changing data") {
    val dir = Files.createTempDirectory("graft_compact_").toString + "/t"
    val src = graft.io.Tables.lineitem(spark, sf)
    src.repartition(50).write.parquet(dir) // simulate micro-batch small files
    val (before, _) = Maintenance.fileStats(dir)
    assert(before == 50)
    val sumBefore = spark.read.parquet(dir)
      .agg(sum(round(col("l_extendedprice") * 100).cast("bigint"))).collect().head.getLong(0)
    Maintenance.compact(spark, dir, targetRowsPerFile = 10000)
    val (after, _) = Maintenance.fileStats(dir)
    assert(after == 1, s"expected 1 file after compaction, got $after")
    val d = spark.read.parquet(dir)
    assert(d.count() == 6000)
    assert(d.agg(sum(round(col("l_extendedprice") * 100).cast("bigint")))
      .collect().head.getLong(0) == sumBefore)
  }

  test("mergeUpsert is idempotent: replaying the same batch converges (st7 contract)") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batch = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val once = graft.maintenance.Maintenance.mergeUpsert(target, batch, "k")
    val twice = graft.maintenance.Maintenance.mergeUpsert(once, batch, "k")
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(canon(once) == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    assert(canon(twice) == canon(once), "replay must not duplicate or drift")
  }

  test("snapshot retention keeps only the newest K timestamped objects") {
    val root = Files.createTempDirectory("graft_retain_").toString
    Seq("20010101_000000", "20010102_000000", "20010103_000000").foreach { t =>
      val d = new java.io.File(s"$root/activity_$t"); d.mkdirs()
      Files.writeString(d.toPath.resolve("x.parquet"), "stub")
    }
    new java.io.File(s"$root/not_a_snapshot").mkdirs() // must be untouched
    val (deleted, kept) = Maintenance.retainSnapshots(root, keep = 2)
    assert(deleted == Seq("activity_20010101_000000"))
    assert(kept == Seq("activity_20010102_000000", "activity_20010103_000000"))
    val remaining = new java.io.File(root).listFiles().map(_.getName).sorted
    assert(remaining.toSeq ==
      Seq("activity_20010102_000000", "activity_20010103_000000", "not_a_snapshot"))
  }

  test("mergeUpsert replaces matched keys and appends new ones") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B2"), (9L, "new")).toDF("k", "v")
    val out = Maintenance.mergeUpsert(target, updates, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
  }

  test("mt7 dynamic overwrite rewrites ONLY the patched partition's files") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mt7spec_").toString + "/t"
    Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L), (4L, "d3", 40L))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(root)
    def filesOf(day: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$root/day=$day")
      d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    }
    val d1Before = filesOf("d1"); val d2Before = filesOf("d2")
    Seq((4L, 99L, "d3")).toDF("id", "v", "day")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(root)
    assert(filesOf("d1") == d1Before && filesOf("d2") == d2Before,
      "untouched partitions were rewritten")
    val back = spark.read.parquet(root).select("id", "v").as[(Long, Long)].collect().toMap
    assert(back == Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 99L),
      s"patched table wrong: $back")
  }

  test("mt13 WAP quarantines the poisoned batch and serves only the audited one") {
    // caller-owned work dir: the assertions see THIS run's layout only,
    // never a prior run's leftovers in the global tmpdir
    val work = java.nio.file.Files.createTempDirectory("graft_mt13_spec_").toString
    val row = graft.maintenance.Maintenance
      .mt13WapAt(spark, "/root/testdata/sf0.001", work).collect()(0)
    assert(row.getAs[Int]("good_published") == 1, "clean batch failed to publish")
    assert(row.getAs[Int]("bad_rejected") == 1, "poisoned batch reached the table")
    val names = new java.io.File(work).listFiles().map(_.getName).toSet
    // rejected batch (#2) survives as its quarantine dir for forensics;
    // the published batch (#1) leaves neither staging nor old-snapshot copies
    assert(names.contains("staging_2"), s"rejected batch was not quarantined: $names")
    assert(!names.contains("staging_1"), s"published batch left its staging dir: $names")
    assert(!names.exists(_.startsWith("old_")), s"publish left old snapshot copies: $names")
  }

  test("mt14: a zb-partitioned table answers the 2-D box from exactly the predicted file set") {
    val work = Files.createTempDirectory("graft_mt14spec_").toString
    val b = Maintenance.zorderBuckets(spark, sf)
    b.write.partitionBy("zb").parquet(s"$work/z")
    val table = spark.read.parquet(s"$work/z")
    val box = col("xb").between(4, 7) && col("yb").between(4, 7)
    // the z-buckets the box CAN touch, from the bucketing math alone
    val predicted = b.filter(box).select("zb").distinct()
      .collect().map(_.getInt(0)).toSet
    // a real engine derives zb ranges from the box and adds the
    // partition predicate; partition pruning then skips the rest
    val pruned = table.filter(col("zb").isin(predicted.toSeq: _*) && box)
    // inputFiles ignores filters; the pruning evidence is the executed
    // scan's own "partitions read" metric — which only populates on the
    // queryExecution that actually RAN, so drive toRdd on it directly
    def runAndCount(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = df.queryExecution.toRdd.count()
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      (rows, scan.metrics("numPartitions").value)
    }
    val (nPruned, partsPruned) = runAndCount(pruned)
    assert(partsPruned == predicted.size.toLong,
      s"box scan read $partsPruned partitions, predicted ${predicted.size}")
    val (nFull, partsFull) = runAndCount(table.filter(box))
    assert(partsFull > predicted.size.toLong,
      "control scan without the zb predicate should touch more partitions")
    // and pruning changed no answers
    assert(nPruned == nFull && nPruned == b.filter(box).count(),
      "partition-pruned box disagrees with the unpartitioned scan")
  }
}
