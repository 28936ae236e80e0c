package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time watermark semantics over a multi-batch stream: late data
  * within the watermark is merged; data later than the watermark is
  * dropped. (The file-based st1/st2/st3 queries drain in one batch and
  * cannot exercise lateness — this spec drives the same windowed-agg
  * plan through MemoryStream across batches.)
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("st4 stateful aggregation carries an event-time watermark (bounded state)") {
    val analyzed = graft.streaming.Stream
      .st4Plan(spark, "/root/testdata/sf0.001")
      .queryExecution.analyzed.toString
    assert(analyzed.contains("EventTimeWatermark"),
      "st4 must bound its window state with a watermark:\n" + analyzed.take(2000))
  }

  test("st9 stream-stream join watermarks BOTH sides (bounded buffer precondition)") {
    val analyzed = graft.streaming.Stream
      .st9Plan(spark, "/root/testdata/sf0.001")
      .queryExecution.analyzed.toString
    val n = "EventTimeWatermark".r.findAllIn(analyzed).size
    assert(n == 2, s"expected a watermark on each join side, found $n:\n" +
      analyzed.take(2000))
    assert(analyzed.contains("Join"), analyzed.take(2000))
  }

  test("dropDuplicatesWithinWatermark dedups across batches; expired keys may re-emit (bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val q = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ddw_out").start()
    try {
      // batch 1: id=1 arrives -> emitted; watermark = 10:00 - 10m = 09:50
      input.addData((1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("ddw_out").count() == 1)
      // batch 2: id=1 redelivered within the watermark -> suppressed;
      // id=2 advances watermark to 10:20
      input.addData((1L, ts("2024-01-01 10:01:00")), (2L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      assert(spark.table("ddw_out").count() == 2, "in-watermark redelivery must be suppressed")
      // batch 3: id=1 again, far beyond the dedup horizon — its state
      // expired, so it re-emits: the documented bounded-state tradeoff
      // (dedup guarantees hold WITHIN the watermark, not forever)
      input.addData((1L, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      assert(spark.table("ddw_out").count() == 3,
        "expired key must re-emit - state is bounded by the watermark horizon")
    } finally q.stop()
  }

  test("watermarked aggregation DROPS a row arriving below the watermark (late-data accounting)") {
    // The watermark's other half: st4..st18 replay in time order, where
    // the watermark only closes windows. Here a controlled MemoryStream
    // delivers a row BELOW the advanced watermark: it must neither
    // create a window nor resurrect a closed one, and the drop must be
    // visible in stateOperators.numRowsDroppedByWatermark — the counter
    // a production pipeline watches, because every drop is silent data
    // loss otherwise. (A gate entry over quartile-shuffled file replays
    // was tried and abandoned: the metric counts post-shuffle aggregate
    // groups and the watermark application lags one batch, both too
    // version-specific for a cross-engine oracle. The SEMANTICS pinned
    // here are the stable, documented contract.)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val q = input.toDF().toDF("v", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("v") % 2)
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName("late_drop_out").start()
    try {
      // batch 1: two 09:xx rows; batch 2: a 12:00 row advances the
      // watermark to 11:50, closing and emitting the 09:00 window
      input.addData((1L, ts("2024-01-01 09:05:00")), (2L, ts("2024-01-01 09:10:00")))
      q.processAllAvailable()
      input.addData((3L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      assert(spark.table("late_drop_out").count() == 2,
        "the two 09:00 windows must close once the watermark passes them")
      // batch 3: a 09:20 row — same closed window, now below the
      // watermark: dropped, never re-emitted, counted
      input.addData((1L, ts("2024-01-01 09:20:00")))
      q.processAllAvailable()
      val dropped = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark).sum
      assert(spark.table("late_drop_out").count() == 2,
        "a below-watermark row must not resurrect a closed window")
      assert(dropped >= 1L,
        s"the late row must be counted in numRowsDroppedByWatermark, got $dropped")
    } finally q.stop()
  }

  test("st18: restart on the same checkpoint never re-reads a committed chunk (exactly-once)") {
    // Mini two-drain recovery at sf0.001, mirroring st18CheckpointRecovery,
    // with the checkpoint's file-source log cracked open afterwards: the
    // union of per-batch file lists must cover all 4 chunks with ZERO
    // duplicates — a restart that re-read chunk 1-2 (reprocessing) or
    // reset the offset log (double counting in a non-idempotent sink)
    // fails this on the spot. At least one batch must also come from
    // each drain (the second start RESUMED, it didn't start over).
    val sf = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft_st18spec_").toString
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    ev.repartitionByRange(4, col("ts")).write.parquet(s"$work/stage")
    val parts = new java.io.File(s"$work/stage").listFiles
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/src"))
    def publish(fs: Array[java.io.File], t0: Long): Unit =
      fs.zipWithIndex.foreach { case (f, i) =>
        val dst = java.nio.file.Paths.get(s"$work/src/${f.getName}")
        java.nio.file.Files.move(f.toPath, dst)
        dst.toFile.setLastModified(t0 + i * 60000L)
      }
    val srcSchema = spark.read.parquet(s"$work/stage").schema
    def drainOnce(): Unit = {
      val plan = spark.readStream.schema(srcSchema).parquet(s"$work/src")
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = plan.writeStream.outputMode("append").format("parquet")
        .option("path", s"$work/out")
        .option("checkpointLocation", s"$work/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    publish(parts.take(2), 1700000000000L)
    drainOnce()
    def sourceBatchLogs() = new java.io.File(s"$work/chk/sources/0").listFiles
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    val batchesAfterFirst = sourceBatchLogs().length
    publish(parts.drop(2), 1700003600000L)
    drainOnce()
    val logFiles = sourceBatchLogs()
    val pathRe = """"path":"([^"]+)"""".r
    val logged = logFiles.flatMap(f =>
      pathRe.findAllMatchIn(java.nio.file.Files.readString(f.toPath))
        .map(_.group(1)).toSeq)
    assert(logged.length == 4 && logged.distinct.length == 4,
      s"file-source log must cover the 4 chunks exactly once, got: ${logged.mkString("\n")}")
    assert(batchesAfterFirst >= 1 && logFiles.length > batchesAfterFirst,
      "second drain must APPEND source batches to the same checkpoint, not restart it")
  }

  test("watermarked agg result is invariant to replay chunking (maxFilesPerTrigger=1)") {
    // the same data replayed as FOUR time-ordered micro-batches must
    // produce exactly the single-batch drain's output: watermarks
    // advance per batch, but every event stays >= the watermark of its
    // own batch (files are range-partitioned on ts), so nothing is
    // dropped and the closed-window set depends only on the data.
    // The file source replays in MODIFICATION-TIME order (task
    // completion order, NOT range order — an out-of-order chunk would
    // advance the watermark past earlier chunks and silently drop
    // them; first version of this test proved exactly that), so the
    // production contract is made explicit: mod times are pinned
    // ascending with the time ranges before replay.
    val sf = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft_replay_").toString
    graft.io.Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value"))
      .repartitionByRange(4, col("ts"))
      .write.parquet(s"$work/src")
    val parts = new java.io.File(s"$work/src").listFiles
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1700000000000L + i * 60000L) }
    def drained(maxFiles: Option[Int]): Array[org.apache.spark.sql.Row] = {
      val reader = spark.readStream.schema(
        spark.read.parquet(s"$work/src").schema)
      val src = maxFiles.fold(reader)(n => reader.option("maxFilesPerTrigger", n))
        .parquet(s"$work/src")
      val plan = src.withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"))
      val out = s"$work/out_${maxFiles.getOrElse(0)}"
      val q = plan.writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", s"${out}_chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      spark.read.parquet(out).orderBy("wstart", "event_type").collect()
    }
    val single = drained(None)
    val chunked = drained(Some(1))
    assert(single.nonEmpty && single.sameElements(chunked),
      s"chunked replay diverged: single=${single.length} chunked=${chunked.length}")
  }

  test("session_window merges two open sessions when a bridging late event arrives in-watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s"), col("w.end").as("e"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 1: two events 15 min apart -> TWO open sessions in state
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:15:00")))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "no session closed yet")
      // batch 2: a late bridging event at 10:08 (within 10 min of both)
      // must MERGE the two open sessions into one — the session-specific
      // state mutation plain windows never do
      input.addData((1L, ts("2024-01-01 10:08:00")))
      q.processAllAvailable()
      // batch 3: advance the watermark past the merged session's end
      input.addData((2L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sess_out").filter(col("user_id") === 1).collect()
        .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
      assert(rows.toSeq == Seq(("2024-01-01 10:00:00.0", "2024-01-01 10:25:00.0", 3L)),
        s"late bridge must merge the open sessions: ${rows.toSeq}")
    } finally q.stop()
  }

  test("watermark drops too-late events and admits in-watermark late events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("w.start").as("wstart"), col("n"), col("v"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // batch 1: events in windows 10:00 and 10:10 -> watermark = 10:19-10m = 10:09
      input.addData((ts("2024-01-01 10:05:00"), 1.0), (ts("2024-01-01 10:19:00"), 2.0))
      q.processAllAvailable()
      // batch 2: late-but-in-watermark event for the open 10:10 window,
      // a too-late event for 10:00 (already below watermark... still open
      // until watermark passes window end), and an advancing event
      input.addData(
        (ts("2024-01-01 10:12:00"), 4.0),   // late, window 10:10 still open
        (ts("2024-01-01 10:40:00"), 8.0))   // advances watermark to 10:30
      q.processAllAvailable()
      // windows 10:00 and 10:10 are now finalized (end <= 10:30) and emitted
      val emitted = spark.table("wm_out")
        .orderBy("wstart").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
      assert(emitted.toSeq == Seq(
        ("2024-01-01 10:00:00.0", 1L, 1.0),
        ("2024-01-01 10:10:00.0", 2L, 6.0))) // 2.0 + late 4.0 merged
      // batch 3: an event for window 10:00 — hopelessly late (watermark 10:30) — dropped
      input.addData((ts("2024-01-01 10:01:00"), 100.0))
      q.processAllAvailable()
      val after = spark.table("wm_out").count()
      assert(after == emitted.length, "too-late event must not resurrect a closed window")
    } finally q.stop()
  }

  test("p5 replay: seen-set for batch i excludes its own failed-attempt dir (crash idempotency)") {
    val root = java.nio.file.Files.createTempDirectory("graft_seen_").toString
    try {
      // simulate: batches 0,1 committed; batch 2 wrote its seen dir but
      // CRASHED before the checkpoint commit — the engine replays id 2
      Seq(0, 1, 2).foreach(i => new java.io.File(s"$root/b=$i").mkdirs())
      assert(graft.pipeline.Pipeline.priorSeenDirs(root, 2L) ==
        Seq(s"$root/b=0", s"$root/b=1"),
        "replayed batch must anti-join only against PRIOR batches, " +
        "never its own failed attempt")
      assert(graft.pipeline.Pipeline.priorSeenDirs(root, 0L).isEmpty)
      assert(graft.pipeline.Pipeline.priorSeenDirs(s"$root/missing", 3L).isEmpty)
    } finally {
      new java.io.File(root).listFiles.foreach(_.delete())
      new java.io.File(root).delete()
    }
  }

  test("st13: broadcast and shuffled anti-join regimes drain identical rows (threshold is never a semantics knob)") {
    // The r15 size-conditional broadcast (St13BroadcastSeenMaxBytes)
    // swaps the seen side's join strategy by input size; left_anti
    // results must be plan-invariant, so BOTH regimes are drained at
    // gate SF and compared row-for-row.
    //
    // r16 (ADVICE): at gate SF the seen side is far below the session's
    // default autoBroadcastJoinThreshold, so dropping the hint alone
    // still PLANS a broadcast join — the broadcastSeen=false drain must
    // disable auto-broadcast or the regime comparison is vacuous. The
    // executed micro-batch plan is captured at the drainObserver seam
    // and asserted to actually contain a shuffled join.
    val sf = "/root/testdata/sf0.001"
    val a = graft.streaming.Stream.st13Drained(spark, sf, broadcastSeen = true)
      .collect().toSeq
    val captured = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.execution.SparkPlan]()
    val bcKeys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prevBc = bcKeys.map(k => k -> spark.conf.getOption(k))
    val prevObs = graft.streaming.Stream.drainObserver.get()
    val b = try {
      bcKeys.foreach(spark.conf.set(_, "-1"))
      graft.streaming.Stream.drainObserver.set { q =>
        graft.tools.CodegenAudit.lastStreamingPlan(q).foreach(captured += _)
      }
      graft.streaming.Stream.st13Drained(spark, sf, broadcastSeen = false)
        .collect().toSeq
    } finally {
      graft.streaming.Stream.drainObserver.set(prevObs)
      prevBc.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    assert(a.nonEmpty, "st13 gate drain produced no rows")
    assert(a == b,
      s"regimes disagree: broadcast=${a.size} rows, shuffled=${b.size} rows")
    // anti-vacuity: the shuffled drain's executed micro-batch plans were
    // captured, the anti join really ran as a shuffled join, and no
    // broadcast anti join crept back in via auto-broadcast
    assert(captured.nonEmpty,
      "drainObserver captured no micro-batch plan — the shuffled-regime assert is vacuous")
    val trees = captured.map(_.treeString)
    assert(trees.exists(t =>
        (t.contains("SortMergeJoin") || t.contains("ShuffledHashJoin")) &&
          t.contains("LeftAnti")),
      "no captured micro-batch plan ran the anti join as a shuffled join:\n" +
        trees.map(_.take(2000)).mkString("\n---\n"))
    assert(!trees.exists(t => t.contains("BroadcastHashJoin") && t.contains("LeftAnti")),
      "broadcastSeen=false drain still planned a broadcast anti join — regime check vacuous")
    // and the production picker at gate SF stays on the broadcast plan
    val gateBytes = graft.streaming.Stream.tableBytes(sf, "events")
    assert(gateBytes > 0L &&
      gateBytes <= graft.streaming.Stream.St13BroadcastSeenMaxBytes)
  }
}
