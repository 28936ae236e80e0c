package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic crash injection inside a micro-batch (round-9 verdict
  * task 6): st18 proves CLEAN two-start recovery — query 1 terminates
  * normally, query 2 resumes. Nobody had killed a query MID-batch,
  * which is the failure a 100 TB pipeline actually takes: an executor
  * OOM or preemption lands after the source offsets are committed to
  * the WAL but before the sink commits the batch. This spec plants
  * that failure deterministically and proves exactly-once output
  * survives it, on both state-store providers.
  *
  * Mechanics: Spark writes batch N's offsets to the checkpoint's
  * offset log BEFORE running the batch, so a throw inside foreachBatch
  * IS the "after source commit / before sink commit" crash window.
  * Two variants cover both sides of the sink write:
  *   - `beforeWrite` — the batch dies before any output lands
  *     (pure replay on restart);
  *   - `afterWrite`  — the batch's output is fully written and THEN
  *     the failure hits, so restart re-runs a batch whose output
  *     already exists — the case that double-counts unless the sink
  *     is idempotent. The sink here is the per-batch-id overwrite dir
  *     (st15's protocol: mode("overwrite").save(s"…/b=$batchId")),
  *     which is how a foreachBatch zone append is made exactly-once.
  *
  * The pipeline is st4's shape (watermarked hourly agg, append mode)
  * over a 4-chunk ts-ranged backlog with pinned mod times (st18's
  * replay protocol) and maxFilesPerTrigger=1, so the crash lands in a
  * mid-backlog batch with real state (open windows) in the store. The
  * restarted drain's union output must equal st4's own entry output
  * bit for bit — the same oracle st4/st18 pass at every gate SF.
  */
object CrashInjector {
  /** (armedAtBatchId, afterWrite). Cleared by the throw — the restart
    * must NOT crash again.
    *
    * Concurrency contract (round-10 ADVICE): this is process-global
    * mutable state, and the spec also mutates shared-session confs
    * around each run. That is race-free because sbt runs suites in the
    * forked test JVM SEQUENTIALLY (`testForkedParallel` defaults to
    * false, and this build does not override it) and each test drains
    * its query to completion before returning. If suite-level
    * parallelism is ever enabled, key the armed state by the query's
    * checkpoint/work dir so concurrent queries cannot consume each
    * other's injection. */
  val armed = new AtomicReference[Option[(Long, Boolean)]](None)
}

class CrashRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def st4Reference: Seq[String] =
    SparkEntry.queries("st4_watermark_append")(spark, sf)
      .collect().toSeq.map(_.toString).sorted

  /** Stage events as 4 ts-range chunk files, mod times ascending. */
  def stage(work: String): Unit = {
    import spark.implicits._
    val ev = graft.io.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"event_type", $"value")
    ev.repartitionByRange(4, $"ts").write.parquet(s"$work/stage")
    val parts = new java.io.File(s"$work/stage").listFiles
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/src"))
    parts.zipWithIndex.foreach { case (f, i) =>
      val dst = java.nio.file.Paths.get(s"$work/src/${f.getName}")
      java.nio.file.Files.move(f.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
  }

  /** One drain attempt over the staged backlog; returns normally or
    * rethrows the query failure. */
  def drain(work: String): Unit = {
    import spark.implicits._
    val plan = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/src")
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("bigint")).as("sum_value_c"))
      .select($"w.start".as("wstart"), $"event_type", $"n", $"sum_value_c")
    val q = plan.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$work/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        def write(): Unit =
          batch.write.mode("overwrite").parquet(s"$work/out/b=$batchId")
        CrashInjector.armed.get() match {
          case Some((at, afterWrite)) if batchId >= at =>
            CrashInjector.armed.set(None) // one-shot: restart survives
            if (afterWrite) write()
            throw new RuntimeException(s"injected crash at batch $batchId")
          case _ => write()
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
  }

  def crashRun(afterWrite: Boolean): Seq[String] = {
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_crash_").toString
    stage(work)
    CrashInjector.armed.set(Some((2L, afterWrite)))
    val failure = intercept[StreamingQueryException] { drain(work) }
    assert(failure.getMessage.contains("injected crash") ||
      Option(failure.getCause).exists(_.getMessage.contains("injected crash")),
      s"query died for the wrong reason: ${failure.getMessage}")
    assert(CrashInjector.armed.get().isEmpty, "the injected crash never fired")
    drain(work) // restart on the same checkpoint — must complete clean
    spark.read.parquet(s"$work/out")
      .select(col("wstart"), col("event_type"), col("n"), col("sum_value_c"))
      .collect().toSeq.map(_.toString).sorted
  }

  val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  // "rocksdb+changelog" is the full production durability stack: the
  // restart must rebuild state by REPLAYING per-commit changelogs from
  // the checkpoint, under a crash that interrupted a commit cycle.
  for {
    provider <- Seq("heap", "rocksdb", "rocksdb+changelog")
    afterWrite <- Seq(false, true)
  } {
    val label = if (afterWrite) "crash after sink write" else "crash before sink write"
    test(s"$label, $provider provider: restart on the same checkpoint is exactly-once") {
      val keys = Seq(ProviderKey, ChangelogKey)
      val prev = keys.map(k => k -> spark.conf.getOption(k))
      if (provider.startsWith("rocksdb")) spark.conf.set(ProviderKey, RocksDb)
      if (provider.endsWith("changelog")) spark.conf.set(ChangelogKey, "true")
      try {
        val got = crashRun(afterWrite)
        val want = st4Reference
        assert(got.size == want.size,
          s"row count after recovery: got=${got.size} want=${want.size}")
        assert(got == want, "recovered output diverged from st4's reference")
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
