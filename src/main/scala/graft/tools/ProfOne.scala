package graft.tools

/** Fresh-JVM phase profiler for a single gate entry (r16 optimization
  * round): splits the entry's wall clock into the EAGER part of
  * `fn(spark, dir)` (for streaming/pipeline entries that is the drain
  * and any zone writes) and the `consumeAll` part (post-drain
  * aggregation + read-back), and — via the [[graft.streaming.Stream.drainObserver]]
  * seam — dumps every micro-batch's duration breakdown
  * (triggerExecution / addBatch / walCommit / state commit) for each
  * drain the entry runs. Measurement-only: no session conf differs
  * from Bench/TimeOne, so the phase split explains the bench medians
  * rather than re-measuring something else.
  *
  * Usage: runMain graft.tools.ProfOne <entry> [sfDir] [reps]
  */
object ProfOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.pipeline.Pipeline.sweepOldWorkDirs(0)
    val spark = graft.Bench.session(cpus)
    val fn = graft.SparkEntry.queries(name)

    // Per-job wall clock + callsite: which ACTION inside a multi-stage
    // entry owns the time (writes, memo builds, audit aggregations).
    val jobs = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
        val interesting = names.filterNot(_.startsWith("$anonfun"))
        val site = (if (interesting.nonEmpty) interesting else names.take(1))
          .take(3).mkString(" | ")
        jobStart.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobStart.remove(e.jobId)
        if (st != null) {
          val ms = (System.nanoTime() - st._1) / 1e6
          if (ms >= 20) jobs.add(f"  job=${e.jobId}%4d ${ms}%8.0f ms  ${st._2}")
        }
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        val run = si.taskMetrics.executorRunTime
        if (wall >= 50) jobs.add(f"  stage=${si.stageId}%4d wall=$wall%6d ms taskSum=$run%6d ms tasks=${si.numTasks}%4d ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })

    val drains = new java.util.concurrent.CopyOnWriteArrayList[String]()
    graft.streaming.Stream.drainObserver.set { q =>
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        val st = p.stateOperators.map(so =>
          s"rows=${so.numRowsTotal}/commitMs=${so.commitTimeMs}").mkString(";")
        drains.add(s"  batch=${p.batchId} in=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
          s"plan=${d.get("queryPlanning")} wal=${d.get("walCommit")} " +
          s"commitOff=${d.get("commitOffsets")} state[$st]")
      }
    }

    (0 to reps).foreach { i =>
      drains.clear(); jobs.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      val (_, n) = graft.Bench.consumeAll(df)
      val t2 = System.nanoTime()
      val tag = if (i == 0) "warm" else s"rep$i"
      println(f"PROF $name $tag eager=${(t1 - t0) / 1e9}%.3f consume=${(t2 - t1) / 1e9}%.3f total=${(t2 - t0) / 1e9}%.3f rows=$n")
      if (i == reps) { drains.forEach(l => println(l)); jobs.forEach(l => println(l)) }
      else drains.forEach(l => println(l))
      System.out.flush()
    }
    graft.streaming.Stream.drainObserver.set(null)
    spark.streams.active.foreach { q =>
      scala.util.Try(q.stop()); scala.util.Try(q.awaitTermination(30000))
    }
    scala.util.Try(spark.stop())
  }
}
