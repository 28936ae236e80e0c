package graft.tools

/** Streaming-entry prober: times an st/p-family entry like [[TimeOne]] and
  * additionally reports per-drain STATE-STORE metrics, captured at the
  * `Stream.drainObserver` seam from each drained query's final
  * progress (r13-verdict task 5: the streaming family's decade claims
  * carried no state memory/spill evidence). For every stateful
  * operator of every drained query it prints rows / memory-used /
  * rows-updated plus the custom-metric spill signals RocksDB exposes,
  * so "state fits / state spills" at a given SF is a recorded fact.
  * One rep is the normal use — state metrics are per-drain, not
  * timing-statistical. */
object StMetrics {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.pipeline.Pipeline.sweepOldWorkDirs(0)
    DiskPreflight.run() // r14 task 4: debris sweep + headroom gate
    val spark = graft.Bench.session(cpus)
    val (name, dir) = (args(0), args(1))
    // r15 task 4: refuse to pin a scan-starved run (the t14 class —
    // fail fast with the widen-eligible message, never record it)
    StarveGuard.check(spark, name, dir)
    val reps = if (args.length > 2) args(2).toInt else 1
    val drains = new java.util.concurrent.atomic.AtomicInteger()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    graft.streaming.Stream.drainObserver.set { q =>
      val d = drains.incrementAndGet()
      val p = q.lastProgress
      if (p != null) {
        lines.add(s"DRAIN#$d batch=${p.batchId} " +
          s"inRows=${p.numInputRows} batchMs=${p.batchDuration}")
        p.stateOperators.zipWithIndex.foreach { case (so, i) =>
          val custom = Option(so.customMetrics).map { cm =>
            val it = cm.entrySet().iterator()
            val b = new StringBuilder
            while (it.hasNext) {
              val e = it.next()
              // keep the signal-bearing metrics; RocksDB exports ~20
              val k = e.getKey
              if (k.contains("Spill") || k.contains("Memory") ||
                  k.contains("memory") || k.contains("BytesOfSst") ||
                  k.contains("pinned"))
                b.append(s" $k=${e.getValue}")
            }
            b.toString
          }.getOrElse("")
          lines.add(s"STATE#$d op=$i name=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} rowsUpdated=${so.numRowsUpdated} " +
            s"memUsedBytes=${so.memoryUsedBytes} commitMs=${so.commitTimeMs}" +
            custom)
        }
      }
    }
    try {
      val fn = graft.SparkEntry.queries(name)
      val (_, n0) = graft.Bench.consumeAll(fn(spark, dir)) // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.consumeAll(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"TIMED $name rows=$n0 median=$med%.6f s over $reps reps " +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      val it = lines.iterator()
      while (it.hasNext) println(it.next())
    } finally {
      graft.streaming.Stream.drainObserver.set(null)
      spark.streams.active.foreach { q =>
        scala.util.Try(q.stop()); scala.util.Try(q.awaitTermination(30000))
      }
      scala.util.Try(spark.stop())
    }
  }
}
