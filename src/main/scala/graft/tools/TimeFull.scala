package graft.tools

import org.apache.spark.sql.functions._

/** [[TimeOne]] variant that defeats count-pruning: Catalyst prunes an
  * unconsumed projection under `.count()`, so MAP-ONLY entries (t3,
  * t4, s5, t17 …) time as the scan floor there. Since round 14 the
  * bench path itself shares this contract (`Bench.consumeAll` —
  * TimeOne and the in-suite pass both consume full outputs), so this
  * tool's remaining distinct value is the printed OUTPUT HASH: an A/B
  * respell proves value-identity (`hash=` equal old vs new) and
  * timing in one run. */
object TimeFull {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.session(cpus)
    val (name, dir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 1
    val fn = graft.SparkEntry.queries(name)
    def consume(): Long = {
      val df = fn(spark, dir)
      df.select(max(xxhash64(struct(df.columns.map(col): _*))).as("h"))
        .collect()(0).getLong(0)
    }
    val h0 = consume() // warm
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      consume()
      (System.nanoTime() - t0) / 1e9
    }
    val med = times.sorted.apply(times.size / 2)
    println(f"TIMEDF $name hash=$h0 median=$med%.6f s over $reps reps " +
      times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    scala.util.Try(spark.stop())
  }
}
