package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (name, dir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 1
    val fn = graft.SparkEntry.queries(name)
    val n0 = fn(spark, dir).count() // warm
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val med = times.sorted.apply(times.size / 2)
    println(f"TIMED $name rows=$n0 median=$med%.3f s over $reps reps " +
      times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    spark.stop()
  }
}
