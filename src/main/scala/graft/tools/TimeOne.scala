package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (name, dir) = (args(0), args(1))
    val fn = graft.SparkEntry.queries(name)
    val n0 = fn(spark, dir).count() // warm
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    println(f"TIMED $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
