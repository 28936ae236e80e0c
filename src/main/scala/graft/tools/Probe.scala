package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch entry-point: drives the library the way a user would. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).show(5, false)
    spark.stop()
  }
}
