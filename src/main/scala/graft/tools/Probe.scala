package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.ops.OpQueries.o22BoolPredicate(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    val t0 = System.nanoTime(); df.count(); println(s"o22 took ${(System.nanoTime()-t0)/1e9}s")
    val t1 = System.nanoTime(); df.count(); println(s"o22 again ${(System.nanoTime()-t1)/1e9}s")
    spark.stop()
  }
}
