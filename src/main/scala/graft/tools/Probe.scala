package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_sketch", exprs => graft.plans.BottomKSketch(exprs.head, 64), "scala_udf")
    // under-k cardinality: 3 distinct statuses vs k=64 (hardened path)
    val k = 64
    val kth = try_element_at(col("sketch"), lit(k))
    graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(md5(col("o_orderstatus")).as("h"))
      .agg(expr("bottom_k_sketch(h)").as("sketch"))
      .select(size(col("sketch")).as("sketch_size"), kth.as("kth_or_null"),
        when(size(col("sketch")) < k, size(col("sketch")).cast("double"))
          .otherwise(lit(-1.0)).as("n_distinct_est"))
      .show(false)
    spark.stop()
  }
}
