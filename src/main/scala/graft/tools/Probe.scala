package graft.tools
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // flagship as a user drives it
    graft.SparkEntry.entry(spark).show(false)
    // empty-window edge through the public score() surface
    val li = Seq((10L, Timestamp.valueOf("2020-01-01 00:00:00"), 5.0))
      .toDF("l_partkey", "l_shipdate", "l_quantity")
    val ord = Seq(("F", Timestamp.valueOf("2020-01-10 00:00:00")))
      .toDF("o_orderstatus", "o_orderdate")
    val ev = Seq((1L, Timestamp.valueOf("2020-01-05 00:00:00"), "click", 30.0))
      .toDF("event_id", "ts", "event_type", "value")
    val prt = Seq((10L, 40, "PROMO X")).toDF("p_partkey", "p_size", "p_type")
    graft.prescriptive.Scoring.score(li, ord, ev, prt).show(false)
    spark.stop()
  }
}
