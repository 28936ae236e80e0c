package graft.tools
import org.apache.spark.sql.SparkSession
import graft.dedup.Dedup
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
    val first = dirs.map(d => t(s"cold d2 $d")(Dedup.d2MinhashSig(spark, d).count()))
    val warm = t("warm d2 sf0.001")(Dedup.d2MinhashSig(spark, dirs.head).count())
    assert(first.head == warm, "cache returned different result")
    Dedup.invalidateSignatureCache()
    val recomputed = t("post-invalidate d2 sf0.001")(Dedup.d2MinhashSig(spark, dirs.head).count())
    assert(recomputed == warm, "invalidate changed results")
    println("cache semantics OK: identical counts cold/warm/post-invalidate")
    spark.stop()
  }
}
