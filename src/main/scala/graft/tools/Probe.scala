package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.maintenance.Maintenance
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("probe_compact_").toString + "/t"
    graft.io.Tables.lineitem(spark, "/root/testdata/sf0.001").repartition(40).write.parquet(dir)
    val (f0, b0) = Maintenance.fileStats(dir)
    Maintenance.compact(spark, dir, 10000)
    val (f1, b1) = Maintenance.fileStats(dir)
    println(s"compact: files $f0 -> $f1, bytes $b0 -> $b1, rows=" + spark.read.parquet(dir).count())
    // retention edge: keep more than exist
    val root = Files.createTempDirectory("probe_retain_").toString
    Seq("20010101_000000", "20010102_000000").foreach { t =>
      new java.io.File(s"$root/a_$t").mkdirs() }
    println("keep=5 deletes: " + Maintenance.retainSnapshots(root, 5))
    println("keep=0 deletes: " + Maintenance.retainSnapshots(root, 0))
    spark.stop()
  }
}
