package graft.tools
import org.apache.spark.sql.SparkSession
import graft.maintenance.Maintenance
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // NPE guards: nonexistent dirs
    println("retain on missing dir: " + Maintenance.retainSnapshots("/tmp/does_not_exist_xyz", 3))
    println("fileStats on missing dir: " + Maintenance.fileStats("/tmp/does_not_exist_xyz"))
    // p1 temp cleanup: run twice, count leftover workdirs
    graft.pipeline.Pipeline.p1Pipeline(spark, "/root/testdata/sf0.001").count()
    graft.pipeline.Pipeline.p1Pipeline(spark, "/root/testdata/sf0.001").count()
    val n = new java.io.File("/tmp").listFiles().count(_.getName.startsWith("graft_pipeline_"))
    println(s"pipeline workdirs remaining after 2 runs: $n")
    spark.stop()
  }
}
