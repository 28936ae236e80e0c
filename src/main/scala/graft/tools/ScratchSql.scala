package graft.tools
import org.apache.spark.sql.SparkSession
/** Throwaway: run a SQL file over the registered views (twin authoring). */
object ScratchSql {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.io.Tables.registerViews(spark, "/root/testdata/sf0.001")
    args.foreach { f =>
      val sql = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
      try { println(s"== $f rows=" + spark.sql(sql).count()) }
      catch { case e: Exception => println(s"== $f FAIL " + e.getMessage.linesIterator.take(3).mkString(" | ").take(400)) }
    }
    spark.stop()
  }
}
