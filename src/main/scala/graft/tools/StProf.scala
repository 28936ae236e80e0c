package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch profiler for streaming drain constant costs (SCALING.md
  * §streaming-constant-costs): runs the st20-shaped stream-stream semi
  * join drain once and dumps each micro-batch's duration breakdown from
  * the streaming progress events. */
object StProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def side(tpe: String, tag: String) =
      graft.io.Tables.eventsStream(spark, dir)
        .filter($"event_type" === tpe)
        .select($"user_id".as(s"${tag}_user"), $"ts".as(s"${tag}_ts"),
          $"event_id".as(s"${tag}_id"))
        .withWatermark(s"${tag}_ts", "2 hours")
    val joined = side("view", "v").join(side("purchase", "p"),
      $"v_user" === $"p_user" &&
        $"p_ts" >= $"v_ts" && $"p_ts" <= $"v_ts" + expr("INTERVAL 1 HOUR"),
      "left_semi")

    // warm
    runOnce(spark, joined, verbose = false)
    val t0 = System.nanoTime()
    runOnce(spark, joined, verbose = true)
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }

  private def runOnce(spark: SparkSession,
      plan: org.apache.spark.sql.DataFrame, verbose: Boolean): Unit = {
    val work = java.nio.file.Files.createTempDirectory("graft_stprof_").toString
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_PARTITIONS", "8"))
    val q = plan.writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/chk")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    if (verbose) {
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerExec=${d.get("triggerExecution")} " +
          s"addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")} " +
          s"latestOffset=${d.get("latestOffset")} queryPlanning=${d.get("queryPlanning")} " +
          s"walCommit=${d.get("walCommit")} commitOffsets=${d.get("commitOffsets")} " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
          s"stateCommitMs=${p.stateOperators.map(_.commitTimeMs).mkString(",")}")
      }
    }
  }
}
