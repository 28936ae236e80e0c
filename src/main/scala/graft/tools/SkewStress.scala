package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-stress harness (round 9): measure the x13/x14 skew remedies
  * against a dir generated with GenScale's hot-key mode, where one
  * user_id owns skewPct% of ALL event rows (a heavy hitter that grows
  * linearly with the corpus — the organic power-law shape topology-
  * preserving replication alone can't produce).
  *
  * Three variants of the same fact ⋈ customer-dim join + segment
  * summary, identical results, different physical treatment of the
  * hot reducer partition:
  *
  *  - `unsalted`  — shuffled hash join, AQE skew split OFF: the hot
  *    key lands on ONE reducer; the stage runs at straggler speed.
  *    This is the failure mode the other two exist to fix.
  *  - `salted`    — x13's rewrite (fact salt in [0,R), dim ×R): the
  *    hot key spreads over R reducers at authoring time.
  *  - `aqe_split` — unsalted shape with AQE skew-join ON (x14's
  *    lowered thresholds so the toy-scale hot partition clears the
  *    bar; at production scale the DEFAULT thresholds fire on the
  *    same shape): the runtime fix for skew nobody predicted.
  *
  * Broadcast is disabled throughout — a broadcast join has no reducer
  * hotspot, so it would dissolve the thing being measured (and at the
  * 100 TB operating point the dim doesn't fit the broadcast budget).
  *
  * Prints ONE JSON line: hot-key share + per-variant median seconds.
  *
  *   sbt 'runMain graft.tools.SkewStress target/sf1skew 3'
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/sf1skew"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // no broadcast anywhere: the measurement IS the shuffled form
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.io.Tables.events(spark, dir)
    val (total, hotRows) = {
      val top = events.groupBy(col("user_id")).count()
        .orderBy(desc("count")).limit(1).collect()(0).getLong(1)
      (events.count(), top)
    }

    def fact(s: SparkSession) = graft.io.Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("cents"))
    def dim(s: SparkSession) = graft.io.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def summarize(j: DataFrame): Long =
      j.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .count()

    def unsalted(): Long = summarize(
      fact(spark).join(dim(spark).hint("shuffle_hash"),
        col("user_id") === col("c_custkey")))
    def salted(): Long =
      summarize(graft.plans.Dpp.saltedJoinRaw(spark, dir))
    def aqeSplit(): Long = graft.plans.Dpp.withSkewConfs(spark) {
      summarize(fact(spark).join(dim(spark).hint("merge"),
        col("user_id") === col("c_custkey")))
    }

    def withSkewJoin[A](on: Boolean)(body: => A): A = {
      val key = "spark.sql.adaptive.skewJoin.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, on.toString)
      try body finally spark.conf.set(key, prev)
    }
    def time(body: () => Long): Double = {
      body() // warm: plan compilation + codegen off the clock
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(ts.size / 2)
    }

    val tUnsalted = withSkewJoin(on = false)(time(() => unsalted()))
    val tSalted = withSkewJoin(on = false)(time(() => salted()))
    val tAqe = withSkewJoin(on = true)(time(() => aqeSplit()))

    println(f"""{"metric":"skew_stress","dir":"$dir","total_rows":$total,""" +
      f""""hot_rows":$hotRows,"hot_share":${hotRows.toDouble / total}%.4f,""" +
      f""""unsalted_s":$tUnsalted%.3f,"salted_s":$tSalted%.3f,""" +
      f""""aqe_split_s":$tAqe%.3f,"reps":$reps}""")
    spark.stop()
  }
}
