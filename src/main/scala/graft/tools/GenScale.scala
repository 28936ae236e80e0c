package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator (round-8 verdict task 1): synthesize an
  * sfN dir by replicating a driver testdata dir K times with
  * distribution-preserving transforms, so the top-cost families can be
  * measured one order of magnitude above the largest shipped SF and
  * the plan-shape scale arguments in SCALING.md become measured
  * exponents.
  *
  * Replication scheme (replica r ∈ 0..K-1; r=0 is the original):
  *  - every id column (+ its FK mirrors) shifts by r·STRIDE, one
  *    universal stride, so intra-replica referential integrity and the
  *    code's modular id selections (% 2..% 211, all dividing STRIDE)
  *    are preserved exactly — each replica contributes the same query
  *    sets, batch splits and sample patterns as the original;
  *  - document text goes through a per-replica lowercase rotation
  *    cipher (translate): length, whitespace, word shape, in-replica
  *    dup/near-dup topology are IDENTICAL, while shingle sets across
  *    replicas are disjoint — a 10× corpus with the ORIGINAL dup rate,
  *    not 10×-deeper dup clusters;
  *  - embeddings rotate by r positions (norm- and
  *    distance-distribution-preserving; neighbors stay in-replica);
  *  - timestamps are left untouched: 10× the data in the same time
  *    range = 10× denser streams, so time-bucketed aggregations keep
  *    their group counts and watermark behavior while per-group work
  *    scales — the realistic high-throughput shape;
  *  - region/nation stay as-is (true dims don't grow with corpus).
  *
  * Optional 4th arg `skewPct` (0–100, default 0): replica-preserving
  * growth keeps key TOPOLOGY fixed, so skew never worsens with K and
  * the salting/AQE-split entries are never stressed by it. With
  * skewPct = p, p% of ALL event rows (every replica; selected by
  * `event_id % 100 < p`, replica-invariant because STRIDE % 100 = 0)
  * are re-keyed to ONE hot user_id — a heavy hitter whose row count
  * grows LINEARLY with K while every other key stays flat. That is the
  * organic power-law shape replication can't produce, and the input
  * `graft.tools.SkewStress` measures salted vs unsalted vs AQE-split
  * joins against. Skewed dirs are for skew measurement only (FK
  * mixing breaks the per-replica selection invariants other entries
  * rely on).
  *
  * Each table lands as a SINGLE FILE named `<table>.parquet` exactly
  * like the driver layout (the streaming readers' pathGlobFilter
  * matches the leaf file name). Output is NOT oracle-gated — DuckDB
  * correctness runs at the driver SFs; this dir exists to measure
  * cost scaling.
  */
object GenScale {
  // lcm of every modular id selection in src/main (2,3,4,5,7,8,10,13,
  // 16,25,50,61,100,211): 16·3·25·7·13·61·211
  val Stride = 1405513200L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "target/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val skewPct = if (args.length > 3) args(3).toInt else 0
    // optional 5th arg: comma-separated table subset (the `only`
    // parameter of generate()) — a fourth-decade stress of one entry's
    // hot table shouldn't pay for a K× lineitem write
    val only = if (args.length > 4)
      args(4).split(",").map(_.trim).filter(_.nonEmpty).toSeq else Nil
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, k, skewPct, only)
    spark.stop()
  }

  /** `only`: restrict generation to the named tables (empty = all) —
    * the skew sweep measures events ⋈ customer only and skipping the
    * K× lineitem write makes a 6-point sweep grid affordable. */
  def generate(spark: SparkSession, src: String, dst: String, k: Int,
      skewPct: Int = 0, only: Seq[String] = Nil): Unit = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def cipher(r: Int) = lower.drop(r % 26) + lower.take(r % 26)

    /** K shifted replicas of `df`; per-replica column rewrites first. */
    def rep(df: DataFrame, idCols: Seq[String],
            perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { r =>
        val shifted = idCols.foldLeft(perReplica(df, r)) { (d, c) =>
          d.withColumn(c, col(c) + lit(Stride * r))
        }
        shifted.select(df.columns.map(col).toIndexedSeq: _*) // original order
      }.reduce(_ unionAll _)

    val tables: Seq[(String, DataFrame => DataFrame)] = Seq(
      "region" -> identity,
      "nation" -> identity,
      "customer" -> (df => rep(df, Seq("c_custkey"))),
      "supplier" -> (df => rep(df, Seq("s_suppkey"))),
      "part" -> (df => rep(df, Seq("p_partkey"))),
      "orders" -> (df => rep(df, Seq("o_orderkey", "o_custkey"))),
      "lineitem" -> (df => rep(df, Seq("l_orderkey", "l_partkey", "l_suppkey"))),
      "events" -> (df => {
        val base = rep(df, Seq("event_id", "user_id"))
        if (skewPct <= 0) base
        else {
          // one hot key growing linearly with K: re-key skewPct% of all
          // rows (selection is replica-invariant: STRIDE % 100 == 0)
          val hot = df.agg(min(col("user_id"))).head.get(0)
          base.withColumn("user_id",
            when(pmod(col("event_id"), lit(100L)) < lit(skewPct.toLong),
              lit(hot)).otherwise(col("user_id")))
        }
      }),
      "documents" -> (df => rep(df, Seq("doc_id"),
        (d, r) => d.withColumn("text", translate(col("text"), lower, cipher(r))))),
      "embeddings" -> (df => rep(df, Seq("vec_id"),
        (d, r) =>
          if (r == 0) d
          else d.withColumn("embedding", expr(
            s"concat(slice(embedding, ${r % 64 + 1}, ${64 - r % 64}), " +
            s"slice(embedding, 1, ${r % 64}))")))))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    tables.filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, f) =>
      val out = f(spark.read.parquet(s"$src/$name.parquet"))
      val tmp = s"$dst/_gen_$name"
      // single leaf file named <table>.parquet, driver-layout-exact
      out.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(_.getName.endsWith(".parquet")).get
      val tgt = java.nio.file.Paths.get(dst, s"$name.parquet")
      java.nio.file.Files.deleteIfExists(tgt)
      java.nio.file.Files.move(part.toPath, tgt)
      new java.io.File(tmp).listFiles.foreach(_.delete())
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
      println(s"gen $name -> $tgt")
    }
  }
}
