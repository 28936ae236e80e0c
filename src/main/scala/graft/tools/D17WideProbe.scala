package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B of d17's two overlap plans at corpus scale and configurable
  * source width. The testdata dirs carry only a handful of real
  * sources, so the wide regime is synthesized by re-keying `source`
  * to `doc_id % S` — pair counts become C(S,2) and every shingle's
  * membership set is data-driven, which is exactly the work both
  * plans price. For each S in the list, times (fresh warm + reps over
  * one JVM, same memoized inputs):
  *   matrix   — the broadcast pair-legend bit-test pass
  *              (|distinct shingles| × C(S,2) codegen'd tests)
  *   exploded — bitmask_indices decode + bucket-local two-Generate
  *              pair enumeration (Σ C(k,2))
  * plus an xxhash64 digest over the sorted output so the two plans'
  * value identity is checked on the REAL corpus, not just the spec
  * fixture. Optional 4th arg restricts which plans run ("matrix",
  * "exploded", or the default "both") — at S in the thousands the
  * matrix pass is the plan the crossover REJECTED (C(S,2) ≈ 500 k bit
  * tests per distinct shingle at S=1000), so the wide probe times the
  * exploded plan alone rather than burning an hour proving the
  * documented quadratic. Usage:
  *   tools/graft_java.sh graft.tools.D17WideProbe target/sf10 3 64,150
  *   tools/graft_java.sh graft.tools.D17WideProbe target/sf10 3 1000 exploded
  */
object D17WideProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val widths = (if (args.length > 2) args(2) else "64,150")
      .split(",").map(_.trim.toInt).toSeq
    val plans = if (args.length > 3) args(3) else "both"
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def wideDocs(sCount: Int): DataFrame =
      graft.io.Tables.documents(spark, dir)
        .withColumn("source",
          format_string("src%04d", pmod($"doc_id", lit(sCount)).cast("int")))

    def digestAndTime(label: String, mk: () => DataFrame): (Long, Double) = {
      val d0 = digest(mk()) // warm (memoized inputs + codegen)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); digest(mk()); (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"D17PROBE $label digest=$d0 median=$med%.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
      (d0, med)
    }

    def digest(df: DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)

    // `auto` mode (r14 verdict task 5): validate the production picker
    // instead of only printing raw A/B numbers — for each S, time both
    // plans, decide the measured winner, and check the choice
    // [[graft.dedup.Dedup.MatrixMaxSources]] would make agrees. A
    // DISAGREE is only called past a 15% margin (the S=8 matrix edge
    // was 2.5% — noise-level; the constant must not flap on that).
    // Exits 3 on any DISAGREE so a panel script can gate on it.
    var disagreements = 0
    widths.foreach { sCount =>
      val docs = wideDocs(sCount)
      val dm = if (plans != "exploded")
        Some(digestAndTime(s"S=$sCount matrix",
          () => graft.dedup.Dedup.crossSourceOverlap(spark, docs, Int.MaxValue)))
      else None
      val de = if (plans != "matrix")
        Some(digestAndTime(s"S=$sCount exploded",
          () => graft.dedup.Dedup.crossSourceOverlap(spark, docs, 0)))
      else None
      for ((md, mt) <- dm; (ed, et) <- de) {
        println(s"D17PROBE S=$sCount identical=${md == ed}")
        if (plans == "auto") {
          val picked = if (sCount <= graft.dedup.Dedup.MatrixMaxSources)
            "matrix" else "exploded"
          val winner = if (mt <= et) "matrix" else "exploded"
          val margin = math.abs(mt - et) / math.max(mt, et)
          val verdict =
            if (picked == winner || margin < 0.15) "AGREE"
            else { disagreements += 1; "DISAGREE" }
          println(f"D17PROBE S=$sCount auto picked=$picked measured=$winner " +
            f"margin=${margin * 100}%.1f%% $verdict " +
            f"(crossover const=${graft.dedup.Dedup.MatrixMaxSources})")
        }
      }
    }
    spark.stop()
    if (disagreements > 0) sys.exit(3)
  }
}
