package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

/** x10 grouped top-k: the custom LogicalPlan + Strategy + SparkPlan
  * rung. Asserts (1) the rewrite fires on the portable window spelling
  * and the custom exec actually runs, (2) no window/sort machinery
  * remains in the plan, (3) results are identical to the window
  * spelling computed WITHOUT the rewrite, including edge cases
  * (k > group size, single group, hot group).
  */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("x10 plans the custom exec: partial + final, no WindowExec, no SortExec") {
    val p = executed(TopK.x10TopKPerGroup(spark, sf))
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      "expected partial+final TopKPerGroup pair:\n" + p.take(3000))
    assert(!p.contains("Window") && !p.contains("WindowGroupLimit"),
      "window machinery survived the rewrite:\n" + p.take(3000))
    assert(!p.contains("Sort"), "a sort survived the rewrite:\n" + p.take(3000))
    // exactly one exchange, on the group key, between partial and final
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("x10 equals the un-rewritten window spelling") {
    import graft.syntax._
    val o = graft.io.Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_orderkey",
        round($"o_totalprice" * 100).cast("bigint").as("cents"))
    // reference keeps rn in its output, so the rewrite does NOT fire
    // (asserted) and the stock window path runs; rn is dropped
    // driver-side to avoid re-triggering the rewrite with a projection
    val ref = o.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"o_orderpriority")
          .orderBy($"cents".desc, $"o_orderkey".asc)))
      .filter($"rn" <= 3)
    assert(executed(ref).contains("Window"), "reference should use the window path")
    val refRows = ref.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val gotRows = TopK.x10TopKPerGroup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotRows == refRows)
    assert(gotRows.size == 15) // 5 priorities × 3
  }

  test("k larger than every group returns all rows; single group works") {
    import spark.implicits._
    TopK.install(spark)
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    def topk(d: org.apache.spark.sql.DataFrame, k: Int) =
      d.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v".desc)))
        .filter(col("rn") <= k).select($"g", $"v")
    val all = topk(df, 10)
    assert(executed(all).contains("TopKPerGroupFinal"))
    assert(all.count() == 3)
    val one = topk(df.filter($"g" === "a"), 1).collect()
    assert(one.length == 1 && one.head.getInt(1) == 2)
  }

  test("hot group: per-task state stays bounded at k, result exact") {
    import spark.implicits._
    TopK.install(spark)
    // two 50k-row groups, k=5 — the window plan would sort 100k rows;
    // the heap keeps 5 per group per task. (The group key must be
    // non-foldable: a constant key is optimized to an empty partition
    // spec, which Spark's own TakeOrderedAndProject path handles and
    // our rule deliberately leaves alone.)
    val df = spark.range(100000)
      .select((col("id") % 2).as("g"), col("id").as("v"))
    val top = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v".desc)))
      .filter(col("rn") <= 5).select($"g", $"v")
    assert(executed(top).contains("TopKPerGroupFinal"))
    val vs = top.collect().map(_.getLong(1)).sorted
    assert(vs.sameElements(Array(99990L, 99991L, 99992L, 99993L, 99994L,
      99995L, 99996L, 99997L, 99998L, 99999L)))
  }

  test("degenerate: every group unique (pass-through worst case) stays exact") {
    import spark.implicits._
    TopK.install(spark)
    // |groups| = N: the partial pass keeps everything (its documented
    // worst case — same volume the window plan would shuffle); results
    // must still be exact
    val df = spark.range(10000).select(col("id").as("g"), (col("id") * 7 % 13).as("v"))
    val top = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v".desc)))
      .filter(col("rn") <= 2).select($"g", $"v")
    assert(executed(top).contains("TopKPerGroupFinal"))
    assert(top.count() == 10000) // one row per group, k=2 > group size 1
  }

  test("t14 tf-idf's top-3 stage runs on the custom top-k plan") {
    val p = executed(graft.text.TextOps.t14TfIdf(spark, sf))
    assert(p.contains("TopKPerGroupFinal") && !p.contains("WindowExec"),
      p.take(3000))
  }

  test("rn = 1 (latest-per-key idiom) takes the heap path; rn = 2 does not") {
    import spark.implicits._
    TopK.install(spark)
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v".desc)
    val latest = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select($"g", $"v")
    assert(executed(latest).contains("TopKPerGroupFinal"))
    assert(latest.collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("a", 2), ("b", 5)))
    // rn = 2 is a rank slice, not a top-k — must stay on the window path
    val slice = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2).select($"g", $"v")
    assert(!executed(slice).contains("TopKPerGroup"))
    assert(slice.collect().map(r => (r.getString(0), r.getInt(1))).toSet == Set(("a", 1)))
  }

  test("rewrite does NOT fire when the rank column is kept or the filter is compound") {
    import spark.implicits._
    TopK.install(spark)
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v".desc)
    val kept = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(!executed(kept).contains("TopKPerGroup"),
      "rewrite fired although rn is in the output")
    val compound = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("v") > 1).select($"g", $"v")
    assert(!executed(compound).contains("TopKPerGroup"),
      "rewrite fired on a compound filter")
  }
}
