package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-JVM breakdown of d3's pair-expansion variants (round-13: the
  * lambda-free two-Generate respell measured 3.4× SLOWER fresh at
  * sf10 than the transform-lambda form it replaced — this probe
  * isolates which stage moved). Times, over the same session-memoized
  * signature table: (a) the bucket aggregate alone, (b) the
  * transform-lambda expansion, (c) the two-Generate expansion, (d)
  * variant (c) with InferFiltersFromGenerate excluded. */
object D3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    // same bucket table both variants consume (capped + sorted ids)
    def buckets(): DataFrame =
      graft.dedup.Dedup.d3Buckets(spark, dir)

    def lambdaPairs(): DataFrame = buckets()
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
             transform(slice(ids, i + 2, size(ids)),
                       b -> struct(a AS doc_a, b AS doc_b))))""")).as("p"))
      .select($"p.doc_a".as("doc_a"), $"p.doc_b".as("doc_b")).distinct()
      .orderBy($"doc_a", $"doc_b")

    def genPairs(): DataFrame = buckets()
      .select($"ids", posexplode($"ids").as(Seq("i", "doc_a")))
      .select($"doc_a",
        explode(slice($"ids", $"i" + lit(2), size($"ids"))).as("doc_b"))
      .distinct()
      .orderBy($"doc_a", $"doc_b")

    def time(label: String, mk: () => DataFrame): Unit = {
      val n0 = mk().count() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"D3PROBE $label rows=$n0 median=${ts.sorted.apply(ts.size / 2)}%.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }

    time("buckets-only", () => buckets())
    time("lambda-expansion", () => lambdaPairs())
    time("two-generate", () => genPairs())
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    time("two-generate-noinfer", () => genPairs())
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    spark.stop()
  }
}
