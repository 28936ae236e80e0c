package graft.tools

/** Print the formatted physical plan of a gate entry — optionally of
  * its `.count()` form (`count` as 3rd arg), which is what TimeOne /
  * Bench actually execute: Catalyst prunes or collapses under a bare
  * count, so a timed number is only as honest as THIS plan. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val (name, dir) = (args(0), args(1))
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val target = if (args.length > 2 && args(2) == "count") df.groupBy().count() else df
    target.explain("formatted")
    spark.stop()
  }
}
