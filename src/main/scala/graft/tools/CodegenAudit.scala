package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.ScalaUDF

/** Mechanical CodegenFallback sweep — the enforcement arm of the
  * round-12 no-lambda-HOF rule (SCALING.md §round-12: a lambda HOF on
  * a data-sized path costs 1.6–4× the entry by dropping the projection
  * out of whole-stage codegen into interpreted per-element dispatch).
  *
  * [[fallbackNames]] walks a query's executed plan (subqueries
  * included) and returns every expression class that is
  * [[CodegenFallback]] — lambda higher-order functions
  * (transform/aggregate/zip_with/filter), plus any straggler built-in
  * that interprets. `PlanSpec`'s audit test asserts the per-entry
  * result ⊆ a DOCUMENTED allowlist, so the next hot-path lambda fails
  * CI instead of landing unnoticed. ScalaUDF is collected under its
  * own marker and allowlisted NOWHERE — the repo's zero-UDF rule.
  *
  * As a main: prints `entry: name1 name2 …` per gate entry (sf0.001)
  * for triage — the tool that produced the round-13 allowlist.
  */
object CodegenAudit {

  /** Distinct CodegenFallback expression class names in the executed
    * plan, subqueries included. AdaptiveSparkPlanExec and
    * QueryStageExec are childless wrappers — a plain `collect` never
    * descends into them (the round-13 lesson: the first sweep returned
    * zero hits on a surface known to hold HOFs), so the walk unwraps
    * them explicitly, plus subquery plan expressions. */
  def fallbackNames(df: DataFrame): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val acc = scala.collection.mutable.Set[String]()
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ =>
        p.expressions.foreach(_.foreach {
          case u: ScalaUDF => acc += "ScalaUDF:" + u.udfName.getOrElse("anon")
          case e: CodegenFallback => acc += e.getClass.getSimpleName
          case s: PlanExpression[_] => s.plan match {
            case sp: SparkPlan => walk(sp)
            case _ => ()
          }
          case _ => ()
        })
        p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    acc.toSet
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-codegen-audit").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val skip = (n: String) =>
        n.startsWith("st") || Set("p1_pipeline_e2e", "p5_stream_curation",
          "o8_json_raw", "o2_jdbc_roundtrip", "o1_csv_source").contains(n)
      graft.SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { name =>
        val names = scala.util.Try(
          fallbackNames(graft.SparkEntry.queries(name)(spark, dir))
        ).getOrElse(Set("<plan-error>"))
        if (names.nonEmpty) println(s"FALLBACK $name: ${names.toSeq.sorted.mkString(" ")}")
      }
      println("AUDIT DONE")
    } finally spark.stop()
  }
}
