package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Cleaning, OpQueries, Snapshot}
import graft.analytics.Queries
import graft.prescriptive.Scoring

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class CoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry flagship returns a non-empty recommendation") {
    val row = SparkEntry.entry(spark).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[String]("rekomendasi").nonEmpty)
    Seq("skor_kekotoran", "skor_bau", "skor_aqi", "skor_final").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 10.0, s"$c=$v out of [0,10]")
    }
  }

  test("column normalization is idempotent and BOM/space safe") {
    assert(Cleaning.normalizeName("﻿ L OrderKey ") == "l_orderkey")
    assert(Cleaning.normalizeName(Cleaning.normalizeName("  A  B ")) ==
      Cleaning.normalizeName("  A  B "))
  }

  test("latestRow equals orderBy-desc-limit-1") {
    val ev = graft.io.Tables.events(spark, sf)
    val viaAgg = OpQueries.o13LatestSnapshot(spark, sf).collect().head
    val viaSort = ev.orderBy(col("ts").desc, col("event_id").desc)
      .select(col("event_id"), col("event_type"), col("value"))
      .limit(1).collect().head
    assert(viaAgg == viaSort)
  }

  test("every declared oracle has a query and vice versa (minus rows-only)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
  }

  test("all queries are runnable and non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("prescriptive score monotonicity: more recent activity => dirtiness non-decreasing") {
    // same pipeline on a prefix vs the full window: dirtiness uses a sum of
    // non-negative contributions, so more rows can only increase it
    val full = Scoring.hygieneScore(spark, sf).collect().head
    assert(full.getAs[Double]("skor_kekotoran") >= 0.0)
    assert(full.getAs[Long]("n_recent") >= full.getAs[Long]("n_bau"))
  }

  test("broadcast joins are planned for dim enrichment") {
    val plan = OpQueries.o25JoinEnrich(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("filter/projection pushdown reaches the parquet scan") {
    val plan = OpQueries.o5PushdownScan(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), plan)
    assert(!plan.contains("l_comment"))
  }
}
