package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout scale patterns: partitioned layout → partition
  * pruning; bucketed layout → shuffle-free co-located joins. These are
  * the write-side half of the 100 TB story (the read-side plan shapes
  * live in PlanSpec).
  */
class StorageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("partitioned write + filter => partition pruning in the scan") {
    val dir = Files.createTempDirectory("graft_part_").toString
    graft.io.Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    // layout: one dir per event_type
    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.count(_.startsWith("event_type=")) == 5, dirs.mkString(","))

    val q = spark.read.parquet(dir).filter(col("event_type") === "error")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan.take(1500))
    val n = q.collect().head.getLong(0)
    val expected = graft.io.Tables.events(spark, sf)
      .filter(col("event_type") === "error").count()
    assert(n == expected)
  }

  test("mt8: ORC round-trip pushes the status filter into the ORC reader") {
    val df = graft.maintenance.Maintenance.mt8OrcRoundtrip(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Format: ORC") || plan.contains("FileScan orc"), plan.take(1500))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), Not(EqualTo(o_orderstatus,P))"),
      "status predicate did not reach the ORC reader:\n" + plan.take(1500))
  }

  test("join-driven DYNAMIC partition pruning reaches the partitioned scan") {
    // the fact side is partitioned on the join key; the selective filter
    // lives on the OTHER side of the join, so the partition list is only
    // known at runtime — Spark must inject a dynamicpruning subquery into
    // the scan (at 100 TB this is what turns a dim-filtered fact join
    // from a full scan into a few partitions of I/O)
    val dir = Files.createTempDirectory("graft_dpp_").toString
    graft.io.Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = graft.io.Tables.orders(spark, sf)
      .select(col("o_orderstatus").as("st"), col("o_orderpriority")).distinct()
      .filter(col("o_orderpriority") === "1-URGENT")
    val q = fact.join(broadcast(dim), fact("o_orderstatus") === dim("st"))
      .groupBy(col("st")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "expected a dynamicpruning partition filter on the fact scan:\n" + plan.take(3000))
    q.collect() // and it must still produce correct rows
  }

  test("CBO: ANALYZE TABLE stats drive an unhinted broadcast join") {
    // The stats-driven planner path a 1000-executor cluster leans on:
    // with table+column stats from ANALYZE, a dim under the broadcast
    // threshold broadcasts WITHOUT a hint — the catalog, not the code,
    // carries the size knowledge. (Enrich.scala hints explicitly as a
    // defense-in-depth policy; this proves the stats path also works.)
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    graft.io.Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("cbo_orders")
    graft.io.Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").saveAsTable("cbo_nation")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
      val j = spark.table("cbo_orders")
        .join(spark.table("cbo_nation"),
          col("o_custkey") % 25 === col("n_nationkey")) // no broadcast() hint
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"stats-known small dim should broadcast unhinted:\n${plan.take(2500)}")
      assert(j.collect().map(_.getLong(1)).sum > 0)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir
    // is a static conf and cannot be set per-test
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    graft.io.Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    graft.io.Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_customer")
    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        .groupBy(col("c_name")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // bucket co-location: the join itself needs NO Exchange on either side
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      val exchangesBeforeAgg = "Exchange hashpartitioning\\(o_custkey".r
        .findAllIn(plan).size
      assert(exchangesBeforeAgg == 0,
        s"bucketed join still shuffles on the key:\n${plan.take(2500)}")
      assert(j.collect().map(_.getLong(1)).sum == 1500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("s8 persisted IVF: search scan is dynamic-partition-pruned; results == s4") {
    // the index is written partitionBy(cell_id); the probed-cell list is
    // only known after scanning the query side, so Spark must inject a
    // dynamicpruning subquery into the index scan — at 100 TB retrieval
    // reads only the probed cells' directories, never the full corpus
    val q = graft.similarity.Ann.s8IvfPersisted(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "expected a dynamicpruning filter on the persisted-index scan:\n" + plan.take(3000))
    // doubles round-trip parquet bit-exactly, so the persisted path is
    // row-for-row identical to the in-plan S-4 form
    val persisted = q.collect().map(_.toSeq).toSeq
    val inPlan = graft.similarity.Ann.s4IvfTopK(spark, sf).collect().map(_.toSeq).toSeq
    assert(persisted == inPlan)
    assert(persisted.nonEmpty)
  }

  test("O-37 XML: attribute/_VALUE mapping and entity escaping survive the round-trip") {
    val out = graft.ops.OpQueries.o37XmlSource(spark, sf)
    val rows = out.collect()
    val src = graft.io.Tables.supplier(spark, sf)
      .orderBy(col("s_suppkey")).collect()
    assert(rows.length == src.length && rows.nonEmpty)
    // the hostile prefix (<, &, ") must come back decoded on every row
    assert(rows.forall(_.getAs[String]("name_text").startsWith("<tag> & \"quoted\" ")))
    // attribute round-trip: nation attr equals the source nation key, row-for-row
    rows.zip(src).foreach { case (r, sr) =>
      assert(r.getAs[Long]("nation_attr") == sr.getAs[Number]("s_nationkey").longValue())
      // doubles cross XML text bit-exactly (Double.toString ↔ parse)
      assert(r.getAs[Double]("s_acctbal") == sr.getAs[Double]("s_acctbal"))
    }
  }

  test("O-2 JDBC: partitioned read-back splits into range partitions; empty guard skips") {
    val work = Files.createTempDirectory("graft_pipeline_derbyspec_")
    System.setProperty("derby.stream.error.file",
      work.resolve("derby.log").toString)
    val url = s"jdbc:derby:${work.resolve("db")};create=true"
    graft.io.Tables.nation(spark, sf).write.format("jdbc")
      .option("url", url).option("dbtable", "nation_rt")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
    // partitioned read: 4 range slices on the key = 4 parallel cursors
    val back = graft.io.JdbcSource.read(spark, url, "nation_rt", "", "",
      partitionColumn = Some(("n_nationkey", 0L, 24L, 4)))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == graft.io.Tables.nation(spark, sf).count())
    assert(graft.io.JdbcSource.nonEmpty(back).isDefined)
    // the reference's skip-if-empty guard fires on an empty source table
    val empty = back.filter(col("n_nationkey") < 0)
    assert(graft.io.JdbcSource.nonEmpty(empty).isEmpty)
  }
}
