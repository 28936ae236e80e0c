package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Queries
import graft.dedup.Dedup
import graft.ops.OpQueries
import graft.plans.AsOfJoin
import graft.prescriptive.Scoring
import graft.similarity.Ann

/** Physical-plan shape assertions — the 100 TB contract, checked
  * mechanically: the right joins broadcast, aggregates combine
  * map-side, scans prune, and O(n²) shapes never appear.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dim enrichment joins broadcast (never sort-merge)") {
    Seq(
      OpQueries.o25JoinEnrich(spark, sf),
      OpQueries.o26JoinChain(spark, sf),
      Scoring.hygieneScore(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), p.take(2000))
      assert(!p.contains("SortMergeJoin"), "dim join degraded to sort-merge:\n" + p.take(2000))
    }
  }

  test("x12 fact scan is dynamically partition-pruned off the dim filter") {
    val df = graft.plans.Dpp.dppJoinRaw(spark, sf)
    val p = plan(df)
    assert(p.toLowerCase.contains("dynamicpruning"),
      "fact scan lost its runtime partition filter:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"),
      "dim side must broadcast (pruning rides the broadcast):\n" + p.take(2000))
  }

  test("x13 skew join shuffles on (key, salt), not the bare key") {
    val p = plan(graft.plans.Dpp.saltedJoinRaw(spark, sf))
    assert(!p.contains("BroadcastHashJoin"),
      "salted join must demonstrate the shuffled form:\n" + p.take(2000))
    assert(p.contains("salt"),
      "join-side shuffle lost the salt key:\n" + p.take(2000))
  }

  test("x14 AQE splits the hot reducer partition (skew=true shuffle read)") {
    // sf0.001's hot partition is ~tens of KB, so the spec scope tightens
    // the thresholds further than the gate entry's defaults
    // thresholds sized to sf0.001's COMPRESSED shuffle blocks (MapStatus
    // reports compressed sizes; the constant hot key compresses hard)
    graft.plans.Dpp.withSkewConfs(spark, threshold = "1KB", advisory = "1KB",
        filesMax = "16KB") {
      val df = graft.plans.Dpp.skewJoinRaw(spark, sf)
      // AQE decides skew handling at EXECUTION; materialize first, then
      // read the final adaptive plan off the same query execution
      df.queryExecution.toRdd.count()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE never split the skewed partition:\n" + p.take(3000))
      assert(p.contains("SortMergeJoin"),
        "skew demo requires the shuffled sort-merge form:\n" + p.take(3000))
    }
  }

  test("x15 optimizer injects a bloom filter on the fact side of the shuffle join") {
    graft.plans.Dpp.withBloomConfs(spark) {
      val df = graft.plans.Dpp.bloomJoinRaw(spark, sf)
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        "InjectRuntimeFilter never fired on the fact side:\n" + p.take(3000))
      assert(p.contains("bloom_filter_agg"),
        "bloom build subquery missing from the optimized plan:\n" + p.take(3000))
    }
  }

  test("group-by aggregates have map-side partial aggregation") {
    val p = plan(Queries.q6Trend(spark, sf))
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("latest-row is a partial aggregate, not a global sort") {
    val p = plan(OpQueries.o13LatestSnapshot(spark, sf))
    assert(!p.contains("Sort "), "top-1 should not globally sort:\n" + p.take(2000))
    assert(p.contains("max_by") || p.contains("HashAggregate") || p.contains("SortAggregate"),
      p.take(2000))
  }

  test("LSH pair generation contains no join operator at all") {
    val p = plan(Dedup.d3LshPairs(spark, sf))
    assert(!p.contains("Join"), "bucket-local pairing must not join:\n" + p.take(2000))
  }

  test("LSH pairing caps pathological buckets (plan-visible slice + metric)") {
    val p = plan(Dedup.d3LshPairs(spark, sf))
    assert(p.contains("slice"), "bucket cap must appear in the plan:\n" + p.take(2000))
    assert(p.contains("CollectMetrics") || p.contains("d3_bucket_cap"),
      "drop-count metric must be observed:\n" + p.take(2000))
  }

  test("d11b production-width (64-bit) simhash pairing is a banded equi-join, never a nested loop") {
    val p = plan(Dedup.d11bSimhashNeardup64(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "64-bit banded candidate join degraded to a nested loop:\n" + p.take(2000))
    assert(p.contains("shiftrightunsigned"),
      "band keys must extract via unsigned shift (bit 63 = negative Long):\n" + p.take(2000))
  }

  test("64-bit banding finds every hamming<=3 pair, including sign-bit fingerprints") {
    // brute-force ground truth over constructed fingerprints that
    // exercise bit 63 (negative Longs) and every band position
    import spark.implicits._
    val base = Long.MinValue | (1L << 40) | (1L << 20) | 7L
    // single source of truth for both the DataFrame under test and the
    // brute-force expectation — an edit to one cannot desync the other
    val rows = Seq(
      1L -> base,                      // anchor, sign bit set
      2L -> (base ^ 1L),               // hamming 1, band 0
      3L -> (base ^ (1L << 17) ^ (1L << 18)), // hamming 2, band 1
      4L -> (base ^ (1L << 33) ^ (1L << 47) ^ (1L << 63)), // hamming 3, bands 2+3
      5L -> (base ^ 15L),              // hamming 4 within one band — candidate but filtered
      6L -> ~base                      // hamming 64 — must never be a candidate hit
    )
    val fps = rows.toDF("doc_id", "simhash")
    val got = Dedup.simhashNeardupPairs(fps, bits = 64, bands = 4)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val expect = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == expect, s"banded pairs $got != brute force $expect")
  }

  test("n-gram Jaccard pair generation is equi-join only (no nested loop)") {
    val p = plan(Dedup.d4NgramJaccard(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "pair source degraded to a nested loop (O(N/100 x N) at scale):\n" + p.take(2000))
  }

  test("cosine near-dup blocks by (label, salt) equi-join, never a nested loop") {
    val p = plan(Ann.s3CosineNearDup(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("s3 hot-label guard bounds per-block pair work on a degenerate single-label corpus") {
    import org.apache.spark.sql.functions._
    // one label, 12x BlockCap rows: unguarded all-pairs would be
    // N(N-1)/2 comparisons in one block. Deterministic varied vectors
    // (no RNG) so sign buckets actually spread.
    val n = Ann.BlockCap * 12
    val c = spark.range(n.toLong).toDF("vec_id")
      .withColumn("label", lit(0))
      .withColumn("v", expr(
        "transform(sequence(0, 63), d -> cast((vec_id * 31 + d * 17) % 101 - 50 AS double) / 50.0)"))
      .withColumn("nrm", sqrt(expr("aggregate(v, 0.0d, (a, x) -> a + x * x)")))
    graft.functions.NativeFunctions.register(spark)
    val keyed = Ann.blockKeyed(c)
    val sizes = keyed.groupBy("sub").count().collect().map(r => r.getLong(1))
    assert(sizes.length > 1, s"guard never split the oversized label: $sizes")
    val unguarded = n.toLong * (n - 1) / 2
    val guarded = sizes.map(s => s * (s - 1) / 2).sum
    assert(guarded < unguarded / 4,
      s"sub-blocking saved <4x on pair count: $guarded vs $unguarded (sizes ${sizes.mkString(",")})")
    val maxBlock = sizes.max
    assert(maxBlock < n / 2, s"one sub-block holds most of the label: $maxBlock of $n")
  }

  test("as-of join is one shuffle on the key + window (no nested loop)") {
    val p = plan(AsOfJoin.x1AsOfJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(2000))
  }

  test("ANN brute force broadcasts the query side, never the corpus x corpus product") {
    val p = plan(Ann.s1BruteTopK(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
  }

  test("d9 decontamination broadcasts the benchmark shingle set (never shuffles the corpus side)") {
    val p = plan(Dedup.d9Decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "benchmark set must broadcast, not shuffle the corpus:\n" + p.take(2000))
  }

  test("x8 bloom prefilter sits on the fact scan, before the semi-join") {
    val p = plan(graft.plans.Sketches.x8BloomSemiJoin(spark, sf))
    assert(p.contains("might_contain"),
      "bloom membership probe missing from the physical plan:\n" + p.take(2000))
    assert(p.contains("LeftSemi"), p.take(2000))
    // the probe must be a filter on the scan side (pre-shuffle), not a
    // post-join predicate: in the plan string the filter line carrying
    // might_contain appears BELOW (after) the join operator line
    val joinIdx = p.indexOf("LeftSemi")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "bloom probe is not under the join's build/stream input:\n" + p.take(2000))
  }

  test("x9 bucketed join is exchange-free: co-partitioning comes from the catalog") {
    val p = plan(graft.plans.Bucketing.bucketedJoinRaw(spark, sf))
    assert(p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("Exchange"),
      "bucketed join re-shuffled — bucketing metadata not used:\n" + p.take(2000))
  }

  test("x4 range join is a bucket equi-join, never a nested loop") {
    val p = plan(graft.plans.RangeJoin.x4RangeJoin(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degraded to a nested loop (O(events x intervals) at scale):\n" + p.take(2000))
  }

  test("t5 edit-distance pair source is an equi-join, never a nested loop") {
    val p = plan(graft.analytics.Wide.t5Levenshtein(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "t5 pair source degraded to a nested loop:\n" + p.take(2000))
  }

  test("q9 guard-limit digest never globally sorts the fact table") {
    val p = plan(Queries.q9LimitScan(spark, sf))
    assert(!p.contains("Sort "), "guard-limit scan must not sort:\n" + p.take(2000))
    assert(p.contains("Limit"), "guard limit must survive in the plan:\n" + p.take(2000))
  }

  test("scans read only the needed columns (projection pushdown)") {
    val p = plan(Queries.q1Count(spark, sf))
    // count(*) should read no data columns at all
    assert(p.contains("ReadSchema: struct<>"), p.take(2000))
  }

  test("x5 interval-overlap join is a bucket equi-join, never a nested loop") {
    val p = plan(graft.plans.RangeJoin.x5IntervalOverlap(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval-interval join degraded to a nested loop (O(|A| x |B|) at scale):\n" + p.take(2000))
  }

  test("q32 CUBE is one scan with map-side grouping-set expansion") {
    val p = plan(graft.analytics.SetOps.q32Cube(spark, sf))
    assert(p.contains("Expand"), "CUBE must expand grouping sets, not rescan:\n" + p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size <= 1,
      "CUBE must read the fact table once:\n" + p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "grouping sets must still partial-aggregate:\n" + p.take(2000))
  }

  test("q34 correlated subqueries decorrelate to joins (no per-row re-execution)") {
    val p = plan(graft.analytics.SetOps.q34CorrSubquery(spark, sf))
    assert(!p.contains("ScalarSubquery"),
      "correlated scalar subquery survived decorrelation:\n" + p.take(2000))
    assert(p.contains("Join"), "decorrelation should produce joins:\n" + p.take(2000))
  }

  test("s7 PQ assignment joins the broadcast codebook, never shuffles vectors") {
    val p = plan(Ann.s7PqCode(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "codebook join degraded to a vector-payload shuffle:\n" + p.take(2000))
  }

  test("d12 calibration pair source is equi-join only (no nested loop)") {
    val p = plan(Dedup.d12MinhashCalibration(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "calibration pair generation degraded to a nested loop:\n" + p.take(2000))
  }

  test("x7 typed Aggregator partial-aggregates map-side like a built-in") {
    val p = plan(graft.plans.Sketches.x7TypedAggregator(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "typed udaf should plan paired partial/final aggregates:\n" + p.take(2000))
  }

  test("x11: one fact shuffle feeds both aggregates via ReusedExchange") {
    val df = graft.plans.Bucketing.x11ExchangeReuse(spark, sf)
    df.collect() // AQE materializes stage reuse at runtime
    val p = plan(df)
    val initIdx = p.indexOf("== Initial Plan ==")
    val finalPlan = if (initIdx >= 0) p.substring(0, initIdx) else p
    assert(finalPlan.contains("ReusedExchange"),
      "second aggregate should reuse the repartition exchange:\n" + p.take(3000))
    // the fact table is scanned once in the final plan
    assert("FileScan parquet".r.findAllIn(finalPlan).size == 1, p.take(3000))
  }

  test("NO batch entry plans an unguarded cartesian / nested-loop join (full sweep)") {
    // Entries whose plans legitimately contain a BroadcastNestedLoopJoin:
    // every one is a 1-row scalar (or bounds/total row) broadcast across
    // the plan — the documented never-collect pattern, O(n) by design.
    val scalarBroadcast = Set(
      "o21_window_filter", "o29_minmax", "o30_prescriptive", "o5_pushdown_scan",
      "q7_scalar_subquery", "q14_today", "q15_query_on_query", "q26_gap_fill",
      "mt3_skew_audit", "x2_kmv_distinct", "st4_watermark_append",
      "s6_ann_recall", "p1_pipeline_e2e",
      "q44_sketch_rollup", // 1-row merged-sketch x 1-row exact-total
      "q23_approx_sketches", // r16: 1-row sketch agg x 1-row exact-distinct agg (the Expand-free split)
      "t14_tfidf",         // 1-row corpus-size N broadcast into the idf
      "t16_zipf_profile",  // 1-row totals x 1-row head-mass x 1-row slope fit
      "t19_source_mix",    // 1-row min-source-size cap broadcast into the rank filter
      // bounded-small-side products by design (not scalars, still O(n)):
      "mt4_fk_audit",  // 1-row child-count x 1-row orphan-count per edge
      "s1_ann_brute",  // the documented brute-force BASELINE: query side broadcast
      "s10_quant_recall", // s1's truth set + the same query-broadcast eval scan
      "s11_hamming_rerank", // same query-broadcast shape; stage-1 scans 16 B/vector sketches
      "s4_ann_ivf",    // corpus x |codebook|=8 centroid assignment
      "s12_kmeans_train", // same corpus x 8-centroid assignment, once per Lloyd's round
      "s13_trained_recall", // trained-cell assignment + s1's brute truth side
      "d15_semantic_dedup", // same s4 centroid assignment feeds the cells
      "d17_source_overlap", // mask table x broadcast source legend (<=63 rows) / pair legend (<=1953) — the r12 bitmask plan that REMOVED the shingle self-join
      "mt6_clustered_layout", // per-file stat table (<=ClusterFiles rows) range-overlap self-join
      "mt7_partition_overwrite") // 1-row max-day broadcast across the table
    // Streaming drains / external-side-effect mains: their DataFrames
    // are post-sink reads; their EXECUTED plans are audited by the
    // runtime sweep test below.
    def skip(n: String) =
      n.startsWith("st") || Set("p1_pipeline_e2e", "p5_stream_curation",
        "o8_json_raw", "o2_jdbc_roundtrip", "o1_csv_source").contains(n)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).flatMap { name =>
      val p = plan(SparkEntry.queries(name)(spark, sf))
      val cartesian = p.contains("CartesianProduct")
      val bnl = p.contains("BroadcastNestedLoopJoin") && !scalarBroadcast(name)
      if (cartesian || bnl) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"entries with unguarded product joins: ${offenders.mkString(", ")}")
  }

  test("codegen audit: CodegenFallback expressions ⊆ the documented allowlist (full sweep)") {
    // The enforcement arm of the round-12 no-lambda-HOF rule (measured:
    // a lambda HOF on a data-sized projection costs 1.6–4× the entry by
    // dropping out of whole-stage codegen — SCALING.md §round-12/13).
    // Every CodegenFallback expression in every gate entry's executed
    // plan must be allowlisted here WITH its reason; a new lambda HOF —
    // or any ScalaUDF — fails this test instead of landing unnoticed.
    //
    val aggMachinery = PlanSpec.AggMachinery
    // Per-entry lambda allowances, each with its boundedness/measured
    // argument. The lambda plumbing classes ride along with their HOF.
    val lambdaPlumbing = Set("LambdaFunction", "NamedLambdaVariable")
    val perEntry = Map(
      // q25 IS the HOF showcase entry — lambdas are its semantics
      "q25_array_hof" -> (Set("ArrayAggregate", "ArrayFilter", "ArraySort",
        "ArrayTransform") ++ lambdaPlumbing),
      // t4: one md5-per-shingle transform over a PRECOMPUTED zip array;
      // the digest dominates the lambda dispatch (measured r13,
      // SCALING.md) and the lambda-free alternative is a corpus
      // shuffle — a worse trade at every scale
      "t4_fingerprint" -> (Set("ArrayTransform") ++ lambdaPlumbing),
      // x7 is the typed Aggregator API showcase — ScalaAggregator is
      // the entry's point, allowed here and NOWHERE else
      "x7_typed_aggregator" -> Set("ScalaAggregator"))
    def skip(n: String) =
      n.startsWith("st") || Set("p1_pipeline_e2e", "p5_stream_curation",
        "o8_json_raw", "o2_jdbc_roundtrip", "o1_csv_source").contains(n)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).flatMap { name =>
      val got = graft.tools.CodegenAudit.fallbackNames(
        SparkEntry.queries(name)(spark, sf))
      val extra = got -- aggMachinery -- perEntry.getOrElse(name, Set.empty)
      if (extra.nonEmpty) Some(s"$name: ${extra.toSeq.sorted.mkString(" ")}") else None
    }
    assert(offenders.isEmpty,
      "non-allowlisted CodegenFallback expressions (new lambda HOF or UDF " +
        "on a gate entry — respell it or document it here):\n" +
        offenders.mkString("\n"))
  }

  test("codegen audit: streaming/pipeline entries — EXECUTED micro-batch + batch side-effect plans (runtime sweep)") {
    // Round-13 verdict finding 2: the static sweep above audits the
    // RETURNED DataFrame, which for streaming/pipeline/side-effect
    // entries is only a post-sink read — a lambda HOF in a streaming
    // projection executed inside a micro-batch was invisible to it.
    // This sweep runs each such entry once and audits every plan that
    // actually EXECUTED: micro-batch plans captured synchronously at
    // the Stream.drainObserver seam (every drain site funnels through
    // Stream.awaitDrained) and batch actions (zone writes, JDBC
    // round-trip, memory-sink reads) via a QueryExecutionListener.
    // Anti-vacuity: a streaming entry that yields ZERO captured
    // micro-batch plans fails — a Spark-internals rename breaking the
    // lastExecution reflection must read as a broken audit, not a
    // clean one.
    val entries = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      n.startsWith("st") || Set("p1_pipeline_e2e", "p5_stream_curation",
        "o8_json_raw", "o2_jdbc_roundtrip", "o1_csv_source").contains(n)
    }
    // Entries that drain at least one streaming query (everything here
    // except the batch-side-effect trio o1/o2/o8 and the batch-zone
    // pipeline p1).
    val streamless = Set("o1_csv_source", "o2_jdbc_roundtrip",
      "o8_json_raw", "p1_pipeline_e2e")
    val problems = entries.flatMap { name =>
      val r = graft.tools.CodegenAudit.runtimeFallbackNames(spark, name, sf)
      val extra = r.names -- PlanSpec.AggMachinery
      val vacuous = !streamless(name) && r.streamPlans == 0
      if (extra.nonEmpty)
        Some(s"$name: non-allowlisted ${extra.toSeq.sorted.mkString(" ")}")
      else if (vacuous)
        Some(s"$name: no micro-batch plan captured (audit went vacuous)")
      else if (r.batchPlans == 0)
        // batchPlans counts LISTENER-captured executions only (the
        // returned DF's own plan is excluded from the count), so this
        // catches a silently broken QueryExecutionListener channel —
        // every entry's df.count() must post at least one event.
        Some(s"$name: no listener-captured batch execution (audit went vacuous)")
      else None
    }
    assert(problems.isEmpty,
      "runtime codegen audit failures (lambda HOF/UDF inside a " +
        "micro-batch or side-effect execution, or a vacuous capture):\n" +
        problems.mkString("\n"))
  }
}

object PlanSpec {
  /** Globally allowed CodegenFallback names: Spark's declarative
    * AGGREGATE machinery and the INTERSECT/EXCEPT ALL generator.
    * Imperative eval is how Spark executes every agg function
    * (hash-agg buffers, partial → final); the CodegenFallback trait on
    * them is incidental — they are map-side-combined and group-sized,
    * never a per-row projection hot loop. Shared by the static sweep
    * (returned-DF plans) and the runtime sweep (micro-batch +
    * side-effect plans). */
  val AggMachinery: Set[String] = Set(
    "CollectSet", "CollectList",            // bounded collects (d3 bucket cap, q50 top-3, kmeans 8-cell legend)
    "Percentile", "ApproximatePercentile",  // q18/q23/q49
    "HyperLogLogPlusPlus", "ApproxTopK",    // q23/q43 sketches
    "HllSketchAgg", "HllSketchEstimate", "HllUnionAgg", // q44 mergeable HLL rollup
    "PivotFirst",                           // q24/q38 pivot agg
    "BloomFilterAggregate",                 // x8 bloom build (one sketch row)
    "BottomKSketch",                        // x2 — graft's own KMV agg
    "ReplicateRows")                        // q36 — Spark's INTERSECT/EXCEPT ALL generator
}
