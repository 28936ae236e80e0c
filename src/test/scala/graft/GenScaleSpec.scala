package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.GenScale

/** Pins the invariants the scale-stress generator's measurements rest
  * on (SCALING.md §round-9): if replication broke FK integrity, the
  * modular query panels, or the dim-stays-fixed rule, the measured
  * "exponents" would be comparing different workloads, not different
  * data sizes. The sf1/sf10 runs assume exactly what is asserted here.
  */
class GenScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val src = "/root/testdata/sf0.001"

  def gen(k: Int, skewPct: Int = 0): String = {
    val out = Files.createTempDirectory("graft_genscale_").toString
    GenScale.generate(spark, src, out, k, skewPct)
    out
  }

  test("K-times replication: fact counts ×K, dims fixed, FKs intact, panels capped") {
    val out = gen(3)
    def n(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    Seq("orders", "lineitem", "events", "documents", "embeddings").foreach {
      t => assert(n(out, t) == 3 * n(src, t), s"$t not 3x") }
    Seq("region", "nation").foreach { t =>
      assert(n(out, t) == n(src, t), s"dim $t grew") }

    // FK integrity inside every replica: no orphan customer keys
    val orders = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    assert(orders.join(cust, $"o_custkey" === $"c_custkey", "left_anti")
      .count() == 0, "replication broke orders→customer FK")

    // modular id selections are replica-invariant (STRIDE is their lcm):
    // each replica contributes the same share to a % selection
    val ev = spark.read.parquet(s"$out/events.parquet")
    val evSrc = spark.read.parquet(s"$src/events.parquet")
    assert(ev.filter(pmod($"event_id", lit(100L)) === 0).count() ==
      3 * evSrc.filter(pmod($"event_id", lit(100L)) === 0).count(),
      "modular selection not replica-invariant")

    // the capped ANN query panel must NOT grow with the corpus
    val panel = "vec_id % 100 = 0 AND vec_id < 20000"
    assert(spark.read.parquet(s"$out/embeddings.parquet").filter(panel).count() ==
      spark.read.parquet(s"$src/embeddings.parquet").filter(panel).count(),
      "query panel grew with K — recall evals would be quadratic again")
  }

  test("K-linearity: shipped entries relate EXACTLY between src and gen(K) dirs") {
    // Round-9 verdict task 5: GenScale output was unverified by
    // construction — a replication bug would silently invalidate every
    // measured scaling exponent. The replication scheme implies exact
    // relations for replica-invariant entries, pinned here across
    // families (analytics, dedup, multimodal, text, similarity,
    // streaming): counts and integer sums scale ×K, averages and
    // recall evals are bit-identical. Any drift means the sf1/sf10
    // stress measured a different workload, not a bigger one.
    val k = 3
    val out = gen(k)
    def run(name: String, dir: String) =
      SparkEntry.queries(name)(spark, dir)

    // q1: the global fact count scales ×K
    assert(run("q1_count", out).head.getLong(0) ==
      k * run("q1_count", src).head.getLong(0), "q1 count not ×K")

    // q2: averages are invariant (sum×K / count×K)
    assert(run("q2_avg", out).collect().toSeq ==
      run("q2_avg", src).collect().toSeq, "q2 averages drifted")

    // q5: per-group counts scale ×K with the SAME groups
    val q5src = run("q5_group_count", src).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val q5out = run("q5_group_count", out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q5out == q5src.map { case (g, n) => g -> n * k }, "q5 groups not ×K")

    // q10: timestamps are untouched, so per-minute averages of the
    // replicated values are bit-identical
    assert(run("q10_minute_avg", out).collect().toSeq ==
      run("q10_minute_avg", src).collect().toSeq, "q10 minute averages drifted")

    // d1: ciphered replica texts are cross-replica disjoint with
    // identical in-replica dup topology → survivor groups ×K
    assert(run("d1_exact_dedup", out).count() ==
      k * run("d1_exact_dedup", src).count(), "d1 survivors not ×K")

    // m5: digest groups ×K AND reclaimable bytes ×K (translate is
    // byte-length-preserving on ASCII)
    val (m5s, m5o) = (run("m5_asset_dedup", src), run("m5_asset_dedup", out))
    assert(m5o.count() == k * m5s.count(), "m5 digest groups not ×K")
    assert(m5o.agg(sum($"dup_bytes")).head.getLong(0) ==
      k * m5s.agg(sum($"dup_bytes")).head.getLong(0), "m5 dup_bytes not ×K")

    // t3: the rotation cipher is class-preserving ([a-z]→[a-z]) and
    // length-preserving, so per-doc token counts replicate exactly
    val (t3s, t3o) = (run("t3_token_count", src), run("t3_token_count", out))
    assert(t3o.count() == k * t3s.count(), "t3 rows not ×K")
    val Seq(wsS, bpeS) = t3s.agg(sum($"n_ws_tokens"), sum($"n_bpe_est"))
      .head.toSeq.map(_.asInstanceOf[Long])
    val Seq(wsO, bpeO) = t3o.agg(sum($"n_ws_tokens"), sum($"n_bpe_est"))
      .head.toSeq.map(_.asInstanceOf[Long])
    assert(wsO == k * wsS && bpeO == k * bpeS, "t3 token sums not ×K")

    // t7: doc_id shifts re-roll the md5 split hash per replica, so the
    // TOTAL is exactly ×K while per-split sizes are only proportional
    // (binomial re-roll) — assert total exact, splits within 2× of
    // proportional (tight enough to catch a broken splitter, loose
    // enough for the val/test splits' small-count variance)
    val t7s = run("t7_train_split", src).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t7o = run("t7_train_split", out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t7o.values.sum == k * t7s.values.sum, "t7 total not ×K")
    t7s.foreach { case (split, n) =>
      val got = t7o.getOrElse(split, 0L)
      assert(got >= k * n / 2 && got <= k * n * 2,
        s"t7 $split: $got far from proportional ${k * n}")
    }

    // s6: the recall eval panel is capped to replica 0, so the PANEL
    // (query ids, k) must be identical on the K× corpus. The recall
    // VALUES may drift by single hits: the rotation preserves
    // in-replica geometry but not cross-replica ordering, and a
    // rotated replica vector can legitimately enter a query's exact
    // top-k (measured: 1 of 5 queries at K=3), moving ground truth
    // and ANN hits alike. Pinned: same panel, per-query hit drift
    // ≤ 1 — a broken replicator (panel growth, recall collapse)
    // still fails loudly.
    def s6Map(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      r.getAs[Number](0).longValue ->
        (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue)
    }.toMap
    val s6s = s6Map(run("s6_ann_recall", src))
    val s6o = s6Map(run("s6_ann_recall", out))
    assert(s6o.keySet == s6s.keySet, "s6 query panel changed with K")
    s6s.foreach { case (q, (kk, hits)) =>
      val (kk2, hits2) = s6o(q)
      assert(kk2 == kk, s"s6 query $q: k changed $kk→$kk2")
      assert(math.abs(hits2 - hits) <= 1,
        s"s6 query $q: hits $hits→$hits2 — more than a cross-replica intruder explains")
    }

    // st1: streaming hourly counters — same windows, n and cents ×K
    val st1s = run("st1_stream_hourly", src).collect()
      .map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val st1o = run("st1_stream_hourly", out).collect()
      .map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(st1o == st1s.map { case (g, (n, c)) => g -> (n * k, c * k) },
      "st1 windows not ×K")
  }

  test("chaining: generating from a generated dir keeps ids and texts K²-distinct") {
    // Round-11 find: a FIXED stride is not closed under chaining —
    // once source ids span r·S the shifted copies collide, and because
    // the cipher nets out identically for colliding (r1, r2) pairs the
    // "K× corpus" silently collapses into duplicate ROWS (the chained
    // sf100 had 5 M document rows but 545 k distinct doc_ids; orders
    // 150 M rows / 16.35 M keys). The adaptive stride (strideFor) must
    // make gen∘gen behave exactly like one bigger generation.
    val mid = gen(3)
    val out = Files.createTempDirectory("graft_genscale_chain_").toString
    GenScale.generate(spark, mid, out, 3)
    def docs(d: String) = spark.read.parquet(s"$d/documents.parquet")
    def dOrders(d: String) = spark.read.parquet(s"$d/orders.parquet")
    val baseDocs = docs(src).count()
    assert(docs(out).count() == 9 * baseDocs, "chained rows not K²")
    assert(docs(out).select($"doc_id").distinct.count() == 9 * baseDocs,
      "chained doc_ids collide — stride not adaptive")
    assert(dOrders(out).select($"o_orderkey").distinct.count() ==
      9 * dOrders(src).count(), "chained order keys collide")
    // cross-replica cipher composition must not wrap: distinct text
    // classes scale exactly like one 9× generation would
    val baseClasses = docs(src).select(md5($"text")).distinct.count()
    assert(docs(out).select(md5($"text")).distinct.count() == 9 * baseClasses,
      "chained ciphers collided — dup rate inflated")
    // FK integrity survives the chain
    val cust = spark.read.parquet(s"$out/customer.parquet")
    assert(dOrders(out).join(cust, $"o_custkey" === $"c_custkey", "left_anti")
      .count() == 0, "chaining broke orders→customer FK")
  }

  test("K beyond the old cipher families: texts and embeddings stay K-distinct") {
    // The rotation cipher wrapped at 26 (K=100 ⇒ ~3.85 identical
    // copies of every text) and the embedding rotation at 64. The
    // keyed permutations must keep every replica's class its own.
    val k = 30
    val out = Files.createTempDirectory("graft_genscale_wide_").toString
    GenScale.generate(spark, src, out, k, 0, Seq("documents", "embeddings"))
    val d = spark.read.parquet(s"$out/documents.parquet")
    val baseClasses = spark.read.parquet(s"$src/documents.parquet")
      .select(md5($"text")).distinct.count()
    assert(d.select(md5($"text")).distinct.count() == k * baseClasses,
      s"cipher family wrapped below K=$k")
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val baseVecs = spark.read.parquet(s"$src/embeddings.parquet")
      .select(md5(to_json($"embedding"))).distinct.count()
    assert(e.select(md5(to_json($"embedding"))).distinct.count() == k * baseVecs,
      s"embedding transform family wrapped below K=$k")
  }

  test("skew mode: one hot key owns the requested share, total count unchanged") {
    val k = 3; val pct = 20
    val out = gen(k, pct)
    val ev = spark.read.parquet(s"$out/events.parquet")
    val total = ev.count()
    assert(total == k * spark.read.parquet(s"$src/events.parquet").count())
    val hot = ev.groupBy($"user_id").count().orderBy(desc("count"))
      .limit(1).collect()(0).getLong(1)
    val share = hot.toDouble / total
    // event_id % 100 < 20 selects exactly 20% of a dense id range; the
    // source ids are near-dense so the share lands close to pct
    assert(share > 0.15 && share < 0.30,
      f"hot share $share%.3f not near ${pct / 100.0}")
    // non-hot key topology is broadly preserved: a user vanishes only
    // if ALL its events fall in the re-keyed pct band (likely only for
    // single-event users), so distinct users stay near K× the source
    val dUsers = ev.select($"user_id").distinct.count()
    val dSrc = spark.read.parquet(s"$src/events.parquet")
      .select($"user_id").distinct.count()
    assert(dUsers <= k * dSrc + 1 && dUsers >= (k * dSrc * 7) / 10,
      s"distinct users $dUsers far from ${k * dSrc}")
  }
}
