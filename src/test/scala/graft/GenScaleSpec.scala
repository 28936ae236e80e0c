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
