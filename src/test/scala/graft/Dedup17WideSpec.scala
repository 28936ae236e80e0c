package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-12 verdict's d17 finding: the single-BIGINT source mask
  * `require`d ≤ 63 sources — a real crawl's source list would THROW,
  * not degrade. Round 13 generalizes to ⌈S/64⌉ mask words; this spec
  * gates the >63-source path (which the driver testdata, with its
  * handful of sources, never exercises) against the straightforward
  * distinct+self-join reference on a synthetic 100-source corpus.
  */
class Dedup17WideSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("d17 multi-word bitmask ≡ distinct+self-join reference at 100 sources (W=2)") {
    // 100 sources × 6 docs; overlap is engineered deterministically:
    // every source carries a shared boilerplate line (all-pairs
    // overlap), sources in the same mod-7 family share a family line
    // (block overlap crossing the word boundary at idx 64), and each
    // doc adds unique filler. matrixMax = MaxValue forces the MATRIX
    // pass (the production default switches to the exploded plan past
    // MatrixMaxSources = 16) so the multi-word bit-test path keeps
    // dedicated multi-word coverage.
    val docs = (0 until 100).flatMap { s0 =>
      (0 until 6).map { d =>
        val fam = s0 % 7
        val text = s"shared boilerplate line common to all sources " +
          s"family f$fam marker line for group f$fam overlap " +
          s"unique filler s$s0 d$d tail token$s0 token$d end"
        (s0.toLong * 10 + d, f"src$s0%03d", text)
      }
    }.toDF("doc_id", "source", "text")

    val got = graft.dedup.Dedup
      .crossSourceOverlap(spark, docs, matrixMax = Int.MaxValue)
      .collect().toSeq.map(_.toString).sorted

    val sh = graft.functions.Shingles.kgramRows(docs, Seq("source"), k = 3)
      .distinct()
    val counts = sh.groupBy($"source").agg(count(lit(1)).as("n"))
    val want = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(counts.select($"source".as("src_a"), $"n".as("n_a")), "src_a")
      .join(counts.select($"source".as("src_b"), $"n".as("n_b")), "src_b")
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"n_inter")
      .collect().toSeq.map(_.toString).sorted

    assert(got.nonEmpty, "fixture must produce overlap pairs")
    // all-pairs boilerplate ⇒ the full C(100,2) matrix is present
    assert(got.size == 100 * 99 / 2, s"expected 4950 pairs, got ${got.size}")
    assert(got == want)
  }

  test("d17 exploded-index plan ≡ self-join reference past MatrixMaxSources (150 sources, W=3)") {
    // 150 > MatrixMaxSources → the default path is the
    // bitmask_indices decode + bucket-local pair enumeration. Same
    // engineered-overlap construction as the 100-source fixture, now
    // crossing TWO word boundaries (idx 64 and 128); mod-11 families
    // so family overlap is sparser than the all-pairs boilerplate
    // floor.
    assert(150 > graft.dedup.Dedup.MatrixMaxSources)
    val docs = (0 until 150).flatMap { s0 =>
      (0 until 4).map { d =>
        val fam = s0 % 11
        val text = s"shared boilerplate line common to all sources " +
          s"family f$fam marker line for group f$fam overlap " +
          s"unique filler s$s0 d$d tail token$s0 token$d end"
        (s0.toLong * 10 + d, f"src$s0%03d", text)
      }
    }.toDF("doc_id", "source", "text")

    val got = graft.dedup.Dedup.crossSourceOverlap(spark, docs)
      .collect().toSeq.map(_.toString).sorted

    val sh = graft.functions.Shingles.kgramRows(docs, Seq("source"), k = 3)
      .distinct()
    val counts = sh.groupBy($"source").agg(count(lit(1)).as("n"))
    val want = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(counts.select($"source".as("src_a"), $"n".as("n_a")), "src_a")
      .join(counts.select($"source".as("src_b"), $"n".as("n_b")), "src_b")
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"n_inter")
      .collect().toSeq.map(_.toString).sorted

    assert(got.size == 150 * 149 / 2, s"expected 11175 pairs, got ${got.size}")
    assert(got == want)
  }

  test("d17 gate-width (W=1) plan is unchanged in shape: one corpus aggregate, broadcast legends only") {
    val sf = "/root/testdata/sf0.001"
    val p = graft.dedup.Dedup.d17CrossSourceOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      "d17 must never shuffle-join the mask table against a legend:\n" + p.take(3000))
    // the only joins are broadcast (legend) joins
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }
}
