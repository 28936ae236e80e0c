package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cleaning

/** Property-based invariants (SURVEY.md §5 item 3): clamps, ordering,
  * idempotence. Uses ScalaCheck generators directly (deterministic
  * seed, 200 cases per property); Column-expression properties are
  * evaluated through one small DataFrame per property.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("normalizeName is idempotent and space/BOM/case-free for arbitrary strings") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val once = Cleaning.normalizeName("﻿ " + s + " ")
      assert(Cleaning.normalizeName(once) == once)
      assert(!once.exists(_.isWhitespace) && !once.contains("﻿") && once == once.toLowerCase)
    }
  }

  test("score components are clamped to [0,10] for arbitrary inputs") {
    val gen = for {
      sum  <- Gen.chooseNum(-1e6, 1e6)
      jam  <- Gen.chooseNum(0.0, 1e5)
      nBau <- Gen.chooseNum(0L, 100000L)
      hum  <- Gen.chooseNum(0.0, 100.0)
      aqi  <- Gen.chooseNum(0.0, 2000.0)
    } yield (sum, jam, nBau, hum, aqi)
    val df = spark.createDataFrame(samples(gen))
      .toDF("sum_skor", "jam", "n_bau", "humidity", "aqi")
      .select(
        round(least(greatest(col("sum_skor"), lit(0.0)) / 15, lit(10.0)), 2).as("kotor"),
        round(least(col("jam") * 0.3 + col("n_bau") * 0.7 + col("humidity") / 100 * 2,
          lit(10.0)), 2).as("bau"),
        round(least(col("aqi") / 50, lit(10.0)), 2).as("aqi_score"))
    df.collect().foreach { r =>
      Seq("kotor", "bau", "aqi_score").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 10.0, s"$c=$v")
      }
    }
  }

  test("recommendation tiers are monotone in skor_final (ignoring odor override)") {
    def tier(v: Double): Int =
      if (v >= 6.0) 3 else if (v >= 5.0) 2 else if (v >= 4.0) 1 else 0
    samples(Gen.zip(Gen.chooseNum(0.0, 10.0), Gen.chooseNum(0.0, 10.0))).foreach {
      case (a, b) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        assert(tier(lo) <= tier(hi))
        assert((0 to 3).contains(tier(lo)))
    }
  }

  test("more activity never lowers the dirtiness sum (monotone accumulation)") {
    samples(Gen.listOf(Gen.chooseNum(0.0, 100.0))).foreach { contributions =>
      val partial = contributions.take(contributions.length / 2).sum
      val full = contributions.sum
      assert(math.min(full / 15, 10.0) >= math.min(partial / 15, 10.0) - 1e-9)
    }
  }
}
