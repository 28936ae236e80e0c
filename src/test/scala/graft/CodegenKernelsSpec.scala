package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The round-12 codegen rewrites, pinned against the lambda-HOF
  * reference spellings they replaced. Each rewrite shipped because the
  * HOF form is CodegenFallback (1.6–4× the entry, SCALING.md
  * §round-12); these tests keep the cheap forms from ever drifting
  * semantically — every comparison is value-exact (bit-exact for the
  * sequential double folds, which accumulate in the same index order
  * by construction).
  */
class CodegenKernelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  // --- Shingles.kgramRows ≡ transform(sequence(...)) lambda ----------

  private def lambdaKgrams(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select($"id", explode(expr(
      s"""CASE WHEN size(split(text, ' ')) >= $k
            THEN transform(sequence(0, size(split(text, ' ')) - $k),
                 i -> concat_ws(' ', slice(split(text, ' '), i + 1, $k)))
            ELSE CAST(array() AS array<string>) END""")).as("shingle"))

  private val edgeDocs = Seq(
    "",                        // splits to [""] — below every k
    "a",                       // 1 token
    "a b",                     // exactly 2
    "a b c",                   // exactly 3
    "a b c d e",               // exactly 5
    "a  b c",                  // consecutive spaces → empty middle token
    " a b c",                  // leading space → empty first token
    "a b c ",                  // trailing space → empty last token
    "x y x y x",               // repeats (duplicate shingles preserved)
    "one two three four five six seven")

  for (k <- Seq(2, 3, 5)) {
    test(s"kgramRows(k=$k) ≡ transform-lambda enumeration (edge docs + random)") {
      val rand = samples(Gen.listOfN(8, Gen.oneOf("a", "b", "cc", "", "d e"))
        .map(_.mkString(" ")), 60)
      val df = (edgeDocs ++ rand).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = graft.functions.Shingles.kgramRows(df, Seq("id"), k)
        .orderBy($"id", $"shingle").collect().toSeq
      val want = lambdaKgrams(df, k)
        .orderBy($"id", $"shingle").collect().toSeq
      assert(got == want)
    }
  }

  // --- native folds ≡ HOF folds (bit-exact) ---------------------------

  test("l2sq_f64 ≡ aggregate(zip_with(...)) bit-for-bit on random doubles") {
    graft.functions.NativeFunctions.register(spark)
    val gen = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    val rows = samples(Gen.zip(gen, gen), 150)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val df = rows.toDF("a", "b")
      .select(call_function("l2sq_f64", $"a", $"b").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z)")
          .as("hof"))
    // bit-exact, not tolerance: same sequential accumulation order
    assert(df.collect().forall { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    })
  }

  test("dot_i64 ≡ integer fold, and dot_i64(q,q) ≡ sum-of-squares fold") {
    graft.functions.NativeFunctions.register(spark)
    val gen = Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))
    val rows = samples(Gen.zip(gen, gen), 150)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val df = rows.toDF("q", "qa")
      .select(call_function("dot_i64", $"q", $"qa").as("native"),
        expr(s"aggregate(sequence(0, 15), 0L, (a, i) -> a + q[i] * qa[i])").as("hof"),
        call_function("dot_i64", $"q", $"q").as("native_qq"),
        expr("aggregate(transform(q, x -> x * x), 0L, (a, x) -> a + x)").as("hof_qq"))
    assert(df.collect().forall(r =>
      r.getLong(0) == r.getLong(1) && r.getLong(2) == r.getLong(3)))
  }

  // --- d17 bitmask plan ≡ the self-join reference shape ---------------

  test("d17 bitmask overlap ≡ distinct+self-join reference at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.dedup.Dedup.d17CrossSourceOverlap(spark, sf)
      .collect().toSeq.map(_.toString).sorted
    val sh = graft.functions.Shingles.kgramRows(
        graft.io.Tables.documents(spark, sf), Seq("source"), k = 3)
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
    assert(got == want)
  }

  // --- t15 array pairing ≡ the window-lead reference shape ------------

  test("t15 arrays_zip bigram pairing ≡ posexplode+lead window at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.io.Tables.documents(spark, sf)
    val got = graft.text.TextOps.t15BigramLm(spark, sf)
      .collect().toSeq.map(_.toString).sorted
    // reference: the pre-round-12 window form, inlined
    val toks = docs
      .select($"doc_id", $"source", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .filter($"tok" =!= "")
    val bigrams = toks
      .withColumn("next", lead($"tok", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id").orderBy($"pos")))
      .filter($"next".isNotNull)
    val train = bigrams.filter($"source" === "src0")
    val c12 = train.groupBy($"tok", $"next").agg(count(lit(1)).as("c12"))
    val c1 = toks.filter($"source" === "src0")
      .groupBy($"tok").agg(count(lit(1)).as("c1"))
    val model = c12.join(c1, "tok")
      .select($"tok", $"next",
        round(log($"c12".cast("double") / $"c1") * 1e6).cast("bigint").as("lp_micro"))
    val want = bigrams.join(model, Seq("tok", "next"), "left")
      .select($"doc_id", coalesce($"lp_micro", lit(-10000000L)).as("lp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"lp").cast("bigint").as("sum_lp_micro"))
      .withColumn("low_quality",
        ($"sum_lp_micro" < $"n_bigrams" * -3000000L).cast("int"))
      .collect().toSeq.map(_.toString).sorted
    assert(got == want)
  }
}
