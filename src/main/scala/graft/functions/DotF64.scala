package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared shape of the three native array-fold kernels: typed
  * array-pair input check plus the NULL contract that makes each
  * kernel VALUE-IDENTICAL to the lambda-HOF fold it replaced, on all
  * inputs (not just the clean ones):
  *
  *   - mismatched lengths → NULL. `zip_with` pads the shorter array
  *     with nulls, the padded product is null, and `aggregate`'s `+`
  *     folds null in → null; the `sequence(0, dim-1)`-indexed spelling
  *     reads `q[i]` out of range → null → same. A silent min-length
  *     truncation here (the pre-round-13 behavior) was a latent
  *     divergence for any SQL consumer of the registered functions.
  *   - a null ELEMENT in either array → NULL, same fold argument.
  *     This is what keeps s10 honest on zero vectors: an all-zero
  *     embedding makes the quantization scale NULL via `nullif`, so q
  *     is an array of null slots — the HOF fold returned NULL qq/cosq
  *     (and NULLs sort LAST under desc), whereas reading null slots as
  *     0 would make cosq = dot/0 → NaN, which Spark orders HIGHEST
  *     under desc: the zero vector would silently top-rank for every
  *     query. The kernels therefore propagate NULL; pinned with null
  *     cases in CodegenKernelsSpec.
  *
  * The per-element null check is only generated when either input's
  * ArrayType says `containsNull` — the embeddings hot path reads
  * parquet arrays, so the check is a bitset probe per slot and the
  * branch is never-taken/perfectly predicted on real corpora.
  */
trait ArrayFoldKernel { self: BinaryExpression =>
  // Result can be NULL even for non-null inputs (null slot / length
  // mismatch), so nullability must not derive from the children.
  override def nullable: Boolean = true

  protected def elemType: DataType

  protected def mayHaveNullElems: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(e, _) => e == elemType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<${elemType.simpleString}>, array<${elemType.simpleString}>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * WHY a custom Expression (the one place built-ins genuinely fall
  * short): the composable form `aggregate(zip_with(a, b, *), 0.0, +)`
  * is a higher-order function — HOFs are CodegenFallback in Spark, so
  * every similarity operator's innermost loop (|Q|·N·dim multiplies)
  * drops out of whole-stage codegen into interpreted lambda calls with
  * per-element closure dispatch. This expression generates the tight
  * Java loop instead and keeps the projection inside codegen.
  *
  * Accumulation is sequential in index order — bit-identical to the
  * HOF fold it replaces (and to the DuckDB oracle's list
  * comprehension), so swapping it in changes NO oracle output. Null
  * slots and length mismatch propagate NULL exactly like the fold —
  * see [[ArrayFoldKernel]].
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression with ArrayFoldKernel {

  override def dataType: DataType = DoubleType
  override protected def elemType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance over two `array<double>` columns — sequential
  * Σ(xᵢ−yᵢ)² in index order, bit-identical to the HOF fold
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, +)` it
  * replaces (and to the oracle's list comprehension), including the
  * NULL cases ([[ArrayFoldKernel]]). Same rationale as [[DotF64]]:
  * HOFs are CodegenFallback, and this fold is the innermost loop of
  * the PQ assignment (corpus × codebook × sub-dim). */
case class L2SqF64(left: Expression, right: Expression)
    extends BinaryExpression with ArrayFoldKernel {

  override def dataType: DataType = DoubleType
  override protected def elemType: DataType = DoubleType
  override def prettyName: String = "l2sq_f64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    final double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two `array<bigint>` columns — sequential
  * Σ xᵢ·yᵢ (exact integer arithmetic, so order is irrelevant to the
  * value; sequential anyway for symmetry). Replaces the
  * `aggregate(sequence(0, dim-1), 0L, (a,i) -> a + q[i]*qa[i])`
  * fold — the per-pair hot loop of the int8-recall audit (corpus ×
  * query panel × dim), which as a HOF ran interpreted with TWO lambda
  * dispatches per element. NULL slots / length mismatch → NULL like
  * the fold ([[ArrayFoldKernel]]) — this is load-bearing for s10's
  * zero-vector rows, whose quantized q is an all-null array. */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression with ArrayFoldKernel {

  override def dataType: DataType = LongType
  override protected def elemType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the native functions (idempotent). */
object NativeFunctions {
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f64", exprs => DotF64(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2sq_f64", exprs => L2SqF64(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_i64", exprs => DotI64(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quant_i64", exprs => QuantI64(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "affine_floor_f64", exprs => AffineFloorF64(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sum_i64", exprs => SumI64(exprs(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sum_f64", exprs => SumF64(exprs(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "phash_ascii", exprs => PhashAscii(exprs(0), PhashAscii.foldableBits(exprs(1))),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bitmask_indices", exprs => BitmaskIndices(exprs(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_words", exprs => SimhashWords(exprs(0), Simhash.foldableBits(exprs(1))),
      "built-in")
  }
}
