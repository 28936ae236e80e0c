package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `bitmask_indices(array<bigint>) → array<int>` — the ascending set
  * bit positions of a multi-word bitmask (word w bit b → index
  * 64·w + b). The decode step of d17's thousands-of-sources plan:
  * each per-shingle mask row explodes into its member source indices
  * so pair counting becomes Σ C(k,2) bucket-local work instead of the
  * matrix pass's |shingles| × C(S,2) bit tests (`Dedup.scala`,
  * `crossSourceOverlap`).
  *
  * WHY a custom Expression: the composable spelling is
  * `filter(transform(sequence(0, 64·W−1), i -> ...bit test...), ...)`
  * — two lambda HOFs, CodegenFallback, on a projection sized by the
  * distinct-shingle table (corpus-sublinear but data-sized), exactly
  * what the round-13 codegen audit bans. This generates the tight
  * bitCount/numberOfTrailingZeros loop instead and stays inside
  * whole-stage codegen.
  *
  * NULL contract ([[ArrayFoldKernel]] discipline): null input → NULL
  * (UnaryExpression default); a null WORD slot → NULL, matching what
  * the lambda bit test would fold (`shiftright(null, b)` is null, the
  * filter predicate is null → element dropped — but a null word means
  * the mask itself is undefined, and silently dropping 64 sources is
  * the array-kernel divergence round 13 just outlawed, so the kernel
  * refuses instead). Mask words come from `bit_or` partial aggregates
  * and are never null on the production path; the per-slot check is
  * only emitted when the input's ArrayType says `containsNull`.
  */
case class BitmaskIndices(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bitmask_indices"

  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val w = words.numElements()
    var cnt = 0
    var i = 0
    while (i < w) {
      if (words.isNullAt(i)) return null
      cnt += java.lang.Long.bitCount(words.getLong(i)); i += 1
    }
    val out = new Array[Int](cnt)
    var p = 0
    i = 0
    while (i < w) {
      var m = words.getLong(i)
      while (m != 0L) {
        out(p) = (i << 6) + java.lang.Long.numberOfTrailingZeros(m)
        p += 1
        m &= m - 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val m = ctx.freshName("m")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $w = $a.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $w; $i++) {
         |  $nullCheck
         |  $cnt += java.lang.Long.bitCount($a.getLong($i));
         |}
         |if (!${ev.isNull}) {
         |  int[] $out = new int[$cnt];
         |  int $p = 0;
         |  for (int $i = 0; $i < $w; $i++) {
         |    long $m = $a.getLong($i);
         |    while ($m != 0L) {
         |      $out[$p++] = ($i << 6) + java.lang.Long.numberOfTrailingZeros($m);
         |      $m &= $m - 1L;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
