package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The buffer/result of [[CentsStats]]: a running (n, sum, min, max)
  * over exact integer cents. */
case class CentsSummary(n: Long, sum: Long, min: Long, max: Long)

/** X-7 — a typed `Aggregator` (the PUBLIC custom-aggregate API, vs
  * x2's catalyst-level `TypedImperativeAggregate`): one-pass
  * (n, sum, min, max) over integer cents. Registered through
  * `functions.udaf`, it plans as a regular partial/final aggregate —
  * the merge is associative+commutative, so map-side combine and AQE
  * re-plans apply exactly as for built-ins, and exact integer algebra
  * keeps any reassociation bit-identical (the same invariant the whole
  * money surface relies on).
  */
object CentsStats extends Aggregator[Long, CentsSummary, CentsSummary] {
  override def zero: CentsSummary = CentsSummary(0L, 0L, Long.MaxValue, Long.MinValue)

  override def reduce(b: CentsSummary, a: Long): CentsSummary =
    CentsSummary(b.n + 1, b.sum + a, math.min(b.min, a), math.max(b.max, a))

  override def merge(x: CentsSummary, y: CentsSummary): CentsSummary =
    CentsSummary(x.n + y.n, x.sum + y.sum, math.min(x.min, y.min), math.max(x.max, y.max))

  override def finish(r: CentsSummary): CentsSummary =
    if (r.n == 0) CentsSummary(0L, 0L, 0L, 0L) else r

  override def bufferEncoder: Encoder[CentsSummary] = Encoders.product[CentsSummary]
  override def outputEncoder: Encoder[CentsSummary] = Encoders.product[CentsSummary]
}
