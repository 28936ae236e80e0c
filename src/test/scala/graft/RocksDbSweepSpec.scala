package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** RocksDB state-store sweep (round-8 verdict task 6): st10 already
  * runs on RocksDB by construction (transformWithState requires it);
  * this spec flips every OTHER stateful streaming entry onto the
  * RocksDB provider and requires bit-identical output vs the default
  * HDFS-backed (heap) provider. At 100 TB streaming state must live
  * off-heap — watermark maps, dedup sets, join buffers, session
  * windows — and "the provider is swappable" is a claim only a
  * both-providers run can make. The provider is a session conf read at
  * query START, so setting it around the entry call is exactly how a
  * production job selects it (spark.sql.streaming.stateStore
  * .providerClass).
  */
class RocksDbSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Every stateful streaming entry not already RocksDB-pinned:
    * watermarked aggs (st1/st4/st5), dedup state (st6), stream-stream
    * join buffers (st9/st11/st19/st20/st21), session windows (st12),
    * flatMapGroupsWithState sessions (st3), anti-join state (st13). */
  val entries = Seq(
    "st1_stream_hourly", "st3_stateful_sessions", "st4_watermark_append",
    "st5_sliding_watermark", "st6_stream_dedup", "st9_stream_stream_join",
    "st11_stream_outer_join", "st12_session_window", "st13_stream_anti_join",
    "st19_stream_right_outer", "st20_stream_semi_join",
    "st21_stream_full_outer")

  def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq

  entries.foreach { name =>
    test(s"$name: RocksDB provider yields the heap provider's exact output") {
      val heap = rows(name)
      assert(heap.nonEmpty, s"$name produced no rows on the default provider")
      val prev = spark.conf.getOption(ProviderKey)
      spark.conf.set(ProviderKey, RocksDb)
      try {
        val rocks = rows(name)
        assert(rocks == heap,
          s"$name diverged on RocksDB: ${rocks.size} vs ${heap.size} rows; " +
            s"first diff ${rocks.zip(heap).find { case (a, b) => a != b }}")
      } finally prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
