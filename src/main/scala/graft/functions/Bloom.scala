package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build/probe surface over Spark's native (codegen'd,
  * partial-aggregated) bloom expressions — the same machinery Spark's own
  * runtime-filter optimization injects, exposed here as an explicit operator
  * so a pipeline can build a filter ONCE over a reference set (eval-suite
  * n-grams, a denylist, an id blacklist) and probe it map-side across a
  * 100 TB corpus scan.
  *
  * Why this beats the broadcast-hash-join prefilter at scale: a broadcast
  * join materializes every distinct key string in an executor hash map
  * (~50-100 bytes/key); the bloom filter spends ~9-12 BITS per key at 1%
  * false positives — a 40-80x smaller broadcast for reference sets of
  * hundreds of millions of keys, where the hash relation would OOM the
  * executors but the filter still fits in a few hundred MB. False positives
  * only ever ADD candidate rows; callers confirm candidates with an exact
  * join afterwards (see `TrainPrep.qDecontaminateBloom`), so results are
  * byte-identical to the unfiltered plan.
  *
  * Keys are xxhash64'd to LongType on both build and probe sides — the
  * canonical encoding for `BloomFilterAggregate`/`might_contain`, keeping
  * both sides whole-stage-codegen'd (xxhash64 is a codegen expression;
  * BloomFilterMightContain deserializes the filter once per task).
  */
object Bloom {

  /** Aggregate column: serialized bloom filter (BinaryType) over
    * `xxhash64(c)`, sized for `expectedItems` at ~1% FPP. Partial
    * aggregation applies: each task builds a local filter, merge ORs the
    * bit arrays — one tiny binary crosses the shuffle per partition. */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    Bridge.column(
      new BloomFilterAggregate(Bridge.expression(xxhash64(c)), expectedItems)
        .toAggregateExpression())

  /** Build the filter eagerly and return it as a driver-side constant.
    * The filter is a STATISTIC (like quantile boundaries), not data — for a
    * reference set of n keys it is ~1.2·n bytes; callers pass a bounded
    * `expectedItems`, so the collect is bounded too. */
  def build(df: DataFrame, c: Column, expectedItems: Long): Array[Byte] =
    df.select(bloomAgg(c, expectedItems).as("bf")).head().getAs[Array[Byte]](0)

  /** Probe column: `might_contain(filter, xxhash64(c))`. The serialized
    * filter ships as a foldable literal inside the task closure (the
    * constant-fold path `BloomFilterMightContain` requires), so the probe
    * is a map-only predicate — no join, no shuffle. */
  def mightContain(filter: Array[Byte], c: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType), Bridge.expression(xxhash64(c))))
}
