package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** RENDEZVOUS (highest-random-weight) sharding — elastic shard
  * assignment for the persistent state tables (dedup seen-tables, LSH
  * buckets, register sketches): each key scores every shard with a
  * seeded hash and lands on the argmax. The HRW property is the whole
  * point: growing N → N+1 moves ONLY the keys whose new argmax is the
  * new shard (≈ 1/(N+1) of them) — no ring, no token metadata,
  * nothing else reshuffles. Contrast `hash(key) mod N`, where
  * resizing moves (N−1)/N of all keys and forces a full state
  * rewrite.
  *
  * Deterministic: the score is the seeded 60-bit md5 hash of
  * "key|shard" (ties — ~2⁻⁶⁰ — break to the larger shard id, pinned
  * by the struct comparison); any engine reproduces the assignment.
  * Scale shape: one narrow projection (N hashes per row, argmax via
  * `array_max` over structs) — no shuffle, no join, no state. */
object Sharding {

  /** Shard id in [0, nShards) for `key` — a pure column expression. */
  def rendezvousShard(key: Column, nShards: Int, seed: Int = 11): Column = {
    require(nShards >= 1, "nShards must be >= 1")
    array_max(transform(sequence(lit(0), lit(nShards - 1)), s =>
      struct(
        T.hash60(concat(key.cast("string"), lit("|"), s.cast("string")),
          seed).as("h"),
        s.cast("int").as("s"))))
      .getField("s")
  }

  /** Per-shard key counts under `nShards` shards. */
  def shardCounts(df: DataFrame, key: Column, nShards: Int,
      seed: Int = 11): DataFrame =
    df.select(rendezvousShard(key, nShards, seed).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_docs"))
      .select(lit(nShards).as("n_shards"), col("shard"), col("n_docs"))
}
