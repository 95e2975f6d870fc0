package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + shard assignment for training-data
  * export. A training run wants the corpus in a random-but-reproducible
  * order, split into N roughly-equal shards, with no coordination
  * between the writers of different shards.
  *
  * The shuffle key is a seeded md5 prefix of the document id —
  * order-by-hash IS the shuffle (every engine sorts the same way, reruns
  * are identical, and there is no driver-side RNG to coordinate). The
  * shard is the key mod N, so shard membership and intra-shard order
  * both follow from the one hash. This mirrors the reference's
  * partitioner contract (KeyFieldBasedPartitioner,
  * MapStreamJob.java:869): route by key hash, order within the
  * partition — here the "key" is synthetic and uniform by construction.
  *
  * Scale (100 TB): the hash is a map-only expression; the export is ONE
  * hash exchange (`repartition(nShards, shard)`) + in-partition sort —
  * no global sort, no skew (md5 prefixes are uniform). At production
  * scale swap md5-hex-prefix for `xxhash64(id, seed)` to skip the string
  * round-trip; kept as md5 here so the DuckDB oracle computes the
  * identical key.
  */
object ShuffleShard {

  /** Seeded uniform hash in [0, 2^32): first 8 hex digits of
    * md5("<id>:<seed>"). Identical in DuckDB:
    * ('0x' || substr(md5(id || ':' || seed), 1, 8))::BIGINT.
    */
  def hashKey(id: Column, seed: Long): Column =
    conv(substring(md5(concat(id.cast("string"), lit(s":$seed"))), 1, 8),
      16, 10).cast("long")

  /** Adds (shuffle_key, shard) columns. */
  def assign(df: DataFrame, idCol: String, seed: Long, nShards: Int): DataFrame =
    df.withColumn("shuffle_key", hashKey(col(idCol), seed))
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)))

  /** Adds (bucket, split) columns: the mix_split 97∕2∕1
    * train∕val∕test assignment as a pure function of the id (seeded
    * md5 bucket mod 100). Factored here so the batch query
    * (CurationQueries.mixSplit) and the streaming ingest path
    * (Streams.splitStream) consume the IDENTICAL arithmetic — a doc
    * must land in the same split whether it arrives in a bulk load or
    * on the live feed, or the eval set silently leaks into training.
    */
  def splitAssign(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("bucket", pmod(hashKey(col(idCol), seed), lit(100L)))
      .withColumn("split",
        when(col("bucket") < 97, "train")
          .when(col("bucket") < 99, "val")
          .otherwise("test"))

  /** Writes one parquet directory per shard value, rows ordered by the
    * shuffle key within each file — the physical layout a data loader
    * streams sequentially. One exchange, sort local to each shard.
    */
  def writeShards(assigned: DataFrame, nShards: Int, path: String): Unit =
    assigned
      .repartition(nShards, col("shard"))
      // leading `shard` matters: the dynamic-partition writer requires
      // rows ordered by the partition column and would otherwise insert
      // its own (non-stable) sort, destroying the shuffle_key order
      .sortWithinPartitions(col("shard"), col("shuffle_key"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
}
