package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Best-fit-decreasing sequence packing — the quality-preserving twin
  * of the prefix-sum concat-and-chunk packer (pack_sequences): no
  * document is ever split across a training sequence; instead each doc
  * is placed whole into the open bin with the LEAST remaining room
  * that still fits it (ties → lowest bin id; bins are `capacity`
  * tokens). This is the packing used when truncation hurts
  * (instruction tuning, long-context mixes); the cost of "no splits" is
  * per-bin slack, which the fill_ratio column reports.
  *
  * Scale shape: packing is inherently sequential STATE, so the corpus
  * is first split into `shards` independent packing problems by a
  * deterministic id hash (pmod(xxhash64(id), shards) — spec-pinned),
  * and BFD runs per-shard inside one `flatMapGroups` — shards are the
  * parallelism unit, sized so one shard's (id, len) pairs fit an
  * executor (16 bytes a doc: a 1e9-doc corpus at 4096 shards is ~4 MB
  * per group). The in-memory sort makes the result a pure function of
  * the shard's MEMBERSHIP — independent of partition count and arrival
  * order (the DeterminismSweep gate covers it like every other query).
  *
  * BFD here scans open bins linearly per doc (O(bins) worst case) —
  * fine at shard granularity; swap in a best-remaining tree if shards
  * must be huge. A doc longer than `capacity` opens its own overflow
  * bin (reported with fill_ratio > 1) rather than being dropped or
  * silently truncated — the caller decides policy downstream.
  */
object BestFitPack {

  /** Pack (idCol, lenCol) rows; returns one row per bin:
    * (shard, bin_id, n_docs, tokens_used, fill_ratio).
    */
  def pack(docs: DataFrame, idCol: String, lenCol: String,
      capacity: Int, shards: Int): DataFrame = {
    require(capacity > 0 && shards > 0)
    val prepared = docs
      .select(col(idCol).cast("long").as("id"),
        col(lenCol).cast("int").as("len"))
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))
      .select(col("id"), col("len"), col("shard"))
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaInt, Encoders.scalaInt)
    implicit val outEnc = Encoders.tuple(Encoders.scalaInt,
      Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong)
    prepared.as[(Long, Int, Int)]
      .groupByKey(_._3)(Encoders.scalaInt)
      .flatMapGroups { (shard: Int, it: Iterator[(Long, Int, Int)]) =>
        // decreasing length, ties by id: deterministic for any arrival order
        val sorted = it.toArray.sortBy(d => (-d._2, d._1))
        val used = scala.collection.mutable.ArrayBuffer.empty[Long]
        val nDocs = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.foreach { case (_, len, _) =>
          // best fit: the fullest bin that still has room (min slack,
          // ties → lowest bin id)
          var best = -1
          var b = 0
          while (b < used.length) {
            if (used(b) + len <= capacity &&
                (best < 0 || used(b) > used(best))) best = b
            b += 1
          }
          if (best >= 0) { used(best) += len; nDocs(best) += 1 }
          else { used += len.toLong; nDocs += 1L }
        }
        used.indices.iterator.map(b => (shard, b, nDocs(b), used(b)))
      }
      .toDF("shard", "bin_id", "n_docs", "tokens_used")
      .withColumn("fill_ratio",
        (floor(col("tokens_used") / lit(capacity.toDouble) * 10000 + 0.5)
          .cast("double") / 10000))
  }
}
