package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.util.Epochs

/** Snapshot-isolated face of [[IvfPqIndex]] — the serving-index
  * concurrency story [[graft.dedup.SnapshotIndex]] gives the MinHash
  * index, applied to the IVFADC artifact: the flat
  * [[IvfPqIndex.compactSaved]] rewrites the live `cells` table through
  * delete+rename, so a search whose lazy plan listed cell files before
  * the swap dereferences deleted parquet mid-scan. Here every rewrite
  * materializes a complete `epoch=<N+1>/` artifact (codebooks +
  * centroids + cells) and becomes current only when published
  * ([[graft.util.Epochs]]); searches pin one epoch's directories for
  * their whole run and survive any number of concurrent compactions
  * within the retention window.
  *
  * Appends land in the CURRENT epoch only — unlike the dedup indexes
  * there is no epoch-advance re-append loop, because duplicate code
  * rows are NOT harmless to a top-k search (a duplicated id could
  * occupy two of the k slots). The contract is the single-maintainer
  * cadence every lake compaction runs under (the same one
  * [[graft.streaming.Streams.compactMv]] documents): run
  * [[compact]]/[[remove]] between ingest batches, never concurrently
  * with an in-flight [[append]]. Reads need no cadence — that is the
  * point of the snapshot.
  *
  * At 100 TB nothing here adds search cost: the probed-cell partition
  * pruning operates on one epoch's `cells` tree exactly as on the flat
  * layout; the KB-scale models are copied per rewrite (two tiny
  * parquet round-trips); an epoch swap moves a pointer file.
  */
object IvfPqSnapshot {

  /** A pinned read handle: `index` plans read only `epoch`'s files. */
  final case class Snapshot(index: IvfPqIndex, epoch: Long, dir: String)

  /** Initialize: save the fitted index as epoch 0. */
  def init(index: IvfPqIndex, spark: SparkSession, dir: String): Unit = {
    index.save(Epochs.epochPath(dir, 0L))
    Epochs.publish(spark, dir, 0L)
  }

  def currentEpoch(spark: SparkSession, dir: String): Long =
    Epochs.current(spark, dir)

  def publishedEpochs(spark: SparkSession, dir: String): Seq[Long] =
    Epochs.published(spark, dir)

  /** Pin the current epoch and load its index. */
  def load(spark: SparkSession, dir: String): Snapshot = {
    val e = Epochs.current(spark, dir)
    Snapshot(IvfPqIndex.load(spark, Epochs.epochPath(dir, e)), e, dir)
  }

  /** Load a SPECIFIC published epoch (reproduce yesterday's search). */
  def loadEpoch(spark: SparkSession, dir: String, epoch: Long): Snapshot = {
    require(Epochs.published(spark, dir).contains(epoch),
      s"epoch $epoch is not published under $dir")
    Snapshot(IvfPqIndex.load(spark, Epochs.epochPath(dir, epoch)),
      epoch, dir)
  }

  /** Encode and append a new batch's codes into the CURRENT epoch's
    * cells table (frozen-quantizer contract, [[IvfPqIndex.append]]).
    * Single-maintainer cadence vs [[compact]]/[[remove]] — class doc.
    */
  def append(spark: SparkSession, dir: String,
      newVectors: org.apache.spark.sql.DataFrame,
      idCol: String, vecCol: String): Unit =
    IvfPqIndex.append(spark, Epochs.epochPath(dir, Epochs.current(spark, dir)),
      newVectors, idCol, vecCol)

  /** Compact the current epoch's accreted cell files into epoch N+1
    * and publish it: codes repartitioned one-file-per-cell, models
    * copied verbatim. Searches pinned to N keep their files; new
    * loads see N+1. Returns the published epoch.
    */
  def compact(spark: SparkSession, dir: String,
      retainEpochs: Int = 1): Long =
    Epochs.rewriteToNext(spark, dir, retainEpochs) { (cur, next) =>
      copyModels(spark, cur, next)
      spark.read.parquet(s"$cur/cells")
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$next/cells")
    }

  /** Takedown into epoch N+1: searches under the new epoch can never
    * return `ids`; a search pinned to N finishes on its snapshot.
    * Returns the published epoch.
    */
  def remove(spark: SparkSession, dir: String, ids: Seq[Long],
      retainEpochs: Int = 1): Long = {
    val drop = ids.toSet
    Epochs.rewriteToNext(spark, dir, retainEpochs) { (cur, next) =>
      copyModels(spark, cur, next)
      val cells = spark.read.parquet(s"$cur/cells")
      val idCol = cells.columns.filterNot(Set("cell", "codes")).head
      cells.filter(!col(idCol).isInCollection(drop))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$next/cells")
    }
  }

  /** The immutable KB-scale models ride each rewrite verbatim: two
    * single-file parquet round-trips (schema-preserving, no
    * format-specific knowledge here).
    */
  private def copyModels(spark: SparkSession, cur: String,
      next: String): Unit = {
    spark.read.parquet(s"$cur/codebooks").coalesce(1)
      .write.mode("overwrite").parquet(s"$next/codebooks")
    spark.read.parquet(s"$cur/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$next/centroids")
  }
}
