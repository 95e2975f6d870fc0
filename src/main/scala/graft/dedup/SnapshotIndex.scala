package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-isolated wrapper around the saved [[MinHashIndex]] — the
  * missing concurrency story for the staged-swap maintenance ops:
  * [[MinHashIndex.compactSaved]]/[[MinHashIndex.removeSaved]] rewrite
  * the LIVE `bands`/`shingles` directories through delete+rename, so a
  * reader whose lazy plan listed files before the swap dereferences
  * deleted parquet mid-scan. Here maintenance never touches a
  * published epoch: each rewrite lands in a fresh `epoch=<N+1>/`
  * directory tree, is marked complete with a `_PUBLISHED` file, and
  * only then becomes current — the mini-Iceberg pointer-swap pattern
  * at directory granularity.
  *
  * Layout:
  * {{{
  *   <dir>/epoch=<N>/bands/...      (partitioned by band_id, as before)
  *   <dir>/epoch=<N>/shingles/...
  *   <dir>/epoch=<N>/_PUBLISHED     (epoch is complete and readable)
  *   <dir>/_CURRENT                 (content: the current epoch number)
  * }}}
  *
  * Guarantees:
  *  - **Readers pin an epoch**: [[load]] resolves the current epoch
  *    ONCE and every file its plans touch lives under that epoch dir —
  *    a compaction or takedown publishing epoch N+1 mid-query cannot
  *    invalidate it.
  *  - **Publish is crash-safe**: an epoch missing `_PUBLISHED` is
  *    invisible (a crashed half-written rewrite is garbage, never
  *    current); the `_CURRENT` pointer is rewritten via delete+create,
  *    and if a crash lands in that window readers fall back to the
  *    max PUBLISHED epoch — which is exactly the epoch the pointer was
  *    about to name.
  *  - **Bounded retention**: publish(N) retires epochs < N−1 — the
  *    previous epoch survives one full maintenance cycle, giving
  *    in-flight readers (which pinned at most one publish ago) their
  *    files. A deployment with longer-running readers raises
  *    `retainEpochs`.
  *
  * Appends ([[append]]) stay NON-transactional by design, exactly like
  * the flat index: they add files inside the current epoch (admissions
  * are additive and retry-idempotent — [[graft.streaming.Streams.dedupIndexStream]]'s
  * contract); only the REWRITING ops (compact, takedown) need epochs,
  * because only they delete files a reader may hold.
  *
  * At 100 TB nothing here adds data-path cost: reads and probes are
  * the same band-pruned plans against one epoch's directories; an
  * epoch swap moves a pointer file, not data.
  */
object SnapshotIndex {

  /** A pinned read handle: `index` plans read only `epoch`'s files. */
  final case class Snapshot(index: MinHashIndex.Index, epoch: Long,
      dir: String)

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def epochPath(dir: String, epoch: Long) = s"$dir/epoch=$epoch"

  /** Initialize: build + save the corpus index as epoch 0. */
  def init(index: MinHashIndex.Index, spark: SparkSession,
      dir: String): Unit = {
    MinHashIndex.save(index, epochPath(dir, 0L))
    publish(spark, dir, 0L, retainEpochs = 1)
  }

  /** The current epoch: the `_CURRENT` pointer, falling back to the
    * max `_PUBLISHED` epoch when the pointer is mid-rewrite (or was
    * lost to a crash between its delete and create).
    */
  def currentEpoch(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    val ptr = new Path(dir, "_CURRENT")
    val fromPtr =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      }
    fromPtr.getOrElse {
      val published = publishedEpochs(spark, dir)
      require(published.nonEmpty, s"no published epoch under $dir")
      published.max
    }
  }

  /** All epochs carrying a `_PUBLISHED` marker, ascending. */
  def publishedEpochs(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark, dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return Seq.empty
    val EpochRe = "epoch=(\\d+)".r
    fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case EpochRe(n)
            if fs.exists(new Path(st.getPath, "_PUBLISHED")) => Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

  /** Pin the current epoch and load its index. */
  def load(spark: SparkSession, dir: String): Snapshot = {
    val e = currentEpoch(spark, dir)
    Snapshot(MinHashIndex.load(spark, epochPath(dir, e)), e, dir)
  }

  /** Load a SPECIFIC published epoch (audit / reproduce-yesterday's-
    * probe reads).
    */
  def loadEpoch(spark: SparkSession, dir: String, epoch: Long): Snapshot = {
    require(publishedEpochs(spark, dir).contains(epoch),
      s"epoch $epoch is not published under $dir")
    Snapshot(MinHashIndex.load(spark, epochPath(dir, epoch)), epoch, dir)
  }

  /** Append admissions into the CURRENT epoch (additive, the flat
    * index's retry contract — see class doc).
    */
  def append(spark: SparkSession, newDocs: DataFrame, dir: String,
      idCol: String, textCol: String, n: Int): Unit =
    MinHashIndex.append(newDocs, epochPath(dir, currentEpoch(spark, dir)),
      idCol, textCol, n)

  /** Compact the current epoch's accreted files into epoch N+1 and
    * publish it. Readers pinned to N keep their files (retention);
    * new loads see N+1. Returns the published epoch.
    */
  def compact(spark: SparkSession, dir: String,
      rowsPerFile: Long = 1L << 20, retainEpochs: Int = 1): Long =
    rewriteToNext(spark, dir, retainEpochs) { (cur, next) =>
      val idx = MinHashIndex.load(spark, cur)
      idx.bands.repartition(org.apache.spark.sql.functions.col("band_id"))
        .write.mode("overwrite").partitionBy("band_id")
        .parquet(s"$next/bands")
      val nRows = idx.shingles.count()
      val nOut = math.max(1L, (nRows + rowsPerFile - 1) / rowsPerFile).toInt
      idx.shingles.repartition(nOut)
        .write.mode("overwrite").parquet(s"$next/shingles")
    }

  /** Takedown into epoch N+1: future probes under the new epoch can
    * never match `ids`; a reader pinned to N still sees them until its
    * epoch retires — the isolation semantics a governance pipeline
    * wants (in-flight jobs finish on the snapshot they started with,
    * the NEXT run picks up the scrub). Returns the published epoch.
    */
  def remove(spark: SparkSession, dir: String, ids: Seq[Long],
      retainEpochs: Int = 1): Long = {
    import org.apache.spark.sql.functions.col
    val drop = ids.toSet
    rewriteToNext(spark, dir, retainEpochs) { (cur, next) =>
      val idx = MinHashIndex.load(spark, cur)
      idx.bands.filter(!col("doc_id").isInCollection(drop))
        .repartition(col("band_id"))
        .write.mode("overwrite").partitionBy("band_id")
        .parquet(s"$next/bands")
      idx.shingles.filter(!col("doc_id").isInCollection(drop))
        .write.mode("overwrite").parquet(s"$next/shingles")
    }
  }

  private def rewriteToNext(spark: SparkSession, dir: String,
      retainEpochs: Int)(rewrite: (String, String) => Unit): Long = {
    val cur = currentEpoch(spark, dir)
    val next = cur + 1
    rewrite(epochPath(dir, cur), epochPath(dir, next))
    publish(spark, dir, next, retainEpochs)
    next
  }

  /** Mark `epoch` published, swing `_CURRENT` to it, retire epochs
    * older than `epoch - retainEpochs`.
    */
  private def publish(spark: SparkSession, dir: String, epoch: Long,
      retainEpochs: Int): Unit = {
    val fs = fsOf(spark, dir)
    fs.create(new Path(epochPath(dir, epoch), "_PUBLISHED"), true).close()
    // pointer rewrite: delete+create leaves a window where _CURRENT is
    // absent — currentEpoch's max-published fallback resolves to
    // exactly this epoch inside that window (it is the newest marker)
    val ptr = new Path(dir, "_CURRENT")
    fs.delete(ptr, false)
    val out = fs.create(ptr, true)
    try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
    publishedEpochs(spark, dir).filter(_ < epoch - retainEpochs)
      .foreach(e => fs.delete(new Path(epochPath(dir, e)), true))
  }
}
