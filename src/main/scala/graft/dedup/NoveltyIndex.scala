package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Epochs

/** Persistent corpus n-gram set — the INCREMENTAL crawl-novelty story:
  * q_crawl_novelty's "marginal value of the next crawl" metric needs
  * the OLD corpus's distinct gram set on every run, and recomputing it
  * is a full-corpus scan + distinct each time — the one cost that
  * cannot be O(new crawl) without a persisted index. This store is
  * that index: the corpus's distinct 60-bit gram hashes (the SAME
  * tokenize → word-n-gram → md5-prefix arithmetic the full recompute
  * uses — [[gramHashes]] is the single definition both ride), written
  * once, bucketed by hash prefix, and maintained under the
  * [[graft.util.Epochs]] snapshot/lease machinery exactly like
  * [[MinHashIndex]]/[[SnapshotIndex]]:
  *
  *  - **probe** is map-only on the new crawl until ONE (8-byte gh)
  *    anti-join against the index — O(new crawl grams), never
  *    O(corpus);
  *  - **append** admits a crawl's NOVEL grams only (the probe already
  *    computed them), so tomorrow's probe sees today's admissions
  *    without a rebuild;
  *  - **compact** re-distincts and right-sizes files into epoch N+1
  *    under the maintenance lease ([[Epochs.withMaintenanceLease]] +
  *    [[Epochs.rewriteToNextChecked]] — the checked-rewrite fence);
  *    readers pin an epoch and are never disturbed.
  *
  * Physical-duplicate contract (the snapshot indexes' retry contract,
  * restated for a SET): the logical content is the distinct gram set;
  * files may transiently carry duplicates (a crash-retried append, or
  * the fence's re-append after a raced epoch advance) because every
  * read path is duplicate-insensitive — probes anti-join (a dup on
  * the build side changes nothing) and compaction re-distincts. The
  * append-≡-rebuild and compaction-invariance pins live in DedupSpec.
  *
  * At 100 TB the index is gram-scale (the honest floor for corpus-level
  * novelty) but the DAILY job touches it through one bucketed
  * equi-join — the corpus text is never re-read. When approximate
  * novelty is enough, the documented cheaper tier is a membership
  * sketch over the same gh column (dedup_bloom's
  * [[graft.functions.BloomFilter]] machinery): KB–MB of broadcast
  * state, zero join, at the price of a bounded false-"seen" rate.
  *
  * Reference anchor: the reference pipeline re-derives corpus state
  * per run (hadoop-multiple-streaming MultiStreamJobRunner.java:34-78
  * launches each job against the full input set); the persisted-index
  * shape is the Spark-native replacement for that rescan.
  */
object NoveltyIndex {

  /** Hash-prefix bucket count for the persisted layout: one directory
    * per bucket, so compaction targets one file per bucket and a
    * future bucket-wise join can co-locate without an extra shuffle.
    */
  val NBuckets = 64

  /** A pinned read handle: `grams` (column `gh`) reads only `epoch`'s
    * files.
    */
  final case class Snapshot(grams: DataFrame, epoch: Long, dir: String)

  /** The shared gram arithmetic — tokenize → word n-grams → 60-bit
    * md5-prefix hash (long). ONE definition corpus-wide: the full
    * recompute (q_crawl_novelty), this index, and its probes all call
    * here, so "probe ≡ recompute" holds by construction on the gram
    * side. Wide gram strings die map-side; only 8-byte hashes cross
    * any exchange.
    */
  def gramHashes(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(explode(graft.text.TextOps.wordNgrams(
        graft.text.TextOps.tokens(col(textCol)), n)).as("g"))
      .select(gh(col("g")).as("gh"))

  /** [[gramHashes]] keeping a grouping column (the probe's per-source
    * rollup needs it).
    */
  def sourceGramHashes(docs: DataFrame, sourceCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(sourceCol), explode(graft.text.TextOps.wordNgrams(
        graft.text.TextOps.tokens(col(textCol)), n)).as("g"))
      .select(col(sourceCol), gh(col("g")).as("gh"))

  private def gh(g: org.apache.spark.sql.Column) =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  private def bucketed(grams: DataFrame): DataFrame =
    grams.withColumn("b", pmod(col("gh"), lit(NBuckets)))

  private def gramsPath(epochDir: String) = s"$epochDir/grams"

  /** Index a corpus: distinct grams, bucketed, published as epoch 0. */
  def init(spark: SparkSession, docs: DataFrame, dir: String,
      textCol: String, n: Int): Unit = {
    bucketed(gramHashes(docs, textCol, n).distinct())
      .write.mode("overwrite").partitionBy("b")
      .parquet(gramsPath(Epochs.epochPath(dir, 0L)))
    Epochs.publish(spark, dir, 0L)
  }

  /** Pin the current epoch and load its gram set. */
  def load(spark: SparkSession, dir: String): Snapshot = {
    val e = Epochs.current(spark, dir)
    Snapshot(spark.read.parquet(gramsPath(Epochs.epochPath(dir, e)))
      .select(col("gh")), e, dir)
  }

  /** Per-source novelty of a new crawl against the indexed corpus —
    * the EXACT output shape (and arithmetic) of the full recompute:
    * (source, n_grams distinct, n_novel unseen-anywhere, novelty_bp
    * integer basis points). The new side is map-only to its distinct
    * (source, gh) pairs; `n_novel` comes from a LEFT ANTI join on the
    * 8-byte gh — duplicate-insensitive on the index side by anti-join
    * semantics, so the physical-duplicate contract never inflates a
    * count. Two |sources|-row rollups + one |sources|-row join close
    * it out.
    *
    * Deliberate plan trade (PlanSpec-pinned): `n_grams` and `n_novel`
    * each consume the new side, so the new crawl's gram pass runs
    * TWICE. The alternative — one pass with a left join + seen flag —
    * needs the INDEX side distinct-exchanged per probe to stay
    * duplicate-safe, i.e. a shuffle of the corpus-scale gram set to
    * save a map-side re-derivation of the crawl-scale side. At 100 TB
    * the corpus set dwarfs any daily crawl; paying the small side
    * twice is the right plan.
    */
  def probe(snapshot: Snapshot, newDocs: DataFrame, sourceCol: String,
      textCol: String, n: Int): DataFrame = {
    val newG = sourceGramHashes(newDocs, sourceCol, textCol, n).distinct()
    val total = newG.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_grams"))
    val novel = newG.join(snapshot.grams, Seq("gh"), "left_anti")
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_novel"))
    total.join(novel, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000 div n_grams"))
  }

  /** Admit a crawl: append its NOVEL grams (vs the current epoch) into
    * the current epoch. Runs the appenders' half of the maintenance
    * fence verbatim ([[Epochs.awaitNoMaintenance]] — write, wait out
    * any in-flight lease, re-read the epoch, re-append on advance):
    * a compaction that raced this append either captured the files in
    * its re-listed rewrite or the loop re-appends them into the new
    * epoch; a duplicate from the re-append is harmless by the
    * physical-duplicate contract.
    */
  def append(spark: SparkSession, newDocs: DataFrame, dir: String,
      textCol: String, n: Int): Unit =
    appendFrom(spark, newDocs, dir, Epochs.current(spark, dir), textCol, n)

  /** [[append]] starting from an already-resolved epoch — exposed for
    * the race spec (simulates an epoch published between resolution
    * and append).
    */
  private[graft] def appendFrom(spark: SparkSession, newDocs: DataFrame,
      dir: String, startEpoch: Long, textCol: String, n: Int): Unit = {
    var e = startEpoch
    var stable = false
    while (!stable) {
      val idx = spark.read
        .parquet(gramsPath(Epochs.epochPath(dir, e))).select(col("gh"))
      bucketed(gramHashes(newDocs, textCol, n).distinct()
          .join(idx, Seq("gh"), "left_anti"))
        .write.mode("append").partitionBy("b")
        .parquet(gramsPath(Epochs.epochPath(dir, e)))
      Epochs.awaitNoMaintenance(spark, dir)
      val now = Epochs.current(spark, dir)
      if (now == e) stable = true else e = now
    }
  }

  /** Rewrite the current epoch's accreted files into epoch N+1 —
    * re-distincted (the physical-duplicate contract's restore point)
    * and one file per bucket directory — and publish it under the
    * maintenance lease + checked-rewrite fence. Probe results are
    * byte-identical before/after (spec-pinned); only the layout
    * changes. Returns the published epoch.
    */
  def compact(spark: SparkSession, dir: String,
      retainEpochs: Int = 1): Long =
    Epochs.withMaintenanceLease(spark, dir) {
      Epochs.rewriteToNextChecked(spark, dir, retainEpochs) { (cur, next) =>
        bucketed(spark.read.parquet(gramsPath(cur))
            .select(col("gh")).distinct())
          .repartition(col("b"))
          .write.mode("overwrite").partitionBy("b")
          .parquet(gramsPath(next))
      }
    }
}
