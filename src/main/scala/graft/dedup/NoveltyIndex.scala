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
  * equi-join — the corpus text is never re-read. The CHEAPER tier on
  * top of that join is the epoch's **bloom membership sketch** over
  * the same gh column (dedup_bloom's [[graft.functions.BloomFilter]]
  * machinery), persisted beside the gram files and OR-merged on load:
  * with `prefilter = true`, [[probe]] broadcasts the KB–MB filter,
  * every bloom-NEGATIVE gram is PROVEN novel map-side (bloom answers
  * have no false negatives), and only the bloom-positive residue —
  * true matches plus the ~fpp false-positive sliver — pays the exact
  * anti-join. Prefiltered output ≡ plain probe output EXACTLY
  * (spec-pinned), because the one-sided error only ever routes grams
  * INTO the exact join, never around it. The torn-write direction is
  * guarded the same way: appends land their bloom row BEFORE their
  * gram files, so a crash between the two leaves extra bits (a
  * slightly higher fpp), never a file gram the sketch would deny.
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

  /** Target gh rows per write task for a fused-path append (~32 MB of
    * longs before encoding): the write-task count derives from the
    * probe's own novel-gram count, so a small daily crawl writes one
    * file wave instead of a full shuffle-partition wave of near-empty
    * parquet writers, and a huge one still caps at one task per
    * bucket.
    */
  val AppendGramsPerTask = 4L << 20

  /** False-positive rate the epoch blooms are sized for. The filter
    * for n grams costs ~1.2 bytes/gram at 0.005 — a 1e9-gram corpus
    * index carries a ~1.2 GB sketch, which is when the caller shards
    * the key space or simply skips the prefilter; at the daily-crawl
    * scales the tier targets, the broadcast is KB–MB.
    */
  val BloomFpp = 0.005

  /** A pinned read handle: `grams` (column `gh`) reads only `epoch`'s
    * files; `bloom` is the epoch's OR-merged membership sketch (None
    * for a pre-sketch epoch — [[probe]] then ignores `prefilter`).
    */
  final case class Snapshot(grams: DataFrame, epoch: Long, dir: String,
      bloom: Option[Array[Byte]] = None)

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

  private def bloomPath(epochDir: String) = s"$epochDir/bloom"

  /** The epoch's gram set, empty-tree-safe: an epoch whose write left
    * no data files (empty corpus) reads as the EMPTY gram set — the
    * semantically right answer ("nothing has been seen") — instead of
    * dying in parquet schema inference on a _SUCCESS-only directory.
    */
  private def epochGrams(spark: SparkSession, epochDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(gramsPath(epochDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus returns null when no path component matches at all
    if (Option(fs.globStatus(new org.apache.hadoop.fs.Path(p, "*/*.parquet")))
        .forall(_.isEmpty))
      spark.range(0).select(col("id").as("gh"))
    else
      // schema pinned (gh data column + b partition dir): the layout is
      // this object's own, so inference would re-read a footer per load
      // for a schema that never changes — the streaming loop loads the
      // epoch once per batch, and at corpus scale inference is an extra
      // driver-side footer read on every probe
      spark.read.schema("gh BIGINT, b INT").parquet(gramsPath(epochDir))
        .select(col("gh"))
  }

  /** One bloom row (serialized filter, header-carrying) over `grams`'
    * gh column, appended to the epoch's bloom table. gh is already a
    * 60-bit hash; [[graft.functions.BloomUtil]] re-avalanches it
    * (splitmix64 double hashing), so feeding it raw is sound.
    */
  private def appendBloomRow(spark: SparkSession, epochDir: String,
      grams: DataFrame, numBits: Int, numHashes: Int): Unit = {
    graft.functions.GraftFunctions.register(spark)
    grams.agg(call_function("graft_bloom_agg", col("gh"),
        lit(numBits), lit(numHashes)).as("bf"))
      .coalesce(1)
      .write.mode("append").parquet(bloomPath(epochDir))
  }

  /** Build the epoch's sketch fresh from its written gram files —
    * init's and compact's path (right-sized: n is the actual distinct
    * gram count, read from the parquet footers). Degenerate-corpus
    * guards: an epoch with NO gram files (empty corpus — the write
    * left only _SUCCESS) stays sketchless (probe's documented
    * pre-sketch fallback), and the sizing n is floored at 64 keys so
    * optimalNumHashes never exceeds [[graft.functions.BloomFilterAgg]]'s
    * k ≤ 32 bound on a near-empty gram set (n = 1 would size k = 44;
    * flooring only over-sizes the filter, which tightens fpp).
    */
  private def writeFreshBloom(spark: SparkSession, epochDir: String): Unit = {
    val grams = epochGrams(spark, epochDir)
    val n0 = grams.count()
    if (n0 == 0L) return
    val n = math.max(64L, n0)
    val m = graft.functions.BloomUtil.optimalNumBits(n, BloomFpp)
    val k = math.min(32, graft.functions.BloomUtil.optimalNumHashes(m, n))
    appendBloomRow(spark, epochDir, grams, m, k)
  }

  /** The epoch's membership sketch: all bloom rows OR-merged (an
    * appended epoch carries one row per admitted crawl — same (m, k)
    * by construction, and OR is exactly the [[graft.functions
    * .BloomFilterAgg]] merge). None for a pre-sketch epoch.
    */
  def loadBloom(spark: SparkSession, dir: String,
      epoch: Long): Option[Array[Byte]] = {
    val p = new org.apache.hadoop.fs.Path(
      bloomPath(Epochs.epochPath(dir, epoch)))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      // schema pinned for the same reason as the gram read: the bloom
      // table is this object's own one-column layout
      val rows = spark.read.schema("bf BINARY").parquet(p.toString).collect()
        .map(_.getAs[Array[Byte]](0))
      if (rows.isEmpty) None
      else {
        val (k0, acc) = graft.functions.BloomUtil.deserializeWords(rows.head)
        rows.tail.foreach { b =>
          val (k, w) = graft.functions.BloomUtil.deserializeWords(b)
          require(k == k0 && w.length == acc.length,
            s"NoveltyIndex.loadBloom: mixed filter geometry under $p " +
              s"(k=$k0/${k}, words=${acc.length}/${w.length}) — the " +
              "epoch's sketch is unusable; compact to rebuild it")
          var i = 0
          while (i < acc.length) { acc(i) |= w(i); i += 1 }
        }
        Some(graft.functions.BloomUtil.serialize(acc, k0))
      }
    }
  }

  /** Index a corpus: distinct grams, bucketed, published as epoch 0
    * (with the epoch's membership sketch built from the written
    * files, BEFORE publish — an unpublished torn init is invisible).
    */
  def init(spark: SparkSession, docs: DataFrame, dir: String,
      textCol: String, n: Int): Unit = {
    val epochDir = Epochs.epochPath(dir, 0L)
    // co-locate each bucket before the partitioned write (the compact
    // layout, from birth): without this every distinct-exchange task
    // writes into every bucket dir — tasks × NBuckets small files,
    // and every later probe/append lists and opens all of them
    bucketed(gramHashes(docs, textCol, n).distinct())
      .repartition(col("b"))
      .write.mode("overwrite").partitionBy("b")
      .parquet(gramsPath(epochDir))
    writeFreshBloom(spark, epochDir)
    Epochs.publish(spark, dir, 0L)
  }

  /** Pin the current epoch and load its gram set + membership sketch. */
  def load(spark: SparkSession, dir: String): Snapshot = {
    val e = Epochs.current(spark, dir)
    Snapshot(epochGrams(spark, Epochs.epochPath(dir, e)), e, dir,
      loadBloom(spark, dir, e))
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
    *
    * `prefilter = true` engages the epoch's bloom sketch (the
    * q_bloom_join shape, inverted for an ANTI join): the filter rides
    * ONE one-row broadcast, bloom-NEGATIVE grams are novel by the
    * no-false-negative guarantee and skip the join entirely, and only
    * the bloom-positive residue pays the exact anti-join — so the
    * index side of the join sees a candidate stream shrunk to the
    * true-seen fraction + fpp. Output is EXACTLY the plain probe's
    * (spec-pinned): the sketch's one-sided error can only route a
    * gram into the exact join, never mark it seen. A pre-sketch
    * snapshot (bloom = None) ignores the flag and runs the plain
    * path — the request is an optimization, not a semantics switch.
    */
  def probe(snapshot: Snapshot, newDocs: DataFrame, sourceCol: String,
      textCol: String, n: Int, prefilter: Boolean = false): DataFrame = {
    val newG = sourceGramHashes(newDocs, sourceCol, textCol, n).distinct()
    val total = newG.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_grams"))
    val novelG = snapshot.bloom match {
      case Some(bf) if prefilter =>
        val s = newDocs.sparkSession
        graft.functions.GraftFunctions.register(s)
        import s.implicits._
        val bloomDf = Seq(Tuple1(bf)).toDF("graft_bloom")
        val flagged = newG.crossJoin(broadcast(bloomDf))
          .withColumn("maybe_seen", call_function("graft_bloom_contains",
            col("graft_bloom"), col("gh")))
          .drop("graft_bloom")
        flagged.filter(!col("maybe_seen"))
          .select(col(sourceCol), col("gh"))
          .unionByName(flagged.filter(col("maybe_seen"))
            .select(col(sourceCol), col("gh"))
            .join(snapshot.grams, Seq("gh"), "left_anti"))
      case _ =>
        newG.join(snapshot.grams, Seq("gh"), "left_anti")
          .select(col(sourceCol), col("gh"))
    }
    val novel = novelG.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_novel"))
    total.join(novel, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000 div n_grams"))
  }

  /** The approximate ZERO-JOIN novelty tier — the probe for when the
    * answer gates a decision ("is this crawl worth admitting?") and a
    * bounded undercount is acceptable: per-source novelty from the
    * membership sketch ALONE. One map-side gram pass + one distinct
    * exchange + a |sources|-row rollup; the gram index files are never
    * opened — at 100 TB the daily cost is the crawl's own gram pass
    * plus a KB–MB broadcast, full stop.
    *
    * Error contract (one-sided, from the bloom's one-sided error):
    * a bloom false positive marks a genuinely-novel gram "seen", so
    * `n_novel_lb` is a LOWER BOUND on the exact probe's n_novel —
    * never an overcount — and the deficit is bounded in expectation by
    * fpp × n_grams ([[BloomFpp]] at epoch birth; appends drift it up
    * until compact right-sizes). Columns are suffixed `_lb` so a
    * reader can never mistake the tier for the exact one. Fails
    * loudly on a pre-sketch epoch — silently degrading to the exact
    * join would invert the tier's entire point.
    */
  def probeApprox(snapshot: Snapshot, newDocs: DataFrame,
      sourceCol: String, textCol: String, n: Int): DataFrame = {
    val bf = snapshot.bloom.getOrElse(throw new IllegalStateException(
      s"NoveltyIndex.probeApprox: epoch ${snapshot.epoch} under " +
        s"${snapshot.dir} carries no membership sketch — compact to " +
        "build one, or use probe()"))
    val s = newDocs.sparkSession
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val bloomDf = Seq(Tuple1(bf)).toDF("graft_bloom")
    sourceGramHashes(newDocs, sourceCol, textCol, n).distinct()
      .crossJoin(broadcast(bloomDf))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(!call_function("graft_bloom_contains",
            col("graft_bloom"), col("gh")), 1L).otherwise(0L))
          .as("n_novel_lb"))
      .withColumn("novelty_bp_lb", expr("n_novel_lb * 10000 div n_grams"))
  }

  /** Probe + admit FUSED for the streaming acquisition loop — one
    * shared gram pass instead of the 4–6 the unfused pair pays (probe
    * derives the batch's gram set for the `n_grams` rollup AND for each
    * prefilter branch; append then re-derives it from the raw text and
    * re-reads the epoch's gram files to re-anti-join). Here the batch's
    * distinct (source, gh) pairs and the novel subset are each
    * materialized ONCE (eager localCheckpoint — batch-scale by the
    * O(new crawl) contract, reclaimed by the ContextCleaner when the
    * batch's frames drop) and every consumer reads the pinned copy:
    * the probe rollups, the admit's bloom row, and the admit's gram
    * files. Output rows and LOGICAL on-disk state are identical to
    * `probe()` followed by `append()` (file sizing differs — the write
    * task count is derived from the novel count instead of the shuffle
    * default; every read path is layout-insensitive):
    *
    *  - the gh set admit writes IS `distinct gh` of the probe's novel
    *    (source, gh) pairs — same anti-join, same epoch;
    *  - the bloom row consumes the pinned pairs pre-distinct (bit-set
    *    idempotence: bloom(multiset) ≡ bloom(set), byte-identical) and
    *    reuses the snapshot's sketch GEOMETRY (every row under an
    *    epoch shares (m, k) by construction, so geometry from the
    *    pinned sketch ≡ geometry from a re-read);
    *  - the appenders' maintenance fence is intact: if the epoch
    *    advanced between the snapshot and the admit (or advances while
    *    admitting), the fused fast path steps aside and the full
    *    [[append]] recomputation runs against the new epoch — the
    *    physical-duplicate contract makes the raced write harmless
    *    exactly as it does for plain append.
    *
    * Returns the probe's rows (collected — |sources|-scale, KB).
    */
  private[graft] def probeAndAdmit(spark: SparkSession, snapshot: Snapshot,
      batch: DataFrame, sourceCol: String, textCol: String, n: Int,
      prefilter: Boolean): Array[org.apache.spark.sql.Row] = {
    val newG = sourceGramHashes(batch, sourceCol, textCol, n).distinct()
      .localCheckpoint(true)
    try probeAndAdmitPinned(spark, snapshot, batch, newG, sourceCol,
      textCol, n, prefilter)
    finally graft.util.Caches.release(newG)
  }

  private def probeAndAdmitPinned(spark: SparkSession, snapshot: Snapshot,
      batch: DataFrame, newG: DataFrame, sourceCol: String, textCol: String,
      n: Int, prefilter: Boolean): Array[org.apache.spark.sql.Row] = {
    val total = newG.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_grams"))
    val novelG = (snapshot.bloom match {
      case Some(bf) if prefilter =>
        graft.functions.GraftFunctions.register(spark)
        import spark.implicits._
        val bloomDf = Seq(Tuple1(bf)).toDF("graft_bloom")
        val flagged = newG.crossJoin(broadcast(bloomDf))
          .withColumn("maybe_seen", call_function("graft_bloom_contains",
            col("graft_bloom"), col("gh")))
          .drop("graft_bloom")
        flagged.filter(!col("maybe_seen"))
          .select(col(sourceCol), col("gh"))
          .unionByName(flagged.filter(col("maybe_seen"))
            .select(col(sourceCol), col("gh"))
            .join(snapshot.grams, Seq("gh"), "left_anti"))
      case _ =>
        newG.join(snapshot.grams, Seq("gh"), "left_anti")
          .select(col(sourceCol), col("gh"))
    }).localCheckpoint(true)
    try probeAndAdmitNovel(spark, snapshot, batch, novelG, total,
      sourceCol, textCol, n)
    finally graft.util.Caches.release(novelG)
  }

  private def probeAndAdmitNovel(spark: SparkSession, snapshot: Snapshot,
      batch: DataFrame, novelG: DataFrame, total: DataFrame,
      sourceCol: String, textCol: String, n: Int)
      : Array[org.apache.spark.sql.Row] = {
    val novel = novelG.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_novel"))
    val rows = total.join(novel, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000 div n_grams"))
      .collect()
    // admit — fused fast path only while the snapshot's epoch is still
    // current; any advance (before or during) falls back to the full
    // append recomputation so the fence semantics are exactly plain
    // append's
    if (Epochs.current(spark, snapshot.dir) == snapshot.epoch) {
      val epochDir = Epochs.epochPath(snapshot.dir, snapshot.epoch)
      val novelGh = novelG.select(col("gh")).distinct()
      snapshot.bloom.foreach { bf =>
        val (k, words) = graft.functions.BloomUtil.deserializeWords(bf)
        // the bloom is bit-idempotent, so it can consume the pinned
        // per-(source, gh) pairs directly — same bits as the distinct
        // set, one distinct-exchange saved
        appendBloomRow(spark, epochDir, novelG.select(col("gh")),
          words.length * 64, k)
      }
      // write-task count derived from the DATA (the probe rollup already
      // counted the novel grams — free): ~[[AppendGramsPerTask]] gh rows
      // per task, capped at one task per bucket. A fixed
      // shuffle-partition count here costs a daily-crawl append a full
      // task wave of near-empty parquet writers at small crawls and
      // still bottlenecks at NBuckets distinct keys at huge ones —
      // deriving from the count is right at every scale.
      val novelUB = rows.iterator.map(_.getLong(2)).sum
      val nWrite = math.max(1L,
        math.min(NBuckets.toLong,
          (novelUB + AppendGramsPerTask - 1) / AppendGramsPerTask)).toInt
      bucketed(novelGh)
        .repartition(nWrite, col("b"))
        .write.mode("append").partitionBy("b")
        .parquet(gramsPath(epochDir))
      Epochs.awaitNoMaintenance(spark, snapshot.dir)
      val now = Epochs.current(spark, snapshot.dir)
      if (now != snapshot.epoch)
        appendFrom(spark, batch, snapshot.dir, now, textCol, n)
    } else {
      append(spark, batch, snapshot.dir, textCol, n)
    }
    rows
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
      val epochDir = Epochs.epochPath(dir, e)
      val idx = epochGrams(spark, epochDir)
      val novel = gramHashes(newDocs, textCol, n).distinct()
        .join(idx, Seq("gh"), "left_anti")
      // sketch row FIRST (same geometry as the epoch's existing rows),
      // gram files second: a crash between the two leaves extra bloom
      // bits (bounded fpp drift), never a file gram the sketch denies —
      // the one ordering under which prefilter ≡ plain survives a torn
      // append. The novel set is consumed twice (crawl-scale; the probe
      // doc's small-side-twice trade, restated).
      loadBloom(spark, dir, e).foreach { bf =>
        val (k, words) = graft.functions.BloomUtil.deserializeWords(bf)
        appendBloomRow(spark, epochDir, novel, words.length * 64, k)
      }
      bucketed(novel)
        .repartition(col("b"))
        .write.mode("append").partitionBy("b")
        .parquet(gramsPath(epochDir))
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
        bucketed(epochGrams(spark, cur).distinct())
          .repartition(col("b"))
          .write.mode("overwrite").partitionBy("b")
          .parquet(gramsPath(next))
        // right-size the sketch from the rewritten files: appends only
        // ever accrete rows at epoch-birth geometry, so compaction is
        // where fpp drift resets (and where a pre-sketch epoch gains
        // its bloom)
        writeFreshBloom(spark, next)
      }
    }
}
