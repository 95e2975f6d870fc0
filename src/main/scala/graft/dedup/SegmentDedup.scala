package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Paragraph-level exact deduplication (CCNet / RefinedWeb style): split
  * each document into segments, keep only the globally-first occurrence
  * of every distinct segment, and reassemble what is left of each
  * document. Boilerplate that repeats across a crawl (nav bars, license
  * footers, quoted headers) disappears from every copy but the first,
  * while the unique prose survives — finer-grained than whole-document
  * dedup (Dedup.exact) and complementary to near-dup pair detection
  * (MinHashLSH).
  *
  * The reference engine's unit of work is the line
  * (hadoop-multiple-streaming streams line records through child
  * processes — the LineReader loop at MultiPipeMapRed.java:456-458);
  * this operator is the same line/segment granularity applied to corpus
  * hygiene. "Globally first" is deterministic: occurrence order is
  * (doc id, segment position), so reruns and retries keep the same copy.
  *
  * Segmentation: documents with real structure split on a delimiter
  * (`splitRegex`, e.g. "\n{2,}" for paragraphs); the synthetic corpus is
  * single-line, so the fixed-window variant stands in — every run of
  * `segWords` consecutive normalized tokens is one segment. Both feed
  * the same keep/reassemble pipeline.
  *
  * Scale (100 TB): two hash exchanges, both on bounded keys — one on the
  * segment for the first-occurrence window (byte-exact raw-text key by
  * default; the opt-in `hashKeys` knob on [[dedupSegments]] switches it
  * to 8-byte `xxhash64(segment)` for shuffle-width at the fingerprint
  * trade documented there), one on the doc id to reassemble. The
  * first-occurrence rule is a row_number window, NOT a groupBy +
  * self-join — one shuffle instead of two and no re-scan of the corpus.
  * No driver state, no broadcast of anything corpus-sized.
  */
object SegmentDedup {

  /** Fixed-window segments: normalized tokens in runs of `segWords`
    * (last run may be short) — TextOps.chunked at stride == window, i.e.
    * zero overlap, plus an empty-doc guard (chunked assumes ≥ 1 token).
    */
  def windowSegments(text: Column, segWords: Int): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) >= 1, TextOps.chunked(toks, segWords, segWords))
      .otherwise(array().cast("array<string>"))
  }

  /** Delimiter segments for corpora with real paragraph breaks. */
  def delimiterSegments(text: Column, splitRegex: String): Column =
    array_remove(split(text, splitRegex), "")

  /** Per-document result of global first-occurrence segment dedup:
    * (id, n_segs, n_kept, sig) where sig = md5 of the reassembled
    * kept text (segments in original order). A fully-duplicated doc
    * keeps 0 segments and carries md5("").
    *
    * `hashKeys = true` (OPT-IN) keys the first-occurrence window on
    * `xxhash64(segment)` instead of the raw text: the map-side
    * WindowGroupLimit then groups and the exchange sorts on 8-byte
    * longs rather than full paragraph strings — the right trade for a
    * 100 TB shuffle. It is opt-in, not the default, because the trade
    * is the generic 64-bit-fingerprint one: a hash collision merges
    * two distinct segments and SILENTLY drops one (expected collisions
    * ≈ n²/2⁶⁵; at 10¹⁰ distinct segments that is ~3 segments corpus-
    * wide) — the default stays byte-exact, matching the reference's
    * semantics and the DuckDB oracle, and a caller accepts the
    * fingerprint regime explicitly at the call site. ExportSpec pins
    * hashed ≡ raw on the test corpus.
    */
  def dedupSegments(docs: DataFrame, idCol: String, segsCol: Column,
      hashKeys: Boolean = false): DataFrame = {
    val id = col(idCol)
    val base = docs.select(id, segsCol.as("segs"))
    val exploded = base.select(id, posexplode(col("segs")).as(Seq("pos", "seg")))
    val segKey = if (hashKeys) xxhash64(col("seg")) else col("seg")
    val firstSeen = Window.partitionBy(segKey).orderBy(id, col("pos"))
    val kept = exploded
      .withColumn("rn", row_number().over(firstSeen))
      .where(col("rn") === 1)
      .groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
            p => p.getField("seg")), " ")).as("sig"))
    base.select(id, size(col("segs")).cast("long").as("n_segs"))
      .join(kept, Seq(idCol), "left")
      .select(id, col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("sig"), md5(lit(""))).as("sig"))
  }

  /** Cross-document boilerplate removal by segment FREQUENCY (the other
    * CCNet line-dedup mode): drop every occurrence of any segment that
    * appears in at least `maxDocs` DISTINCT documents, keep everything
    * else, reassemble in original order. Where [[dedupSegments]] keeps
    * the first copy of a repeated segment, this keeps NONE — the right
    * semantics for nav bars / license footers / quoted headers, which
    * are noise in every document including the first; prose that never
    * crosses the threshold is untouched in all copies.
    *
    * Same per-doc output contract as [[dedupSegments]]:
    * (id, n_segs, n_kept, sig) with sig = md5 of the reassembled kept
    * text; a fully-boilerplate doc keeps 0 segments and carries md5("").
    *
    * Scale (100 TB): linear, the SubstringDedup shape — document
    * frequency per segment from a two-phase distinct (shuffle on the
    * segment key, then a partial-agg count: the agg_distinct_twophase
    * pattern, so a viral segment cannot hot-spot a reducer) joined back
    * to the occurrence stream on the same key. No pairwise step, no
    * window over the whole corpus, no driver state. `hashKeys` folds
    * both exchanges to 8-byte xxhash64 keys with the same documented
    * fingerprint trade as [[dedupSegments]].
    */
  def filterFrequentSegments(docs: DataFrame, idCol: String, segsCol: Column,
      maxDocs: Int, hashKeys: Boolean = false): DataFrame = {
    require(maxDocs >= 2, s"maxDocs must be >= 2, got $maxDocs")
    val id = col(idCol)
    val base = docs.select(id, segsCol.as("segs"))
    val exploded = base.select(id, posexplode(col("segs")).as(Seq("pos", "seg")))
    val segKey = if (hashKeys) xxhash64(col("seg")) else col("seg")
    val docFreq = exploded.select(segKey.as("k"), id).distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("n_docs"))
    val kept = exploded.withColumn("k", segKey)
      .join(docFreq, "k")
      .where(col("n_docs") < maxDocs)
      .groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
            p => p.getField("seg")), " ")).as("sig"))
    base.select(id, size(col("segs")).cast("long").as("n_segs"))
      .join(kept, Seq(idCol), "left")
      .select(id, col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("sig"), md5(lit(""))).as("sig"))
  }
}
