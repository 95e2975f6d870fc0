package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The export-manifest ALGEBRA, factored out so batch audit
  * (export_manifest / manifest_incremental) and streaming maintenance
  * (Streams.manifestStream) provably share one definition.
  *
  * A manifest row is (shard, n_rows, n_bytes, checksum): per export
  * shard, the row count, the UTF-8 byte volume of the payload text
  * (octet_length — "bytes" means octets, never a char count; the two
  * diverge on any multibyte text), and a 60-bit XOR of per-row
  * signatures md5(doc_id ":" text). Every field is MERGEABLE —
  * counts and bytes sum, XOR checksums XOR — so the manifest of a
  * union is the merge of the parts' manifests: exactly the
  * q_mv_refresh partial/merge algebra, which is what makes INCREMENTAL
  * maintenance sound (append a batch = merge its partial; takedown’s
  * XOR property: removing rows re-XORs their signatures out). At
  * 100 TB a partial is one partial-aggregatable scan of only the NEW
  * data; the merge touches nShards-row frames, never the corpus.
  */
object Manifest {

  /** Per-shard manifest partial of `docs` — the same arithmetic
    * export_manifest's oracle replays in DuckDB (seeded md5-prefix
    * shard, 15-hex-digit row signature, bit_xor). `n_bytes` is
    * derived HERE as octet_length(textCol) so the label is honest by
    * construction — callers cannot pass a char count as bytes.
    *
    * UNIT-CHANGE NOTE (r11): manifests published before this change
    * carried whatever unit the caller passed (in practice n_chars).
    * On pure-ASCII corpora the values coincide; on multibyte text a
    * pre-change manifest will NOT validate against a post-change
    * recompute, and a merge mixing pre/post partials is meaningless —
    * re-publish (or re-manifest the state dir) across the boundary
    * rather than merging across it. Counts and checksums are
    * unaffected either way.
    */
  def partial(docs: DataFrame, idCol: String, textCol: String,
      seed: Long, nShards: Int): DataFrame =
    ShuffleShard.assign(docs, idCol, seed, nShards)
      .select(col("shard"),
        octet_length(col(textCol)).cast("long").as("nb"),
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col(textCol))), 1, 15), 16, 10).cast("long").as("row_sig"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("nb")).as("n_bytes"),
        expr("bit_xor(row_sig)").as("checksum"))

  /** Merge manifest partials back to one manifest: counts and bytes
    * sum, checksums XOR. Closed under composition — the output is
    * itself a valid partial (Streams.compactMv-compatible).
    */
  def merge(partials: DataFrame): DataFrame =
    partials.groupBy(col("shard"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_bytes")).as("n_bytes"),
        expr("bit_xor(checksum)").as("checksum"))
}
