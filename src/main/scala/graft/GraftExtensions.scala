package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomFilterAgg, BloomMightContain, CmsEstimate, DotProductD, GraftFunctions, HeavyHitters, L2NormD, LangMarkerBest, MinHashLanes, NfcNormalize, PolyFingerprint, SimHash64}

/** Standard Spark extension packaging: enables graft's native functions
  * in ANY session via configuration —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * — the same wiring `GraftFunctions.register` does imperatively, but
  * available to pure-SQL users and notebooks that never touch graft's
  * Scala API. Both paths register identical builders, so either (or
  * both) can be active.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Arity-checked builder: wrong argument counts surface as a clear
    * error instead of an IndexOutOfBounds from inside resolution.
    */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n,
        s"$name expects $n argument(s), got ${es.length}")
      build(es)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double-precision dot product of two float arrays"),
      arity("graft_dot", 2)(es => DotProductD(es(0), es(1)))))
    ext.injectFunction((FunctionIdentifier("graft_l2norm"),
      info("graft_l2norm", "graft_l2norm(a) - Euclidean norm of a float array in double"),
      arity("graft_l2norm", 1)(es => L2NormD(es.head))))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of a string array"),
      arity("graft_simhash64", 1)(es => SimHash64(es.head))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_lanes"),
      info("graft_minhash_lanes", "graft_minhash_lanes(shingles) - 64 MinHash lane minima"),
      arity("graft_minhash_lanes", 1)(es => MinHashLanes(es.head))))
    ext.injectFunction((FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "graft_fingerprint(s) - rolling polynomial hash of a string"),
      arity("graft_fingerprint", 1)(es => PolyFingerprint(es.head))))
    ext.injectFunction((FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters", "graft_heavy_hitters(col, capacity) - SpaceSaving top items"),
      arity("graft_heavy_hitters", 2)(es =>
        HeavyHitters(es(0), GraftFunctions.foldableCapacity(es(1)))
          .toAggregateExpression())))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "graft_bloom_agg(keyHash, numBits, numHashes) - bloom filter of the key hashes"),
      arity("graft_bloom_agg", 3)(es =>
        BloomFilterAgg(es(0),
          GraftFunctions.foldableInt("graft_bloom_agg numBits", es(1)),
          GraftFunctions.foldableInt("graft_bloom_agg numHashes", es(2)))
          .toAggregateExpression())))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "graft_bloom_contains(filter, keyHash) - bloom membership, no false negatives"),
      arity("graft_bloom_contains", 2)(es => BloomMightContain(es(0), es(1)))))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(s) - Unicode NFC normalization"),
      arity("graft_nfc", 1)(es => NfcNormalize(es.head))))
    ext.injectFunction((FunctionIdentifier("graft_lang_best"),
      info("graft_lang_best", "graft_lang_best(tokens) - marker-count language prediction"),
      arity("graft_lang_best", 1)(es =>
        LangMarkerBest(es.head, LangMarkerBest.DefaultMarkers))))
    ext.injectFunction((FunctionIdentifier("graft_cms_estimate"),
      info("graft_cms_estimate", "graft_cms_estimate(sketch, item) - Count-Min frequency estimate"),
      arity("graft_cms_estimate", 2)(es => CmsEstimate(es(0), es(1)))))
    ext.injectFunction((FunctionIdentifier("graft_lsh_buckets"),
      info("graft_lsh_buckets",
        "graft_lsh_buckets(vec, tables, bits, seed, dim) - sign-LSH bucket per table"),
      arity("graft_lsh_buckets", 5)(es =>
        graft.functions.LshBuckets(es.head,
          GraftFunctions.foldableInt("graft_lsh_buckets tables", es(1)),
          GraftFunctions.foldableInt("graft_lsh_buckets bits", es(2)),
          GraftFunctions.foldableLong("graft_lsh_buckets seed", es(3)),
          GraftFunctions.foldableInt("graft_lsh_buckets dim", es(4))))))
  }
}
