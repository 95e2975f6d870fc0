package graft.util

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for compute-heavy derivations — the guide's
  * unsplittable-input move (repartition right after the read), made
  * CONDITIONAL so it is a no-op at scale:
  *
  * A parquet file is splittable only at row-group boundaries, so a
  * small single-row-group table arrives as ONE scan task no matter
  * what `spark.sql.files.maxPartitionBytes`/`minPartitionNum` say —
  * and every map-heavy derivation above it (tokenize → shingle →
  * 64-lane minhash, per-pair cosine scoring, n-gram hashing) runs on
  * one core while the rest of the cluster idles. At corpus scale the
  * same tables arrive as thousands of splits and the condition below
  * is false: the plan is returned UNCHANGED — no exchange, no cost.
  *
  * The fan-out shuffle, when it does fire, moves the input once
  * (O(rows)) to parallelize work that is super-linear in it (pair
  * scoring) or constant-factor-heavy (shingling); the partition count
  * is the cluster's default parallelism, not a data-size constant, so
  * the same code is right at local[7], local[32], and on a cluster.
  */
object Fanout {

  def ensure(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans the frame without running a job; its partition count
    // is the scan's real split count
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
