package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** TEMPORARY r13 plan dumper — deleted before round end. */
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.dedup.NoveltyIndex
    val docs = graft.util.Tables(spark, dir).documents
    val base = docs.filter(col("doc_id") % 5 < 4)
    val fresh = docs.filter(col("doc_id") % 5 === 4)
    val idxDir = graft.util.Staging.dir(spark, "scratch_plan_idx")
    NoveltyIndex.init(spark, base, idxDir, "text", 3)
    val snap = NoveltyIndex.load(spark, idxDir)

    def dump(path: String, s: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        s.getBytes("UTF-8"))

    // BEFORE shape: the unfused probe (per-batch, the streaming loop
    // then re-derived the same gram set again inside append)
    val before = NoveltyIndex.probe(snap, fresh, "source", "text", 3,
      prefilter = true)
    dump("plans/r13/novelty_stream_before.txt",
      "novelty_stream foreachBatch BEFORE (r12..4b17c9c): per batch,\n" +
      "NoveltyIndex.probe(prefilter) + NoveltyIndex.append — the batch's\n" +
      "tokenize->gram->md5 pass appears in FOUR subtrees of the probe\n" +
      "plan below (n_grams rollup + both prefilter branches) and append\n" +
      "re-derives it a further time plus one more epoch-gram read for\n" +
      "its own anti-join; the admit write runs at the fixed shuffle\n" +
      "partition count.\n\n" +
      before.queryExecution.explainString(FormattedMode))

    // AFTER shape: the fused probeAndAdmit's rollup subtree — the gram
    // pass is pinned once (LogicalRDD / Scan ExistingRDD below = the
    // eager localCheckpoint) and every consumer reads the pin
    val newG = NoveltyIndex.sourceGramHashes(fresh, "source", "text", 3)
      .distinct().localCheckpoint(true)
    val total = newG.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    import spark.implicits._
    val bloomDf = Seq(Tuple1(snap.bloom.get)).toDF("graft_bloom")
    val flagged = newG.crossJoin(broadcast(bloomDf))
      .withColumn("maybe_seen", call_function("graft_bloom_contains",
        col("graft_bloom"), col("gh")))
      .drop("graft_bloom")
    val novelG = flagged.filter(!col("maybe_seen"))
      .select(col("source"), col("gh"))
      .unionByName(flagged.filter(col("maybe_seen"))
        .select(col("source"), col("gh"))
        .join(snap.grams, Seq("gh"), "left_anti"))
      .localCheckpoint(true)
    val novel = novelG.groupBy(col("source")).agg(count(lit(1)).as("n_novel"))
    val after = total.join(novel, Seq("source"), "left")
      .select(col("source"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000 div n_grams"))
    dump("plans/r13/novelty_stream_after.txt",
      "novelty_stream foreachBatch AFTER: NoveltyIndex.probeAndAdmit —\n" +
      "the batch's gram set is derived ONCE per batch (eager\n" +
      "localCheckpoint; the 'Scan ExistingRDD' leaves below ARE the\n" +
      "pin), the novel pair set likewise, and the admit consumes the\n" +
      "pinned novel set for both its bloom row and its gram files with\n" +
      "a write-task count derived from the probe's own novel count\n" +
      "(NoveltyIndex.AppendGramsPerTask) instead of the shuffle\n" +
      "default. Face output and index content unchanged (oracle-green\n" +
      "at sf0.01 + sf0.1; DedupSpec/StreamSpec pins).\n\n" +
      after.queryExecution.explainString(FormattedMode) +
      "\n--- pinned novel subtree (consumed by rollup + bloom row + gram write) ---\n" +
      novelG.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
