package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point — not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.util.Tables(spark, dir).documents
    import graft.dedup.{MinHashLSH => M}
    val sh = time("shingled")(M.shingled(docs, "doc_id", "text", 3)).cache()
    time("shingled count")(println(sh.count()))
    val sig = time("signatures")(M.signatures(sh).cache())
    time("signatures count")(println(sig.count()))
    val bands = time("bands")(M.bands(sig).cache())
    time("bands count")(println(bands.count()))
    val cand = time("candidates")(M.candidates(bands))
    time("candidates count")(println(cand.count()))
    time("full minhash")(println(
      M.nearDuplicates(docs, "doc_id", "text", 3, 0.7).count()))
    time("ngram pairs")(println(
      graft.dedup.NgramJaccard.pairs(docs, "doc_id", "text", 3, 0.7).count()))
    val embs = graft.util.Tables(spark, dir).embeddings
    time("embedding pairs")(println(
      graft.dedup.EmbeddingDedup.pairs(embs, "vec_id", "embedding", 0.4).count()))
    time("simhash")(println(
      graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text", 3).count()))
    spark.stop()
  }
}
