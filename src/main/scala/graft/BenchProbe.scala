package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/profiling entry point — not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val which = if (args.nonEmpty) args.toSet else Set("knn_brute", "dedup_minhash_lsh", "pipe_wordcount", "mm_meta")
    SparkEntry.queries.filter(q => which.contains(q._1)).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
