package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/profiling entry point — not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val lsh = time("minhash lsh sf0.1")(
      graft.queries.DedupQueries.dedupMinhashLsh(spark, dir).collect())
    val exact = time("inverted-index exact sf0.1")(
      graft.queries.DedupQueries.dedupNgramJaccard(spark, dir).collect())
    val l = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[probe] lsh pairs=${l.size} exact pairs=${e.size} " +
      s"missed=${(e -- l).size} spurious=${(l -- e).size}")
    val clusters = time("clusters sf0.1")(
      graft.queries.DedupQueries.dedupClusters(spark, dir).count())
    println(s"[probe] clusters=$clusters")
    spark.stop()
  }
}
