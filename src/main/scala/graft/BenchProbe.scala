package graft

import org.apache.spark.sql.functions._

/** Ad-hoc plan/profiling entry point — not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // LSH vs exact equality at 5000 docs, then timings
    val lsh = time("minhash lsh run1")(
      graft.queries.DedupQueries.dedupMinhashLsh(spark, dir).collect())
    time("minhash lsh run2")(
      graft.queries.DedupQueries.dedupMinhashLsh(spark, dir).count())
    val exact = graft.queries.DedupQueries.dedupNgramJaccard(spark, dir).collect()
    val l = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[probe] lsh=${l.size} exact=${e.size} missed=${(e -- l).size} spurious=${(l -- e).size}")
    time("clusters run1")(graft.queries.DedupQueries.dedupClusters(spark, dir).count())
    time("clusters run2")(graft.queries.DedupQueries.dedupClusters(spark, dir).count())
    spark.stop()
  }
}
