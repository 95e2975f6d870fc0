package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/profiling entry point — not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 3)
      time(s"knn_lsh sf0.1 run$i")(
        graft.queries.SimQueries.knnLsh(spark, "/root/testdata/sf0.1").count())
    for (i <- 1 to 2)
      time(s"keyfield sf0.1 run$i")(
        graft.queries.PipeQueries.pipeKeyfieldAgg(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
