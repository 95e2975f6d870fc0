package graft

import org.apache.spark.sql.execution.FormattedMode

/** Ad-hoc plan/profiling entry point — NOT part of the driver contract.
  *
  * Usage: `sbt "runMain graft.BenchProbe [queryName ...]"` — times each
  * named query (all of them if none given) cold and warm at
  * SPARK_GRAFT_SF_DIR (default sf0.1); with explicit names it also
  * prints the formatted physical plan for explain-driven tuning
  * (PushedFilters / broadcast / WholeStageCodegen / exchange count).
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which =
      if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries
    which.foreach { case (name, fn) =>
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run(); val warm = run()
      println(f"[probe] $name: cold $cold%.2f s, warm $warm%.2f s")
      if (args.nonEmpty)
        println(fn(spark, dir).queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
