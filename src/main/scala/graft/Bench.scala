package graft

/** Driver-run benchmark: one JSON line over the full query surface.
  * Each query is timed twice and the MIN is reported — the first run
  * pays plan compilation (Catalyst + janino) and cache warmup, and this
  * shared box sees sporadic co-tenant CPU steal; min-of-2 reports
  * steady-state engine time rather than host noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    // a failed query must NOT read as a fast timing: report -1 sentinel
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] query failed: ${e.getMessage}"); None
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val runs = Seq(once(fn), once(fn)).flatten
      name -> (if (runs.isEmpty) -1.0 else runs.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
