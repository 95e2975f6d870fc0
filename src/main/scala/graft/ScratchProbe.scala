package graft

/** TEMPORARY phase-level profiler for optimization round 13 — not part
  * of the driver contract; deleted before round end.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("novelty_stream")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} " +
        f"min ${ts.min}%.2f")
    }
    spark.stop()
  }
}
