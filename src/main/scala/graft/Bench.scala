package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: one JSON line over the full query surface.
  * Each query is timed twice and the MIN is reported — the first run
  * pays plan compilation (Catalyst + janino) and cache warmup, and this
  * shared box sees sporadic co-tenant CPU steal; min-of-2 reports
  * steady-state engine time rather than host noise.
  *
  * The line goes to stdout AND to `BENCH.json` in the working
  * directory: sbt prefixes stdout with `[info] `, which breaks naive
  * JSON parsing downstream, so the file is the clean machine-readable
  * copy.
  *
  * Failure containment (spec-pinned in PropertySpec): a throwing query
  * marks-and-continues — it lands in the `failed` array, is EXCLUDED
  * from the total (a sentinel summed in would make the headline metric
  * improve as correctness degrades), prints ONE truncated stderr line,
  * and the JSON line still emits. One broken table can never blank the
  * whole artifact.
  */
object Bench {

  /** Time every query min-of-2 (adaptive third run); -1 marks failure. */
  def measure(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame])
      : Map[String, Double] = {
    def once(fn: (SparkSession, String) => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        // one SHORT line per failure: a multi-line analysis error times
        // 16 queries times 3 runs floods the driver's ~2000-char stdout
        // tail and crowds out the JSON line (observed round 6)
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(
          s"[bench] query failed: ${msg.takeWhile(_ != '\n').take(200)}")
        None
      }
    }
    queries.map { case (name, fn) =>
      val two = Seq(once(fn), once(fn)).flatten
      // co-tenant CPU steal can inflate a single run several-fold; when
      // the two timings disagree wildly both are suspect, so spend one
      // more run on exactly those queries before taking the min. The
      // slow tail (> 2 s) gets a third run unconditionally: those are
      // the queries whose round-over-round deltas are read as signal,
      // and one stolen run among two still skews their min
      val runs =
        if (two.size == 2 && (two.max > 2 * two.min || two.min > 2.0))
          two ++ once(fn)
        else two
      // a failed query must NOT read as a fast timing: -1 sentinel per
      // query, and it is EXCLUDED from the total
      name -> (if (runs.isEmpty) -1.0 else runs.min)
    }
  }

  /** One JSON line for `results` (sentinel -1 = failed query). The
    * driver keeps only the last ~2000 characters of stdout; a
    * full-precision line for 70+ queries overflows that window and the
    * truncated JSON never parses (observed in rounds 1-2). Millisecond
    * precision is plenty for a wall-clock bench; if the surface grows
    * past what 3 decimals fits, drop decimals, and past THAT, collapse
    * the fastest queries into one "other_fast" bucket — the slow tail
    * is the signal, sub-noise-floor entries are not.
    */
  def renderLine(results: Map[String, Double], sfDir: String,
      dec: Int, floorSec: Double): String = {
    val failed = results.collect { case (n, v) if v < 0 => n }.toSeq.sorted
    val ok = results.values.filter(_ >= 0)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.sum else 0.0
    // Locale.ROOT: a comma decimal separator would corrupt the JSON
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    // failures are reported ONLY via the failed array: a -1 sentinel
    // in either bucket would show up as a (negative) timing or inflate
    // n_other_fast, so they are excluded from the buckets entirely
    val (slow, fast) = results.filter(_._2 >= 0)
      .partition { case (_, v) => v >= floorSec }
    val entries = slow.map { case (k, v) => "\"" + k + "\":" + f(v) } ++
      (if (fast.nonEmpty)
        Seq("\"other_fast\":" + f(fast.values.sum),
          "\"n_other_fast\":" + fast.size)
      else Nil)
    val qs = entries.mkString("{", ",", "}")
    s"""{"metric":"total","value":${f(total)},"unit":"sec","n_failed":${failed.size},"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
  }

  /** The short line for stdout: densest rendering that fits the
    * driver's capture window.
    */
  def shortLine(results: Map[String, Double], sfDir: String): String = {
    val candidates = Seq((3, 0.0), (2, 0.0), (1, 0.0), (2, 0.25), (2, 0.5), (2, 1.0))
    candidates.map { case (d, fl) => renderLine(results, sfDir, d, fl) }
      .find(_.length <= 1700)
      .getOrElse(renderLine(results, sfDir, 2, 2.0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val results = measure(spark, sfDir, SparkEntry.queries)
    val line = shortLine(results, sfDir)
    val fullLine = renderLine(results, sfDir, 9, 0.0)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH.json: ${e.getMessage}")
    }
    // stop BEFORE printing: Spark shutdown logs landing after the JSON
    // line would push it out of the driver's bounded stdout capture
    spark.stop()
    println(line)
  }
}
