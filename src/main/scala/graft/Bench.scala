package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: one JSON line over the full query surface.
  *
  * Steal-proofing (round 9 — the r8 committed capture was ~40% host
  * noise): every query is timed in THREE FULL SWEEPS over the whole
  * surface (pass 1 all queries, then pass 2, then pass 3) and the
  * per-query MIN across sweeps is reported. Sweep order is the point:
  * co-tenant CPU steal on this shared box arrives in multi-second
  * WINDOWS, so three back-to-back runs of one query all land inside a
  * single window and the min is still stolen — in sweep order the same
  * window instead inflates ONE pass of several different queries and
  * each query's other two passes stay clean. Pass 1 also absorbs plan
  * compilation (Catalyst + janino) and FS cache warmup for everyone.
  * The raw per-pass timings are written to `BENCH_RAW.json` so a
  * round-over-round delta can always be adjudicated against the pass
  * spread instead of re-probing by hand.
  *
  * The line goes to stdout AND to `BENCH.json` in the working
  * directory: sbt prefixes stdout with `[info] `, which breaks naive
  * JSON parsing downstream, so the file is the clean machine-readable
  * copy.
  *
  * Failure containment (spec-pinned in PropertySpec): a throwing query
  * marks-and-continues — it lands in the `failed` array, is EXCLUDED
  * from the total (a sentinel summed in would make the headline metric
  * improve as correctness degrades), prints ONE truncated stderr line
  * per failing pass, and the JSON line still emits. One broken table
  * can never blank the whole artifact.
  */
object Bench {

  val Passes = 3

  /** Declared super-linear VALIDATOR queries (SCALING.md's BY-DESIGN
    * table): exact-quadratic ground-truth twins whose cost is the
    * honest n² price, not a plan property under measurement — their
    * registered scale paths (knn_*_cell, dedup_*_cell,
    * mix_curriculum_bounds, agg_sketches' GK) are the entries whose
    * minima matter. These run in sweep 1 ONLY: re-timing a declared
    * n² validator twice more buys no steal protection worth its
    * wall-clock (its min never comes from luck), and the ~50 s saved
    * is what lets three FULL sweeps of the real surface fit the
    * driver's 1080 s budget on a stolen box.
    */
  val SinglePassQueries: Set[String] = Set(
    "knn_classify", "knn_graph", "knn_brute", "dedup_embedding",
    "dedup_semantic", "agg_equidepth", "mix_curriculum", "dedup_recall")

  /** 2× the committed minimum, floored at 0.75 s: sub-second entries
    * sit at the noise floor where a 2× ratio is scheduler jitter, not
    * steal — never worth a re-probe.
    */
  def stealThresholdS(ref: Double): Double = math.max(2.0 * ref, 0.75)

  /** Wall-clock cap on the re-probe pass: under box-wide steal MANY
    * queries read over threshold at once, and re-probing each would
    * roughly double the capture. Queries still over threshold when the
    * budget runs out are tagged steal_suspect on their 3-sweep minima
    * alone — the tag's meaning ("adjudicate this against the pass
    * spread, not as a plan regression") is the same either way.
    */
  val ReprobeBudgetS: Double = 180.0

  /** The FULL-SURFACE steal-guard pass (sf0.1 only — the references
    * are [[BenchRefs.Sf01Ref]], the committed sf0.1 3-sweep minima from
    * SCALING.md): any query whose capture minimum exceeds
    * [[stealThresholdS]] of its committed reference gets ONE warm
    * re-probe (single-pass n² validators first — their timing has no
    * min-of-3 protection, so a steal window hits them hardest) and the
    * min is kept. Returns (augmented raw timings, steal_suspect,
    * reprobe_failed):
    *
    *  - `steal_suspect` — still over threshold after the re-probe
    *    opportunity: cross-round comparisons adjudicate these as host
    *    steal, not plan regressions, with no manual paragraph;
    *  - `reprobe_failed` — the re-probe THREW. That is a real
    *    regression signal (the query ran green in the sweeps but died
    *    warm), so it must NOT hide behind the steal tag; it gets its
    *    own array and a stderr line.
    */
  def reprobeValidators(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      raw: Map[String, Seq[Double]],
      refs: Map[String, Double] = BenchRefs.Sf01Ref,
      budgetS: Double = ReprobeBudgetS)
      : (Map[String, Seq[Double]], Seq[String], Seq[String]) = {
    // exact directory match, not substring — the refs are sf0.1
    // numbers and must not be applied to e.g. a future sf0.12 dir
    if (!sfDir.stripSuffix("/").endsWith("/sf0.1")) return (raw, Nil, Nil)
    var acc = raw
    val suspects = scala.collection.mutable.ArrayBuffer.empty[String]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val over = raw.keys.toSeq.filter { n =>
      refs.get(n).exists { ref =>
        val runs = acc.getOrElse(n, Nil)
        runs.nonEmpty && runs.min > stealThresholdS(ref)
      }
    }.sortBy(n => (!SinglePassQueries.contains(n), n))
    val t0 = System.nanoTime()
    over.foreach { n =>
      val ref = refs(n)
      val runs = acc(n)
      if ((System.nanoTime() - t0) / 1e9 > budgetS) {
        System.err.println(s"[bench] steal-guard: re-probe budget " +
          s"exhausted — tagging $n on its sweep minima alone")
        suspects += n
      } else {
        System.err.println(s"[bench] steal-guard: $n " +
          f"${runs.min}%.2fs > ${stealThresholdS(ref)}%.2fs, re-probing")
        val p0 = System.nanoTime()
        val probed =
          try {
            queries(n)(spark, sfDir).count()
            acc = acc.updated(n, runs :+ (System.nanoTime() - p0) / 1e9)
            true
          } catch {
            // one stderr line, like every other bench failure — a
            // query that THROWS on re-probe is a regression, not
            // steal, and must not hide behind the steal_suspect tag
            case scala.util.control.NonFatal(e) =>
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              System.err.println(s"[bench] steal-guard re-probe of $n " +
                s"FAILED: ${msg.takeWhile(_ != '\n').take(200)}")
              failed += n
              false
          }
        if (probed && acc(n).min > stealThresholdS(ref)) suspects += n
      }
    }
    (acc, suspects.toSeq, failed.toSeq)
  }

  /** Wall-clock budget for the whole measure phase: sweeps after the
    * FIRST are skipped once this is exceeded (sweep 1 always completes
    * — every query must get at least one timing). The default keeps a
    * steal-slowed 3-sweep run well inside the driver's patience; the
    * first clean 3-sweep capture measured ~16 min of sweeps under
    * heavy co-tenant load, ~9 min quiet.
    */
  val BudgetS: Long =
    sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S").map(_.toLong).getOrElse(1080L)

  /** Raw per-pass timings per query, in `Passes` full sweeps over the
    * surface. A query that throws in a pass records no timing for it;
    * a query with NO successful pass gets an empty vector (the -1
    * sentinel downstream).
    */
  def measureRaw(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      passes: Int = Passes): Map[String, Seq[Double]] = {
    def once(name: String,
        fn: (SparkSession, String) => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        // one SHORT line per failure: a multi-line analysis error times
        // N queries times 3 passes floods the driver's ~2000-char stdout
        // tail and crowds out the JSON line (observed round 6)
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(
          s"[bench] $name failed: ${msg.takeWhile(_ != '\n').take(200)}")
        None
      }
    }
    // stable name order inside each sweep so pass k of query q always
    // has the same neighborhood — raw passes stay comparable run-to-run
    val names = queries.keys.toSeq.sorted
    val acc = scala.collection.mutable.Map.empty[String, Vector[Double]]
    names.foreach(n => acc(n) = Vector.empty)
    val t0 = System.nanoTime()
    def elapsedS = (System.nanoTime() - t0) / 1e9
    var p = 0
    var lastSweepS = 0.0
    // a sweep only starts if the PREVIOUS sweep's duration still fits
    // inside the budget — predictive, so a steal-slowed run degrades to
    // sweep-ordered min-of-2 instead of overshooting the wall clock
    while (p < passes && (p == 0 || elapsedS + lastSweepS < BudgetS)) {
      val s0 = elapsedS
      names.foreach { n =>
        if (p == 0 || !SinglePassQueries.contains(n))
          once(n, queries(n)).foreach(t => acc(n) = acc(n) :+ t)
      }
      lastSweepS = elapsedS - s0
      p += 1
      // Inter-sweep hygiene: a sweep leaves behind cached frames and
      // localCheckpoint block stores (CC label propagation, the
      // containment postings, lifecycle snapshots) that stay pinned
      // until the DRIVER GCs the owning RDD — across a multi-sweep
      // session the storage pool fills, later sweeps' big shuffles
      // lose execution memory and spill, and pass timings GROW sweep
      // over sweep (observed: dedup_substring 1.5 s -> 42 s by pass 3,
      // r11 and r12 captures alike). Evict everything between sweeps
      // and nudge the ContextCleaner so each sweep starts from the
      // same clean-session state the committed minima claim to
      // measure. Not done between QUERIES: intra-sweep adjacency is
      // part of the honest cost of running the surface back-to-back.
      if (p < passes) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    if (p < passes)
      System.err.println(s"[bench] budget ${BudgetS}s: stopped after $p " +
        s"sweep(s) (${elapsedS.toInt}s elapsed, last sweep " +
        s"${lastSweepS.toInt}s) — later sweeps skipped")
    names.map(n => n -> (acc(n): Seq[Double])).toMap
  }

  /** Per-query minimum across passes; -1 marks a query with no
    * successful pass.
    */
  def minima(raw: Map[String, Seq[Double]]): Map[String, Double] =
    raw.map { case (n, runs) =>
      n -> (if (runs.isEmpty) -1.0 else runs.min) }

  def measure(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame])
      : Map[String, Double] =
    minima(measureRaw(spark, sfDir, queries))

  /** BENCH_RAW.json: every pass timing, full precision — the drift
    * audit behind BENCH.json's minima.
    */
  def renderRaw(raw: Map[String, Seq[Double]], sfDir: String): String = {
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = raw.toSeq.sortBy(_._1).map { case (n, runs) =>
      "\"" + n + "\":" + runs.map(f).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    s"""{"passes":$Passes,"queries":$qs,"sf":"$sfDir"}"""
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
      dec: Int, floorSec: Double,
      stealSuspect: Seq[String] = Nil,
      reprobeFailed: Seq[String] = Nil): String = {
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
    // steal_suspect / reprobe_failed only appear when non-empty (and
    // only the full line passes them) — the short stdout line stays
    // dense
    val steal =
      if (stealSuspect.isEmpty) ""
      else stealSuspect.sorted.map("\"" + _ + "\"")
        .mkString(""","steal_suspect":[""", ",", "]")
    val reprobe =
      if (reprobeFailed.isEmpty) ""
      else reprobeFailed.sorted.map("\"" + _ + "\"")
        .mkString(""","reprobe_failed":[""", ",", "]")
    s"""{"metric":"total","value":${f(total)},"unit":"sec","n_failed":${failed.size},"failed":$failedJson,"queries":$qs$steal$reprobe,"sf":"$sfDir"}"""
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
    val raw0 = measureRaw(spark, sfDir, SparkEntry.queries)
    val (raw, stealSuspect, reprobeFailed) =
      reprobeValidators(spark, sfDir, SparkEntry.queries, raw0)
    val results = minima(raw)
    val line = shortLine(results, sfDir)
    val fullLine = renderLine(results, sfDir, 9, 0.0, stealSuspect,
      reprobeFailed)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
        (fullLine + "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_RAW.json"),
        (renderRaw(raw, sfDir) + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH.json: ${e.getMessage}")
    }
    // stop BEFORE printing: Spark shutdown logs landing after the JSON
    // line would push it out of the driver's bounded stdout capture
    spark.stop()
    println(line)
  }
}
