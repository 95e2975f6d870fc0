package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg: 6 groups, positive sums") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getDouble(2) > 0)) // sum_qty
    // deterministic order
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      rows.map(r => (r.getString(0), r.getString(1))).toSeq.sorted)
  }

  test("q1_agg: partial aggregation (map-side combine) in plan") {
    val plan = planOf(Relational.q1Agg(spark, sf))
    assert(plan.contains("partial_"), s"expected partial agg in:\n$plan")
  }

  test("q_filter_project: filter and projection pushed to parquet scan") {
    val plan = planOf(Relational.qFilterProject(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice)"),
      s"expected pushed filters in:\n$plan")
    assert(!plan.contains("o_orderdate"), "pruned column leaked into scan")
  }

  test("q3_join_topk: broadcast join for customer dim, TakeOrdered for topk") {
    val plan = planOf(Relational.q3JoinTopk(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
    assert(Relational.q3JoinTopk(spark, sf).count() === 10)
  }

  test("q5_join5: 5 nations out, all dims broadcast (single shuffle edge)") {
    val df = Relational.q5Join5(spark, sf)
    assert(df.count() <= 5 && df.count() > 0)
    val plan = planOf(df)
    // only the lineitem⋈orders edge may shuffle: at most 1 non-broadcast join
    val smj = "SortMergeJoin".r.findAllIn(plan).size +
      "ShuffledHashJoin".r.findAllIn(plan).size
    assert(smj <= 1, s"expected <=1 shuffled join, got $smj:\n$plan")
  }

  test("q_window: rn bounded, running total monotone per key") {
    val rows = Relational.qWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) <= 3))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val tot = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(tot.zip(tot.tail).forall { case (a, b) => a <= b + 1e-6 })
    }
  }

  test("q_orderby_limit: 25 rows, descending price") {
    val p = Relational.qOrderbyLimit(spark, sf).collect().map(_.getDouble(2))
    assert(p.length === 25)
    assert(p.zip(p.tail).forall { case (a, b) => a >= b })
  }

  test("q_union_chain / q_semijoin / q_antijoin: sane row counts") {
    assert(Relational.qUnionChain(spark, sf).count() === 2)
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    val semi = Relational.qSemijoin(spark, sf).count()
    val anti = Relational.qAntijoin(spark, sf).count()
    assert(semi > 0 && semi <= nCust)
    assert(anti > 0 && anti <= nCust)
  }

  test("AsofJoin: latest-at-or-before semantics with boundary cases") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, 5L),   // after both right rows of key 1 → latest (t=4) wins
      (2L, 1L, 4L),   // exactly AT a right ts → that row matches (≤)
      (3L, 1L, 1L),   // before the first right row → dropped (inner)
      (4L, 2L, 9L),   // key 2: matches its only row
      (5L, 3L, 9L))   // key 3: no right rows at all → dropped
      .toDF("event_id", "k", "t")
    val right = Seq(
      (1L, 2L, "a"), (1L, 4L, "b"), (2L, 3L, "c"))
      .toDF("rk", "rt", "v")
    val out = graft.ops.AsofJoin.asof(left, right, "k", "t", "rk", "rt")
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "b", 2L -> "b", 4L -> "c"))
  }

  test("RangeJoin.binned: containment exact at bounds, across bin borders") {
    import spark.implicits._
    val pts = Seq((1L, 10L), (1L, 25L), (1L, 26L), (2L, 10L), (1L, 99L))
      .toDF("k", "p")
    val ivs = Seq((1L, 10L, 25L), (2L, 0L, 9L)).toDF("k", "s", "e")
    // binWidth 7 ≪ interval length: intervals straddle several bins
    val out = graft.ops.RangeJoin.binned(pts, ivs, "p", "s", "e",
        keys = Seq("k"), binWidth = 7L)
      .select("k", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 and 25 are inclusive bounds; 26 just outside; key 2 point 10 > e=9
    assert(out === Set((1L, 10L), (1L, 25L)))
  }

  test("AsofJoin carries null right values without dropping the match") {
    import spark.implicits._
    val left = Seq((1L, 1L, 5L)).toDF("event_id", "k", "t")
    val right = Seq((1L, 2L, Option.empty[String])).toDF("rk", "rt", "v")
    val out = graft.ops.AsofJoin.asof(left, right, "k", "t", "rk", "rt").collect()
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("v")))
  }

  test("q_profile: one row per column, PK fully distinct, hash-agg Expand plan") {
    val rows = Relational.qProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("o_custkey", "o_orderdate",
      "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    val nRows = rows.head.getLong(1)
    assert(nRows > 0 && rows.forall(_.getLong(1) === nRows))
    val pk = rows.find(_.getString(0) == "o_orderkey").get
    assert(pk.getLong(2) === 0L && pk.getLong(3) === nRows)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(3) <= nRows - r.getLong(2))
    }
    // min/max were aggregated on NORMALIZED numerics, not lexicographic
    val tp = rows.find(_.getString(0) == "o_totalprice").get
    assert(tp.getString(4).toLong <= tp.getString(5).toLong)
    // fixed-width stats ride one Expand fan-out kept in HashAggregate;
    // string min/max (var-length buffers => SortAggregate) get their own
    // Expand-free scan so the sort never sees the multiplied rows
    val plan = planOf(Relational.qProfile(spark, sf))
    assert("Expand".r.findAllMatchIn(plan).size >= 1 &&
      plan.contains("HashAggregate"), s"expected hash-agg Expand in:\n$plan")
    assert("Scan parquet".r.findAllMatchIn(plan).size === 2,
      s"expected the two-scan split in:\n$plan")
    assert(!plan.split("Expand").head.contains("SortAggregate"),
      s"string extrema must not sort the Expand-multiplied stream:\n$plan")
  }

  test("q_corr: r bounded by 1 and equal to an exact BigInt driver replay") {
    val rows = Relational.qCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    val data = graft.util.Tables(spark, sf).lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1))))
    val n = BigInt(data.length)
    val sx = data.map(_._1).sum; val sy = data.map(_._2).sum
    val sxy = data.map(p => p._1 * p._2).sum
    val sxx = data.map(p => p._1 * p._1).sum
    val syy = data.map(p => p._2 * p._2).sum
    val r = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    val expect = BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_.getString(0) == "R").get.getDouble(2)
    assert(got === expect)
  }

  test("q_cube: margins are consistent with the detail cells") {
    val rows = Relational.qCube(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getLong(3)))
    val detail = rows.filter(_._1 == 0L)
    val byFlag = rows.filter(_._1 == 1L)   // l_linestatus margined out
    val byStatus = rows.filter(_._1 == 2L) // l_returnflag margined out
    val grand = rows.filter(_._1 == 3L)
    assert(grand.length === 1)
    assert(grand.head._4 === detail.map(_._4).sum)
    byFlag.foreach { m =>
      assert(m._4 === detail.filter(_._2 == m._2).map(_._4).sum) }
    byStatus.foreach { m =>
      assert(m._4 === detail.filter(_._3 == m._3).map(_._4).sum) }
  }

  test("q_skyline equals the naive quadratic dominance check") {
    val o = graft.util.Tables(spark, sf).orders.select(
      col("o_totalprice").as("price"),
      floor(unix_timestamp(col("o_orderdate")) / 86400).as("day"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val naive = o.filter { case (p, d) =>
      !o.exists { case (q, e) =>
        q >= p && e >= d && (q > p || e > d) }
    }.toSet
    val skyline = Relational.qSkyline(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(skyline === naive.map(x => x),
      s"windowed skyline diverges from quadratic: ${skyline.size} vs ${naive.size}")
    assert(skyline.nonEmpty)
  }

  test("ZOrder.zvalue matches a naive per-bit interleave") {
    import spark.implicits._
    def naive(x: Long, y: Long): Long =
      (0 until 16).map(b => (((x >> b) & 1L) << (2 * b)) |
        (((y >> b) & 1L) << (2 * b + 1))).sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0xFFFFL),
      (1234L, 4321L), (0xAAAAL, 0x5555L), (65535L, 1L), (70000L, 3L))
    val out = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.ops.ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      // >16-bit inputs are masked — naive on the masked value
      assert(out((x, y)) === naive(x & 0xFFFFL, y & 0xFFFFL),
        s"zvalue($x, $y)")
    }
  }

  test("q_zorder: every z-cell is one 256x256 rectangle in (cust, day)") {
    val cells = graft.queries.Relational.qZorder(spark, sf).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      val (minC, maxC) = (r.getLong(2), r.getLong(3))
      val (minD, maxD) = (r.getLong(4), r.getLong(5))
      assert((minC >> 8) === (maxC >> 8) && maxC - minC <= 255,
        s"cell ${r.getLong(0)} cust bounds $minC..$maxC span a high byte")
      assert((minD >> 8) === (maxD >> 8) && maxD - minD <= 255,
        s"cell ${r.getLong(0)} day bounds $minD..$maxD span a high byte")
    }
  }

  test("ZOrder.layout: min/max stats prune range filters on BOTH dims") {
    import org.apache.spark.sql.DataFrame
    val o = graft.util.Tables(spark, sf).orders
      .select(col("o_custkey"),
        floor(unix_timestamp(col("o_orderdate")) / 86400).as("day"))
    // the footer-stats pruning model: a "file" (partition) is scanned
    // iff its [min,max] interval overlaps the filter range
    def pruneFrac(df: DataFrame, c: String, lo: Long, hi: Long): Double = {
      val stats = df.groupBy(spark_partition_id().as("p"))
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx")).collect()
      stats.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo).toDouble /
        stats.length
    }
    // filter windows = middle 1/16 of each dim's actual domain
    val b = o.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(col("day")), max(col("day"))).head()
    def window(lo: Long, hi: Long): (Long, Long) = {
      val mid = lo + (hi - lo) / 2; (mid, mid + math.max(1L, (hi - lo) / 16)) }
    val (cl, ch) = window(b.getLong(0), b.getLong(1))
    val (dl, dh) = window(b.getLong(2), b.getLong(3))
    val z = graft.ops.ZOrder.layout(o, col("o_custkey"), col("day"), 64)
    val zCust = pruneFrac(z, "o_custkey", cl, ch)
    val zDay = pruneFrac(z, "day", dl, dh)
    // day-leading lexicographic layout: day prunes, cust cannot
    val lex = o.repartitionByRange(64, col("day"), col("o_custkey"))
    val lexCust = pruneFrac(lex, "o_custkey", cl, ch)
    val lexDay = pruneFrac(lex, "day", dl, dh)
    assert(zCust < 0.7 && zDay < 0.7,
      s"z-order must prune both dims: cust=$zCust day=$zDay")
    assert(lexCust > 0.9,
      s"day-leading layout cannot prune the trailing dim (cust=$lexCust)")
    assert(zCust < lexCust,
      s"z-order cust pruning $zCust must beat lexicographic $lexCust")
    assert(lexDay <= zDay + 0.05,
      s"sanity: the leading lex dim prunes at least as well ($lexDay vs $zDay)")
  }

  test("FuzzyJoin: blocked result equals the naive quadratic, incl. shorts") {
    import spark.implicits._
    // crafted corpus: typo pairs, a no-shared-bigram short pair
    // ("ab"/"cd" ed=2 shares ZERO grams — only the short fallback can
    // find it), dupes (distinct first), and clear non-matches
    val vals = Seq("kitten", "sitten", "sittin", "sitting", "ab", "cd",
      "ax", "widget", "wídget", "gadget", "kitten", "zzzzzzzzzz")
      .toDF("v")
    val out = graft.ops.FuzzyJoin.selfJoin(vals, "v", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val names = vals.distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val naive = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(out === naive)
    assert(out.contains(("ab", "cd", 2)), "zero-shared-gram short pair")
    assert(out.contains(("kitten", "sitten", 1)))
    assert(!out.exists(p => p._1 == "zzzzzzzzzz" || p._2 == "zzzzzzzzzz"))
  }

  test("FuzzyJoin on part names: every pair verified, none fabricated") {
    val out = graft.queries.Relational.qFuzzyJoin(spark, sf).collect()
    assert(out.nonEmpty, "sf0.001 part names contain ed<=2 pairs")
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 2)
    }
  }

  test("q_constraints: clean corpus reports zero violations; every " +
      "constraint family detects a planted violation") {
    val clean = Relational.qConstraints(spark, sf).collect()
    assert(clean.length === 8)
    clean.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)} checked nothing")
      assert(r.getLong(2) === 0L, s"${r.getString(0)} on clean data")
    }
    // dirty fixture: one planted violation per family (plus a
    // DUPLICATED parent key, which must NOT fan out the FK join)
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq").toString
    import spark.implicits._
    Seq(1L, 2L, 2L).toDF("c_custkey")
      .write.parquet(s"$tmp/customer.parquet")
    Seq((10L, Some(1L), "O", 5.0), (11L, None, "F", 3.0),
        (12L, Some(99L), "X", -2.0), (12L, Some(2L), "P", 1.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.parquet(s"$tmp/orders.parquet")
    Seq((10L, 5.0), (77L, 0.0)).toDF("l_orderkey", "l_quantity")
      .write.parquet(s"$tmp/lineitem.parquet")
    val dirty = Relational.qConstraints(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dirty("customer.c_custkey unique") === ((3L, 1L)))
    assert(dirty("orders.o_orderkey unique") === ((4L, 1L)))
    assert(dirty("orders.o_custkey complete") === ((4L, 1L)))
    assert(dirty("orders.o_custkey -> customer.c_custkey") === ((3L, 1L)))
    assert(dirty("orders.o_orderstatus in {O,F,P}") === ((4L, 1L)))
    assert(dirty("orders.o_totalprice positive") === ((4L, 1L)))
    assert(dirty("lineitem.l_orderkey -> orders.o_orderkey") === ((2L, 1L)))
    assert(dirty("lineitem.l_quantity in [1,50]") === ((2L, 1L)))
  }

  test("q_mv_refresh: stored-state merge equals the one-shot aggregate " +
    "(the incremental-maintenance algebra)") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Relational.qMvRefresh(spark, sf).collect()
    val want = graft.util.Tables(spark, sf).orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_month"), col("o_orderstatus")).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    // both sides of the cutoff must actually contribute — otherwise the
    // merge path was never exercised
    assert(got.exists(_.getString(0) < "2000-01") &&
      got.exists(_.getString(0) >= "2000-01"))
  }

  test("JaroWinkler: DuckDB-parity semantics pinned (probed constants, " +
      "boost threshold, integer-halved transpositions, empties)") {
    import graft.functions.JaroWinkler.similarity
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = similarity(u(a), u(b))
    // textbook pairs, values read off DuckDB jaro_winkler_similarity
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    // DuckDB's empty-string choice: 0.0 even for two empties
    assert(jw("", "abc") === 0.0 && jw("abc", "") === 0.0 && jw("", "") === 0.0)
    // boost threshold: a 4-char shared prefix gets NO bonus at jaro
    // 0.511 or 0.667, DOES at 0.733 (DuckDB-probed)
    assert(math.abs(jw("abcdxxxxxxxx", "abcdyyyyyyyyyyyyyyyy")
      - 0.5111111111111111) < 1e-12)
    assert(math.abs(jw("abcdef", "abcxyz") - 2.0 / 3) < 1e-12)
    assert(math.abs(jw("abcdefghij", "abcdefwxyz") - 0.84) < 1e-12)
    // transpositions integer-halved: abcd/badc has 2 matched-order
    // mismatch pairs -> t = 1 (NOT 1.5-style fractional)
    assert(math.abs(jw("abcd", "badc") - 0.8333333333333334) < 1e-12)
    // match window: a match further than max/2-1 away does not count
    assert(jw("aaaaaaaaab", "b") === 0.0)
    // symmetric
    assert(jw("kitten", "sitting") === jw("sitting", "kitten"))
    // NON-ASCII parity (r13): DuckDB compares UTF-8 BYTES, so 'café'
    // is a 5-unit string — 0.8483 (byte Jaro), not the 4-char 0.8833.
    // All constants probed off duckdb jaro_winkler_similarity directly.
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-12)
    assert(math.abs(jw("naïve", "naive") - 0.8577777777777779) < 1e-12)
    assert(math.abs(jw("héllo wörld", "hello world")
      - 0.8531468531468531) < 1e-12)
    assert(math.abs(jw("日本語", "日本") - 0.9333333333333333) < 1e-12)
    assert(jw("café", "café") === 1.0)
    // SQL-callable through both registration paths
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS s").head()
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
  }

  test("q_triangles: brand rollup equals the naive a<b<c census 3x; " +
      "degree-ordered join emits each triangle exactly once") {
    val got = Relational.qTriangles(spark, sf).collect()
    // slot conservation: every triangle contributes exactly 3 vertex
    // slots, so sum(n_tri_slots) = 3 * naive triangle count
    val naive = {
      val t = graft.util.Tables(spark, sf)
      val keep = t.part.filter(col("p_size") <= 12).select(col("p_partkey"))
      val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
        .join(keep, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.withColumnsRenamed(Map("pk" -> "u"))
        .join(li.withColumnsRenamed(Map("pk" -> "v")), Seq("ok"))
        .filter(col("u") < col("v")).select(col("u"), col("v")).distinct()
      e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"), col("e3.u") === col("e1.u") &&
          col("e3.v") === col("e2.v"))
        .count()
    }
    assert(got.map(_.getLong(1)).sum === 3 * naive)
    assert(naive === 3433L, "sf0.001 census moved - fixture changed?")
    assert(got.length === 24) // 24 of the 25 brands participate
    // participation is bounded by the brand's vertex count
    assert(got.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 500))
  }

  test("q_er_link: zero mislinks at sf0.001; exact mentions score 10000; " +
      "only short doubled-prefix corruptions fall below the threshold") {
    val linked = Relational.qErLink(spark, sf).collect()
    assert(linked.length === 198, "2/200 stay unlinked by design")
    val truth = graft.util.Tables(spark, sf).part
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // precision: every link lands on the mention's true entity
    linked.foreach { r =>
      assert(r.getString(2) === truth(r.getLong(0)),
        s"mention ${r.getLong(0)} '${r.getString(1)}' mislinked")
    }
    // exact-mode mentions (p_partkey % 4 == 0) link at exactly 1.0
    linked.filter(_.getLong(0) % 4 == 0).foreach { r =>
      assert(r.getLong(3) === 10000L)
    }
    // the 2 unlinked are doubled-first-char corruptions of short names
    val unlinked = truth.keySet -- linked.map(_.getLong(0)).toSet
    assert(unlinked.forall(_ % 4 == 3))
  }

  test("q_er_link recall floor (r13 value gate): linked fraction and " +
      "zero mislinks pinned at sf0.01 too — blocking or threshold " +
      "regressions fail here, not in prose") {
    val sf01 = "/root/testdata/sf0.01"
    val linked = Relational.qErLink(spark, sf01).collect()
    val truth = graft.util.Tables(spark, sf01).part
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // measured floor: 1988/2000 linked (99.4% — the misses are the
    // documented short-name doubled-first-char sub-threshold scores,
    // all mode 3), and precision stays absolute
    assert(linked.length === 1988, s"linked ${linked.length}/2000")
    linked.foreach { r =>
      assert(r.getString(2) === truth(r.getLong(0)),
        s"mention ${r.getLong(0)} mislinked")
    }
    val unlinked = truth.keySet -- linked.map(_.getLong(0)).toSet
    assert(unlinked.forall(_ % 4 == 3))
  }

  test("q_bloom_join: bloom prefilter + exact join equals the plain " +
      "join; the prefilter never drops a true match") {
    val got = Relational.qBloomJoin(spark, sf).collect()
    val t = graft.util.Tables(spark, sf)
    val dim = t.orders.filter(col("o_totalprice") > 490000.0)
      .select(col("o_orderkey"), month(col("o_orderdate")).cast("long")
        .as("omonth"))
    val plain = t.lineitem
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"), col("omonth"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qty_c100"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 10000 + 0.5).cast("long")).as("rev_q4"))
      .orderBy(col("l_returnflag"), col("omonth"))
      .collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq ===
      plain.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq)
    // no false negatives: every lineitem of a qualifying order passes
    // the bloom (count the rows the exact join sees vs the true count)
    val trueRows = t.lineitem.join(dim,
      col("l_orderkey") === col("o_orderkey")).count()
    assert(got.map(_.getLong(2)).sum === trueRows)
  }
}
