package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

class CurationSpec extends SparkSpec {

  test("pii scrub: sequential counts, everything injected is redacted") {
    val rows = CurationQueries.textPiiScrub(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 1, s"doc $id n_email")
      assert(r.getInt(2) === 1, s"doc $id n_ipv4")
      // doc 0's 'ref 0' is a 1-digit run, below the {3,} floor
      assert(r.getInt(3) === (if (id * 1009 >= 100) 1 else 0), s"doc $id n_number")
    }
    // no residual PII after the full chain: rerun the patterns on clean text
    import spark.implicits._
    val clean = Seq("a <PII> b <PII> c").toDF("t")
    graft.text.TextOps.PiiPatterns.foreach { case (_, pat) =>
      assert(clean.filter(col("t").rlike(pat)).count() === 0L)
    }
  }

  test("quality rules: exploded-aggregation metrics match a direct compute") {
    val docs = graft.util.Tables(spark, sf).documents
    val byId = CurationQueries.textQualityRules(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId.size === 500)
    // independent per-row check on a few docs via plain Scala
    docs.select("doc_id", "text").collect().take(20).foreach { r =>
      val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
      val row = byId(r.getLong(0))
      assert(row.getLong(1) === toks.length.toLong)
      val meanLen = toks.map(_.length).sum.toDouble / toks.length
      assert(math.abs(row.getDouble(2) - meanLen) < 1e-3)
      val topRatio = toks.groupBy(identity).values.map(_.size).max.toDouble / toks.length
      assert(math.abs(row.getDouble(3) - topRatio) < 1e-3)
      assert(row.getDouble(4) === 0.0, "word-soup corpus has no symbols")
    }
  }

  test("decontaminate: flagged docs really share >= minShared trigrams") {
    val docs = graft.util.Tables(spark, sf).documents
    val flagged = CurationQueries.dedupDecontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.nonEmpty, "corpus should contain contaminated docs")
    assert(flagged.keys.forall(_ % 25 != 0), "holdout docs must not be flagged")
    // independent recompute with the library's own shingler
    val sh = graft.dedup.MinHashLSH.shingled(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val holdGrams = sh.collect { case (id, g) if id % 25 == 0 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    flagged.foreach { case (id, n) =>
      assert(sh(id).count(holdGrams.contains).toLong === n, s"doc $id overlap")
    }
  }

  test("pack_sequences: chunks are contiguous, tokens conserved per stratum") {
    val rows = CurationQueries.packSequences(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.keySet === Set("de", "en", "es", "fr", "zh"))
    val docs = graft.util.Tables(spark, sf).documents
      .select(col("lang"), graft.text.TextOps.tokens(col("text")).as("t"))
      .select(col("lang"), size(col("t")).as("n")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1).toLong).sum)
    byLang.foreach { case (lang, chunks) =>
      val ids = chunks.map(_._2).sorted
      assert(ids.toSeq === (ids.min to ids.max).toSeq, s"$lang chunks contiguous")
      assert(ids.min === 0L)
      assert(chunks.map(_._4).sum === docs(lang), s"$lang token conservation")
    }
  }

  test("emb_quantize: int8 range respected, reconstruction error sane") {
    val rows = CurationQueries.embQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (label, n, scaleE3, mseE6, maxQ) =
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(n % 64 === 0L, s"label $label: 64 dims per vector")
      assert(maxQ <= 127L, s"label $label exceeds int8 range")
      assert(scaleE3 > 0.0)
      // residual ≤ scale_v/2 per element; with per-vector scales the
      // label-level bound uses avg scale with 4× slack (Jensen headroom)
      assert(mseE6 / 1e6 <= math.pow(scaleE3 / 1000.0, 2),
        s"label $label mse out of bound")
    }
  }

  test("stratified sample is deterministic, k per stratum, hash-ordered") {
    val a = CurationQueries.sampleStratified(spark, sf).collect()
    val b = CurationQueries.sampleStratified(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "must be reproducible")
    val perLang = a.groupBy(_.getString(0))
    assert(perLang.keySet === Set("de", "en", "es", "fr", "zh"))
    perLang.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to 20))
      val hs = rows.sortBy(_.getInt(1))
        .map(r => math.floorMod(r.getLong(2) * 2654435761L, 4294967296L))
      assert(hs.toSeq === hs.sorted.toSeq, "must follow hash order")
    }
  }

  test("pipeline_e2e: stages compose — dropped source absent, shards sane") {
    val out = CurationQueries.pipelineE2e(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    // src2 carries weight 0 → the mixing stage must drop it entirely
    assert(!out.exists(_._1 == "src2"), "weight-0 source leaked through")
    out.foreach { case (src, shard, nCopies, nDocs, chars) =>
      assert(shard >= 0 && shard < 8)
      assert(nCopies >= nDocs && nDocs >= 1, s"$src/$shard accounting")
      assert(chars > 0)
    }
    // the ×2.5 source survives the pipeline and replicates into ≥ 2
    // shard cells (a doc's floor(2.5) = 2 copies are shard-hashed on
    // (doc, copy), so they spread); per-copy replication accounting is
    // pinned by the mix_sources oracle and ExportSpec
    assert(out.count(_._1 == "src0") >= 2, "upweighted source missing")
  }

  test("pack_bestfit: exact BFD placement on a fixture; corpus invariants") {
    import spark.implicits._
    // one shard so the placement is a pure BFD trace: lengths sorted
    // decreasing (ties by id) = 60, 50, 40, 30, 30, 10 into capacity 100
    //   60 -> bin0; 50 -> bin1; 40 -> bin0 (exact fit beats bin1's
    //   slack, 100 full); 30 -> bin1 (80); 30 -> bin2; 10 -> bin1
    //   (slack 20 < bin2's 70 — fullest feasible bin wins)
    val fx = Seq((1L, 30), (2L, 60), (3L, 40), (4L, 10), (5L, 50), (6L, 30))
      .toDF("doc_id", "len")
    val got = graft.ops.BestFitPack.pack(fx, "doc_id", "len",
        capacity = 100, shards = 1)
      .orderBy("bin_id")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0, 2L, 100L), (1, 3L, 90L), (2, 1L, 30L)))
    // the case where best-fit and first-fit DIVERGE: 7, 5, 4, 1 into
    // capacity 10 — 7 -> bin0; 5 -> bin1; 4 -> bin1 (9; bin0's slack 3
    // can't take it); 1 -> best-fit picks bin1 (slack 1, fullest),
    // where first-fit would have dropped it into bin0 (slack 3)
    val div = graft.ops.BestFitPack.pack(
        Seq((1L, 7), (2L, 5), (3L, 4), (4L, 1)).toDF("doc_id", "len"),
        "doc_id", "len", capacity = 10, shards = 1)
      .orderBy("bin_id")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(div.toSeq === Seq((0, 1L, 7L), (1, 3L, 10L)))
    // an oversized doc opens its own overflow bin, never dropped
    val over = graft.ops.BestFitPack.pack(
        Seq((1L, 150), (2L, 40)).toDF("doc_id", "len"),
        "doc_id", "len", capacity = 100, shards = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(over.toSet === Set((1L, 150L, 1.5), (1L, 40L, 0.4)))
    // corpus invariants at sf: every doc packed exactly once, no
    // regular bin over capacity, and packing actually packs (fewer
    // bins than docs)
    val docs = graft.util.Tables(spark, sf).documents
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).as("n_toks"))
    val nDocs = docs.count()
    val maxLen = docs.agg(max(col("n_toks"))).head().getInt(0)
    val bins = graft.queries.CurationQueries.packBestfit(spark, sf).collect()
    assert(bins.map(_.getLong(2)).sum === nDocs, "every doc in exactly one bin")
    if (maxLen <= 512)
      bins.foreach(r => assert(r.getLong(3) <= 512L,
        s"bin over capacity: $r"))
    assert(bins.length < nDocs, "BFD must consolidate docs into bins")
    // shard routing IS pmod(xxhash64(doc_id), 8): per-shard doc counts
    // from the bins must equal the counts of that arithmetic computed
    // independently over the corpus
    val shardCounts = bins.groupBy(_.getInt(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(2)).sum }
    val expectedCounts = docs
      .select(pmod(xxhash64(col("doc_id")), lit(8)).cast("int").as("s"))
      .groupBy(col("s")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(shardCounts === expectedCounts, "xxhash64 shard routing")
  }

  test("mix_curriculum: balanced phases, dense in-phase order, difficulty ramp") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.CurationQueries.mixCurriculum(spark, sf)
      .join(graft.util.Tables(spark, sf).documents.select("doc_id", "n_chars"),
        "doc_id")
    val n = out.count()
    val phases = out.groupBy(col("phase"))
      .agg(count(lit(1)).as("np"), max(col("ord")).as("maxOrd"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      .orderBy(col("phase")).collect()
    assert(phases.map(_.getLong(0)).toSeq === (1L to 4L))
    phases.foreach { r =>
      assert(math.abs(r.getLong(1) - n / 4) <= 1, "ntile balance")
      assert(r.getLong(1) === r.getLong(2), "ord must be dense 1..np")
    }
    // difficulty ramps: each phase's max length <= next phase's min
    phases.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) <= b.getLong(3),
        s"phase ${a.getLong(0)} hi ${a.getLong(4)} > next lo ${b.getLong(3)}")
    }
  }

  test("Dsir: target-vocab docs score positive, off-target negative, " +
      "tokenless zero; more target tokens => higher weight") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // target (is_t) docs speak {alpha, beta}; the raw corpus is
    // dominated by off-target docs speaking {zulu, yankee}. Token mass
    // is large enough that the add-1/add-B smoothing cannot flatten
    // the target-vs-raw contrast (with tiny counts the +B denominator
    // dominates and every ratio collapses toward B-relative noise).
    val tgtText = Seq.fill(10)("alpha beta").mkString(" ")
    val offText = Seq.fill(10)("zulu yankee").mkString(" ")
    val docs = (Seq(
      (1L, tgtText, true),
      (2L, tgtText, true),
      (20L, tgtText, false), // pure target vocab, raw doc
      (21L, offText, false), // pure off vocab
      (22L, "alpha alpha alpha zulu", false), // 3:1 target-heavy
      (23L, "zulu zulu zulu alpha", false), // 1:3 mirror of 22
      (24L, "", false)) ++ // tokenless
      (30L until 40L).map(i => (i, offText, false)))
      .toDF("doc_id", "text", "is_t")
    val out = graft.ops.Dsir
      .importanceWeights(docs, "doc_id", "text", col("is_t"),
        seed = 29L, nBuckets = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(20L)._2 > 0 && out(20L)._3 === 1L, s"pure target vocab: $out")
    assert(out(21L)._2 < 0 && out(21L)._3 === 0L, s"pure off vocab: $out")
    // docs 22/23 swap one multiset: w(22) - w(23) = 2(w_alpha - w_zulu)
    assert(out(22L)._2 > out(23L)._2,
      "more target tokens must mean a higher weight")
    assert(out(24L) === ((0L, 0L, 0L)), "tokenless doc scores 0, unselected")
    val again = graft.ops.Dsir
      .importanceWeights(docs, "doc_id", "text", col("is_t"), 29L, 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again === out, "weights must be rerun-identical")
  }

  test("mix_curriculum_bounds is byte-identical to the ntile curriculum, " +
      "including boundary tie-splits") {
    import org.apache.spark.sql.functions._
    def rows(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, dir: String) =
      fn(spark, dir).collect().map(_.toSeq).toSeq
    assert(rows(graft.queries.CurationQueries.mixCurriculumBounds _, sf) ===
      rows(graft.queries.CurationQueries.mixCurriculum _, sf))
    // adversarial tie case: one dominant length value STRADDLING
    // several ntile boundaries (ntile splits the tie run by doc_id
    // rank — exactly what the cum_below + within-value rank
    // decomposition must reproduce), plus a ragged n (103 % 4 != 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_curr_ties").toString
    import spark.implicits._
    val docs = ((0 until 90).map(i => (i.toLong, 50)) ++
      (90 until 97).map(i => (i.toLong, 7)) ++
      (97 until 103).map(i => (i.toLong, 999))).toDF("doc_id", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(rows(graft.queries.CurationQueries.mixCurriculumBounds _, tmp) ===
      rows(graft.queries.CurationQueries.mixCurriculum _, tmp))
  }

  test("pack_concat: two-phase offsets equal the naive global cumsum; " +
      "the token stream is dense and block spans are exact") {
    import org.apache.spark.sql.expressions.Window
    val got = CurationQueries.packConcat(spark, sf).collect()
    // the naive single-window form (test-scale only — the exact plan
    // shape the decomposition exists to avoid)
    val docs = graft.util.Tables(spark, sf).documents.select(
      col("doc_id"),
      graft.ops.ShuffleShard.hashKey(col("doc_id"), 7L).as("k"),
      (size(graft.text.TextOps.tokens(col("text"))) + 1).cast("long")
        .as("cost"))
    val naive = docs.withColumn("start_off", coalesce(
        sum(col("cost")).over(Window.orderBy(col("k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy(col("doc_id")).select("doc_id", "start_off").collect()
    assert(got.length === naive.length)
    got.zip(naive).foreach { case (g, n) =>
      assert(g.getLong(0) === n.getLong(0))
      assert(g.getLong(2) === n.getLong(1), s"doc ${g.getLong(0)}")
    }
    // dense stream: in offset order every doc starts where the
    // previous one's EOS ended
    val byOff = got.sortBy(_.getLong(2))
    byOff.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) + a.getLong(1) + 1 === b.getLong(2))
      case _ =>
    }
    // block-span arithmetic: last position = start + n_toks (the EOS)
    got.foreach { r =>
      val (start, nt) = (r.getLong(2), r.getLong(1))
      assert(r.getLong(3) === start / 512)
      assert(r.getLong(4) === (start + nt) / 512)
      assert(r.getLong(5) === r.getLong(4) - r.getLong(3) + 1)
    }
  }

  test("mix_token_budget: two-phase cumsum equals the naive global window; " +
      "kept set is the maximal fitting prefix of the quality order") {
    import org.apache.spark.sql.expressions.Window
    val got = CurationQueries.mixTokenBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // naive single-window replay (test-scale only)
    val docs = graft.util.Tables(spark, sf).documents.select(col("doc_id"),
      size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n_toks"),
      floor(graft.text.TextOps.charEntropy(col("text")) * 10000 + 0.5)
        .cast("long").as("sq"))
    val total = docs.agg(sum(col("n_toks"))).head().getLong(0)
    val naive = docs.withColumn("cum_before", coalesce(
        sum(col("n_toks")).over(Window.orderBy(col("sq").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") + col("n_toks") <= lit(total / 2))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === naive.toSeq)
    assert(got.nonEmpty && got.map(_._2).sum <= total / 2)
    // prefix semantics: budget 6 of 12 keeps exactly the best doc
    val tmp = java.nio.file.Files.createTempDirectory("graft_budget").toString
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta"),       // distinct chars → best
        (2L, "abab abab cdcd cdcd"),
        (3L, "aaaa aaaa aaaa aaaa"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val small = CurationQueries.mixTokenBudget(spark, tmp).collect()
    assert(small.map(_.getLong(0)).toSeq === Seq(1L))
    assert(small.head.getLong(3) === 0L)
  }

  test("mix_data_constrained: hand-computed water-filling with binding " +
      "caps; corpus run conserves the budget and honors every cap") {
    import spark.implicits._
    // fixture engineered so BOTH branches fire: 'hot' demands far more
    // than its 3-epoch cap (tiny corpus, huge weight), 'mid' caps too,
    // 'big' absorbs the remainder uncapped.
    //   hot: T=2,  w=1000, cap=6    big: T=100, w=100, cap=300
    //   mid: T=10, w=50,   cap=30   B = 2*112 = 224, W = 1150
    // water-filling (ratio order hot, mid, big):
    //   hot capped (6*1150 < 224*1000), mid capped (30*150 < 218*50),
    //   big uncapped: alloc = (224-36)*100 div 100 = 188 → 1.88 epochs
    val tmp = java.nio.file.Files.createTempDirectory("graft_mdc").toString
    Seq(
      (1L, "hot", "a b", 1000L),
      (2L, "mid", (1 to 10).map("m" + _).mkString(" "), 50L),
      (3L, "big", (1 to 100).map("b" + _).mkString(" "), 100L))
      .toDF("doc_id", "source", "text", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = CurationQueries.mixDataConstrained(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      ("big", 100L, 100L, 0L, 188L, 1880000L),
      ("hot", 2L, 1000L, 1L, 6L, 3000000L),
      ("mid", 10L, 50L, 1L, 30L, 3000000L)), s"got $got")
    // the fixture's single uncapped source takes the exact remainder
    assert(got.map(_._5).sum === 224L)
    // corpus run: every cap honored, budget conserved up to floor loss
    val corpus = CurationQueries.mixDataConstrained(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(corpus.nonEmpty)
    corpus.foreach { case (t, capped, alloc, ppm) =>
      assert(alloc <= 3 * t, "cap violated")
      assert(ppm <= 3000000L)
      if (capped == 1L) assert(alloc === 3 * t)
    }
    val budget = 2L * corpus.map(_._1).sum
    val total = corpus.map(_._3).sum
    val nUncapped = corpus.count(_._2 == 0L)
    assert(total <= budget && budget - total < math.max(1, nUncapped),
      s"budget $budget vs allocated $total (uncapped $nUncapped)")
  }

  test("mix_split: disjoint-exhaustive 97/2/1 split, deterministic and " +
      "stable under re-runs") {
    val rows = CurationQueries.mixSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = graft.util.Tables(spark, sf).documents.count()
    assert(rows.values.sum === n, "splits must partition the corpus")
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    assert(rows("train").toDouble / n > 0.9, s"train share ${rows("train")}/$n")
    // determinism: a second run is byte-identical
    assert(CurationQueries.mixSplit(spark, sf).collect().toSeq ===
      CurationQueries.mixSplit(spark, sf).collect().toSeq)
  }

  test("q_source_quality: planted duplicate mass and driver-replayed " +
      "entropy means report exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_srcq").toString
    val a = Seq("alpha beta gamma", "alpha beta gamma", "delta epsilon zeta",
      "eta theta iota")                       // one dup class of 2 → mass 2/4
    val b = Seq("kappa lambda mu", "nu xi omicron")   // no dups
    (a.zipWithIndex.map { case (t, i) => (i.toLong, "A", t, t.length) } ++
      b.zipWithIndex.map { case (t, i) => (100L + i, "B", t, t.length) })
      .toDF("doc_id", "source", "text", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = CurationQueries.qSourceQuality(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("A").getLong(1) === 4L && rows("B").getLong(1) === 2L)
    assert(rows("A").getDouble(5) === 0.5 && rows("B").getDouble(5) === 0.0)
    // mean entropy: driver replay of the quantized per-doc values
    def meanEq(texts: Seq[String]): Double = {
      val eqs = texts.map(t => math.floor(
        graft.functions.CharEntropy.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
          * 10000 + 0.5).toLong)
      math.floor(eqs.sum.toDouble / eqs.length / 10000 * 10000 + 0.5) / 10000
    }
    assert(rows("A").getDouble(4) === meanEq(a))
    assert(rows("B").getDouble(4) === meanEq(b))
  }

  test("sample_weighted: driver-side E-S replay agrees; long docs overrepresented") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf).documents
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent replay of the seeded key (md5 u01 + ln/w, micro-quantized)
    def key(id: Long, w: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:77".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(md5.take(8), 16) + 1L).toDouble / 4294967297.0
      math.floor(math.log(u) / w * 1e6 + 0.5).toLong
    }
    val expect = docs.map { case (id, w) => (key(id, w), -id) }.sorted.reverse
      .take(100).map { case (_, negId) => -negId }.toSet
    val got = graft.queries.CurationQueries.sampleWeighted(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got === expect, "Spark top-k must equal the driver E-S replay")
    // weighting works: the sample's mean length exceeds the corpus mean
    val lens = docs.toMap
    val sampleMean = got.map(lens).sum.toDouble / got.size
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("export_manifest: shards cover the corpus; checksum is order-insensitive") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf).documents
    val out = graft.queries.CurationQueries.exportManifest(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum === docs.count(), "row counts tile corpus")
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    // recompute one shard's checksum from rows fed in REVERSED key order:
    // bit_xor must not care (the whole point of the manifest checksum)
    val assigned = graft.ops.ShuffleShard.assign(docs, "doc_id", 42L, 16)
      .filter(col("shard") === 0L)
      .orderBy(col("doc_id").desc)
      .select(conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("text"))), 1, 15), 16, 10).cast("long").as("sig"))
      .collect().map(_.getLong(0))
    val xor = assigned.foldLeft(0L)(_ ^ _)
    val manifest0 = out.find(_.getLong(0) == 0L).get
    assert(manifest0.getLong(3) === xor, "driver-side xor replay must match")
  }

  test("mix_dedup_weight: log-damped copies per duplicate class, keep-min ids") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ddw").toString
    // class {1,2} (token-set normalization folds word order) → size 2,
    // weight 2; singleton {3} → 1; class {10..14} → size 5, weight 3
    val docs = Seq((1L, "x y"), (2L, "y x"), (3L, "z")) ++
      (10L to 14L).map(i => (i, "w q"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.CurationQueries.mixDedupWeight(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 2L), (3L, 1L, 1L), (10L, 5L, 3L)))
  }

  test("pack_stats: closed-form replay from the per-doc token counts; " +
    "concat is the padding floor") {
    import org.apache.spark.sql.functions._
    val ns = graft.util.Tables(spark, sf).documents
      .select((size(graft.text.TextOps.tokens(col("text"))) + 1)
        .cast("long").as("n"))
      .collect().map(_.getLong(0))
    val cap = 512L
    val tok = ns.sum
    val got = graft.queries.CurationQueries.packStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val concatBlocks = (tok + cap - 1) / cap
    assert(got("concat") ===
      ((concatBlocks, tok, 0L, concatBlocks * cap - tok)))
    val padBlocks = ns.map(n => (n + cap - 1) / cap).sum
    assert(got("pad_per_doc") === ((padBlocks, tok, 0L, padBlocks * cap - tok)))
    val kept = ns.map(math.min(_, cap)).sum
    assert(got("truncate_per_doc") ===
      ((ns.length.toLong, kept, tok - kept, ns.length * cap - kept)))
    // the floor: concat can never pad more than the per-doc layouts
    assert(got("concat")._4 <= got("pad_per_doc")._4)
  }

  test("q_corpus_diff: statuses replay the planted transform exactly and " +
    "partition the id universe") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf).documents
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val removed = ids.filter(_ % 31 == 0)
    val changed = ids.filter(i => i % 31 != 0 && i % 13 == 0)
    // fresh ids offset by max(doc_id)+1 (r9: collision-free at every
    // corpus size, unlike the old fixed 10M constant)
    val offset = ids.max + 1
    val added = ids.filter(_ % 17 == 3).map(_ + offset)
    val unchanged = ids.filter(i => i % 31 != 0 && i % 13 != 0)
    val got = graft.queries.CurationQueries.qCorpusDiff(spark, sf).collect()
      .groupBy(_.getString(1))
      .map { case (st, rs) =>
        st -> (rs.map(_.getLong(2)).sum, rs.map(_.getLong(3)).sum) }
    assert(got("removed") === ((removed.size.toLong, removed.sum)))
    assert(got("changed") === ((changed.size.toLong, changed.sum)))
    assert(got("added") === ((added.size.toLong, added.sum)))
    assert(got("unchanged") === ((unchanged.size.toLong, unchanged.sum)))
  }

  test("q_shard_delivery: published epochs validate bit-complete; counts conserve") {
    val rows = CurationQueries.qShardDelivery(spark, sf).collect()
    assert(rows.length === 16)
    assert(rows.forall(_.getBoolean(4)), "every delivered shard must validate")
    assert(rows.map(_.getLong(1)).sum === 500L, "row conservation across shards")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_resume_cursor: cursors replay the exact shard-order prefix walk") {
    val rows = CurationQueries.qResumeCursor(spark, sf).collect()
    assert(rows.length === 7)
    // driver replay of the layout: seeded md5 key, shard = key mod 16,
    // global order (shard, key, doc_id), half-open char intervals
    val docs = graft.util.Tables(spark, sf).documents
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def key(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$id:42").take(8), 16)
    val ordered = docs
      .map { case (id, n) => (key(id) % 16, key(id), id, n) }
      .sortBy { case (sh, k, id, _) => (sh, k, id) }
    val total = ordered.map(_._4).sum
    var cum = 0L
    val walk = ordered.zipWithIndex.map { case ((sh, _, id, n), i) =>
      val before = cum; cum += n; (sh, id, before, cum, i.toLong)
    }
    rows.foreach { r =>
      val k = r.getLong(0)
      val t = total * k / 8
      assert(r.getLong(1) === t, s"k=$k offset")
      val hit = walk.find(w => t >= w._3 && t < w._4).get
      assert(r.getLong(2) === hit._1, s"k=$k shard")
      assert(r.getLong(3) === hit._2, s"k=$k doc")
      assert(r.getLong(4) === t - hit._3, s"k=$k skip")
      assert(r.getLong(5) === hit._5, s"k=$k docs_before")
      // the skip must land INSIDE the doc
      assert(r.getLong(4) >= 0 && r.getLong(4) < hit._4 - hit._3)
    }
  }

  test("mix_perplexity_band: edges replay from the oracled lmscore; partition exhaustive") {
    val out = CurationQueries.mixPerplexityBand(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 20)
    // q per doc recovered from text_lmscore (itself hash-oracled):
    // lm_score = q/10000 exactly one decimal-quantized step away
    val q = graft.queries.TextQueries.textLmscore(spark, sf).collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(1) * 10000 + 0.5).toLong).toMap
    val docs = graft.util.Tables(spark, sf).documents
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val sorted = ds.map(d => q(d._1)).sorted
      val n = sorted.length.toLong
      val lo = sorted(((n + 9) / 10 - 1).toInt)   // ⌈n/10⌉-th smallest
      val hi = sorted(((n * 9 + 9) / 10 - 1).toInt)
      val r = out(src)
      assert(r.getLong(5) === lo, s"$src lo_q")
      assert(r.getLong(6) === hi, s"$src hi_q")
      val keep = ds.filter(d => q(d._1) >= lo && q(d._1) <= hi)
      assert(r.getLong(1) === n, s"$src n_docs")
      assert(r.getLong(2) === keep.length.toLong, s"$src n_keep")
      assert(r.getLong(3) === ds.count(d => q(d._1) < lo).toLong, s"$src n_low")
      assert(r.getLong(4) === ds.count(d => q(d._1) > hi).toLong, s"$src n_high")
      assert(r.getLong(7) === keep.map(_._3).sum, s"$src kept_chars")
      // partition is exhaustive and the band really holds ~80%
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) === n)
      assert(r.getLong(2) >= (n * 9 + 9) / 10 - (n + 9) / 10 + 1)
    }
  }

  test("q_crawl_novelty: planted edits are the ONLY novelty; arithmetic " +
      "and per-source replay hold") {
    val out = graft.queries.CurationQueries.qCrawlNovelty(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 20)
    out.foreach { case (src, (grams, novel, bp)) =>
      assert(grams > 0 && novel >= 0 && novel <= grams, src)
      assert(bp === novel * 10000 / grams, s"$src basis points")
    }
    // independent replay from the raw docs: trigram sets per source on
    // both sides of the planted recrawl — novelty must match exactly
    val docs = graft.util.Tables(spark, sf).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String): Set[String] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val oldAll = docs.iterator.flatMap(d => grams(d._3)).toSet
    val newDocs =
      docs.filter(_._1 % 31 != 0).map { case (id, src, tx) =>
        (src, if (id % 13 == 0) tx + " [edited]" else tx) } ++
      docs.filter(_._1 % 17 == 3).map { case (_, src, tx) =>
        (src, tx + " v2") }
    newDocs.groupBy(_._1).foreach { case (src, ds) =>
      val g = ds.iterator.flatMap(d => grams(d._2)).toSet
      val novel = g.diff(oldAll)
      assert(out(src)._1 === g.size.toLong, s"$src gram count")
      assert(out(src)._2 === novel.size.toLong, s"$src novel count")
      // every novel gram must touch a planted suffix - the recrawl
      // invents no other text, so novelty is exactly the edit signal
      novel.foreach(ng => assert(
        ng.contains("[edited]") || ng.contains("v2"), s"$src: $ng"))
    }
  }
}
