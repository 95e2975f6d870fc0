package graft

import graft.queries.SourceQueries

class SourceSpec extends SparkSpec {

  test("source_kv: tab-in-value survives the limit-2 split") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("k1\tv with\ttab", "k2\tplain").toDF("value")
    val kv = df.select(split(col("value"), "\t", 2).as("p"))
      .select(col("p").getItem(0).as("k"), col("p").getItem(1).as("v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(kv === Map("k1" -> "v with\ttab", "k2" -> "plain"))
  }

  test("source_kv aggregates the round-tripped orders correctly") {
    val got = SourceQueries.sourceKv(spark, sf).collect()
    val want = graft.util.Tables(spark, sf).orders.count()
    assert(got.map(_.getLong(1)).sum === want)
    assert(got.map(_.getString(0)).toSeq === got.map(_.getString(0)).toSeq.sorted)
  }

  test("source_xmlrecord reassembles multi-line tag-delimited records") {
    val r = SourceQueries.sourceXmlrecord(spark, sf).head()
    import org.apache.spark.sql.functions._
    val want = graft.util.Tables(spark, sf).documents
      .agg(count(lit(1)), sum(length(col("text"))), sum(col("doc_id"))).head()
    assert(r.getLong(0) === want.getLong(0))
    assert(r.getLong(1) === want.getLong(1))
    assert(r.getLong(2) === want.getLong(2))
  }

  test("xmlRecords yields exact begin..end spans, drops junk and unterminated tails") {
    // inter-record junk, a comment prologue, and a trailing record with
    // no end tag — the reader must emit ONLY the two proper spans, with
    // nothing outside begin..end (the advisor's r4 finding: the end-tag
    // delimiter emitted junk prefixes and a phantom trailing record)
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_spans")
    java.nio.file.Files.write(dir.resolve("part-0.txt"),
      // the prologue MENTIONS the end tag — a content-based filter
      // would fabricate a phantom record from it; the offset-0 drop
      // must not
      ("<!-- schema note: records close with </rec> -->\n" +
        "<rec>alpha\nbody</rec>\ninter-record junk\n" +
        "<rec>beta</rec>\n" +
        "<rec>unterminated tail").getBytes("UTF-8"))
    val recs = graft.sources.Readers
      .xmlRecords(spark, dir.toString, "<rec>", "</rec>")
      .collect().map(_.getString(0)).toSet
    assert(recs === Set("<rec>alpha\nbody", "<rec>beta"))
  }

  test("source_seqfile round-trips (Text,Text) pairs losslessly") {
    val got = SourceQueries.sourceSeqfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    import org.apache.spark.sql.functions._
    val want = graft.util.Tables(spark, sf).orders
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)), sum(col("o_orderkey")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
  }

  test("source_compact: every output file holds at most rowsPerFile rows") {
    import org.apache.spark.sql.functions._
    val row = graft.queries.SourceQueries.sourceCompact(spark, sf).head()
    assert(row.getLong(2) === row.getLong(3), "one row per doc")
    // per-file row counts via the input_file_name of a fresh read are
    // not available here (temp dir is internal), so re-derive: the
    // reported file count times the cap must cover the rows, and the
    // compaction must strictly reduce the file count
    assert(row.getLong(1) * 2000L >= row.getLong(2))
    assert(row.getLong(1) < row.getLong(0))
  }

  test("gzip text round-trips through the plain text source; one .gz per partition") {
    import spark.implicits._
    val out = graft.util.Staging.dir(spark, "gzip_spec")
    (1 to 100).map(i => s"line$i").toDF("value").repartition(3)
      .write.mode("overwrite").option("compression", "gzip").text(out)
    assert(graft.util.Staging.countFiles(spark, out, ".gz") === 3L)
    val back = graft.sources.Readers.text(spark, out)
      .collect().map(_.getString(0)).toSet
    assert(back === (1 to 100).map(i => s"line$i").toSet)
  }

  test("Readers.avro: header-sniffed schema, Utf8→String, [null,T] union nulls") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.avro.generic.GenericRecord
    import org.apache.avro.mapred.AvroKey
    import org.apache.hadoop.io.NullWritable
    val out = graft.util.Staging.dir(spark, "avro_spec") + "/recs"
    val schemaJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"name","type":"string"},
        |{"name":"note","type":["null","string"],"default":null}]}"""
        .stripMargin
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
    org.apache.avro.mapreduce.AvroJob.setOutputKeySchema(job,
      new org.apache.avro.Schema.Parser().parse(schemaJson))
    spark.sparkContext.parallelize(0L until 10L, 2).mapPartitions { it =>
      val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      it.map { i =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", i)
        rec.put("name", s"n$i")
        rec.put("note", if (i % 2 == 0) null else s"note$i")
        (new AvroKey[GenericRecord](rec), NullWritable.get)
      }
    }.saveAsNewAPIHadoopFile(out, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[org.apache.avro.mapreduce.AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
    val df = graft.sources.Readers.avro(spark, out)
    assert(df.schema === StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("note", StringType, nullable = true))))
    val rows = df.orderBy(col("id")).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) === s"n$i")
      if (i % 2 == 0) assert(r.isNullAt(2))
      else assert(r.getString(2) === s"note$i")
    }
  }

  test("source_backfill: final state equals the clean recompute; bad months " +
    "fully restored") {
    import org.apache.spark.sql.functions._
    val got = SourceQueries.sourceBackfill(spark, sf).collect()
    val want = graft.util.Tables(spark, sf).orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"),
        sum(col("o_orderkey")).as("sum_keys"))
      .orderBy(col("o_month")).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    // the corrupted load zeroed prices in months 3 and 8 — a surviving
    // zero-sum month would mean the dynamic overwrite missed a partition
    got.filter(r => r.getString(0).endsWith("-03") || r.getString(0).endsWith("-08"))
      .foreach(r => assert(r.getDouble(2) > 0.0))
  }

  test("dynamic partition overwrite replaces ONLY the incoming partitions; " +
    "untouched partition files survive byte-identical") {
    import org.apache.spark.sql.functions._
    val out = graft.util.Staging.dir(spark, "backfill_spec")
    val df = spark.range(0, 100)
      .select(col("id"), (col("id") % 4).cast("string").as("p"))
    df.write.mode("overwrite").partitionBy("p").parquet(out)
    def listing(p: String): Seq[(String, Long, Long)] = {
      val d = new org.apache.hadoop.fs.Path(s"$out/p=$p")
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(d).filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
        .toSeq.sortBy(_._1)
    }
    val before = listing("1")
    // dynamic overwrite of partitions 2 and 3 only, with changed content
    df.filter(col("p").isin("2", "3")).withColumn("id", col("id") + 1000)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("p").parquet(out)
    assert(listing("1") === before) // same names, lengths, mtimes — untouched
    val back = spark.read.parquet(out)
    assert(back.count() === 100) // static mode would have dropped p=0 and p=1
    assert(back.filter(col("p") === "2").agg(min(col("id"))).head().getLong(0) >= 1000)
    assert(back.filter(col("p") === "1").agg(max(col("id"))).head().getLong(0) < 1000)
  }

  test("source_evolve: mergeSchema surfaces the late column, null-fills " +
    "pre-evolution rows") {
    import org.apache.spark.sql.functions._
    val t = graft.util.Tables(spark, sf).orders
    val rows = SourceQueries.sourceEvolve(spark, sf).collect()
    val pre = rows.filter(_.getString(0) == "(pre-evolution)")
    assert(pre.length === 1)
    assert(pre.head.getLong(1) ===
      t.filter(col("o_orderkey") % 2 === 0).count())
    assert(rows.map(_.getLong(1)).sum === t.count())
    // and the mechanism itself: a two-batch dir where only batch 2 has
    // the column — merged read must carry it, old rows must be null
    val out = graft.util.Staging.dir(spark, "evolve_spec")
    spark.range(0, 5).select(col("id")).write.mode("append").parquet(out)
    spark.range(5, 10).select(col("id"), lit("v2").as("tag"))
      .write.mode("append").parquet(out)
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.schema.fieldNames.toSet === Set("id", "tag"))
    assert(merged.filter(col("id") < 5).filter(col("tag").isNull).count() === 5)
    assert(merged.filter(col("tag") === "v2").count() === 5)
  }

  test("source_manifest: the pinned file list carries exactly the pinned " +
    "shard population — no bleed, no loss") {
    import org.apache.spark.sql.functions._
    val got = SourceQueries.sourceManifest(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 5L, 10L, 15L))
    val assigned = graft.ops.ShuffleShard.assign(
      graft.util.Tables(spark, sf).documents, "doc_id", 42L, 16)
    val want = assigned.filter(col("shard").isin(0L, 5L, 10L, 15L))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("ids"))
      .orderBy(col("shard")).collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getLong(1) === w.getLong(1))
      assert(g.getLong(3) === w.getLong(2))
    }
    // the manifest read must be a strict subset of the directory read
    assert(got.map(_.getLong(1)).sum <
      graft.util.Tables(spark, sf).documents.count())
  }

  test("source_codecs: all four codecs round-trip identically; zstd and " +
    "gzip really compress smaller than snappy") {
    import org.apache.spark.sql.functions._
    val rows = SourceQueries.sourceCodecs(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("gzip", "lz4", "snappy", "zstd"))
    assert(rows.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .distinct.length === 1, "codec choice must never change values")
    // size signal: measure the written bytes per codec directly
    def bytesUnder(c: String): Long = {
      val out = graft.util.Staging.dir(spark, s"codecsz_$c")
      graft.util.Tables(spark, sf).lineitem
        .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", c).parquet(out)
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
    val (sn, zs, gz) = (bytesUnder("snappy"), bytesUnder("zstd"),
      bytesUnder("gzip"))
    assert(zs < sn && gz < sn,
      s"expected zstd ($zs) and gzip ($gz) below snappy ($sn)")
  }

  test("source_quarantine: torn lines route to quarantine with exact signatures") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sig(line: String): Long =
      java.lang.Long.parseLong(md5hex(line).take(15), 16)
    val corpus = graft.util.Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the fixture's planted JSON-hostile row rides the replay too
    val docs = corpus :+ ((corpus.map(_._1).max + 1, "we\"ird\\src", 11L))
    // driver replay of the fixture + to_json escaping + routing +
    // signature arithmetic
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val want = docs.map { case (id, src, n) =>
      val full = s"""{"doc_id":$id,"source":"${esc(src)}","len":$n}"""
      if (id % 23 == 7) ("_quarantine", (full.length - 3).toLong,
        sig(full.dropRight(3)))
      else (src, n, sig(full))
    }.groupBy(_._1).map { case (b, xs) =>
      b -> ((xs.length.toLong, xs.map(_._2).sum,
        xs.map(_._3).reduce(_ ^ _)))
    }
    val got = SourceQueries.sourceQuarantine(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    // the planted torn-write class is really present and really torn:
    // every doc_id % 23 == 7 line is quarantined, nothing else is
    assert(got("_quarantine")._1 === docs.count(_._1 % 23 == 7).toLong)
    assert(got.values.map(_._1).sum === docs.length.toLong,
      "no line lost between clean routing and quarantine")
    // the quote-and-backslash source survived the round-trip into its
    // OWN bucket (not quarantine, not a mangled name)
    assert(got.contains("we\"ird\\src") ||
      (docs.last._1 % 23 == 7),
      "the JSON-hostile source must round-trip as a clean bucket")
  }
}
