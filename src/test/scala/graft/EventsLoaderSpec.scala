package graft

import java.nio.file.Files
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.util.Tables

/** The events loader must accept every time unit the driver's data
  * generator has shipped — TIMESTAMP(NANOS) (surfaces as raw longs
  * under the nanosAsLong conf), naive TIMESTAMP(MICROS) (surfaces as
  * TIMESTAMP_NTZ), and UTC-adjusted TIMESTAMP(MICROS) (surfaces as
  * TIMESTAMP) — and load IDENTICAL values from each. The nanos fixture
  * is fabricated with parquet-java's example writer because Spark
  * itself cannot write nanos timestamps.
  */
class EventsLoaderSpec extends SparkSpec {

  // one instant, expressed in each unit: 2024-03-01T12:34:56.789123456
  private val microsOfInstant = Seq(
    1709296496789123L, // the above, ns-truncated to us
    1709300000000000L,
    1709300000000001L)

  private def writeNanosFixture(dir: String): Unit = {
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val writer = ExampleParquetWriter.builder(new HPath(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    // trailing sub-microsecond digits must truncate away, like DuckDB
    microsOfInstant.zipWithIndex.foreach { case (us, i) =>
      writer.write(gf.newGroup()
        .append("event_id", i.toLong)
        .append("ts", us * 1000L + (if (i == 0) 456L else 0L)))
    }
    writer.close()
  }

  /** flavor: "ntz" = naive TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (what pyarrow writes for tz-less timestamps — the regen's shape);
    * "ltz" = annotated TIMESTAMP(MICROS, isAdjustedToUTC=true) —
    * Spark's default outputTimestampType is INT96, so it must be
    * forced or this flavor silently tests INT96 twice; "int96" =
    * legacy Impala/Hive physical int96.
    */
  private def writeMicrosFixture(dir: String, flavor: String): Unit = {
    val session = spark
    import session.implicits._
    val base = microsOfInstant.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")
    val df =
      if (flavor == "ntz") base.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      else base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val outType = if (flavor == "int96") "INT96" else "TIMESTAMP_MICROS"
    val before = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", outType)
    // one file named exactly events.parquet, the shape Tables expects
    val tmp = Files.createTempDirectory("graft_events_stage").toString
    try df.coalesce(1).write
      .option("parquet.block.size", 1 << 20)
      .mode("overwrite").parquet(tmp)
    finally before match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"))
  }

  private def loadedMicros(dir: String): (Seq[(Long, Long)], String) = {
    val df = Tables(spark, dir).events
    assert(df.schema("ts").dataType == TimestampType,
      s"canonical ts must be session-tz TIMESTAMP, got ${df.schema("ts").dataType}")
    val rows = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    (rows, df.schema.treeString)
  }

  test("nanos, micros-NTZ, micros-UTC and int96 events files load identical values") {
    val dirs = Seq("nanos", "ntz", "ltz", "int96").map { tag =>
      tag -> Files.createTempDirectory(s"graft_events_$tag").toString
    }.toMap
    writeNanosFixture(dirs("nanos"))
    Seq("ntz", "ltz", "int96").foreach(f => writeMicrosFixture(dirs(f), f))

    val expected = microsOfInstant.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.sorted
    dirs.foreach { case (tag, dir) =>
      val (rows, schema) = loadedMicros(dir)
      assert(rows == expected, s"unit=$tag loaded wrong values ($schema)")
    }
  }

  test("normalizeEventTs is a no-op on an already-canonical frame") {
    val df = Tables(spark, sf).events
    val again = Tables.normalizeEventTs(df)
    assert(again.schema("ts").dataType == TimestampType)
    assert(df.schema == again.schema)
  }

  test("real testdata events load with a usable time axis (not 1970)") {
    val r = Tables(spark, sf).events
      .agg(min(unix_timestamp(col("ts"))).as("lo"),
        max(unix_timestamp(col("ts"))).as("hi"))
      .collect()(0)
    // a 1000x-off micros-as-nanos misread would land in Jan 1970
    assert(r.getLong(0) > 946684800L, s"ts axis collapsed: min=${r.getLong(0)}")
    assert(r.getLong(1) >= r.getLong(0))
  }
}
