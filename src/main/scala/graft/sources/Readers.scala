package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Legacy input formats as reusable DataFrame readers — the reference's
  * `-inputformat` / `-inputreader` surface (MapStreamJob.java:298
  * inputFormatSpec_, :823-838 StreamXmlRecordReader) lifted to one call
  * each. The SourceQueries round-trips prove each reader's semantics
  * against the DuckDB oracle; MultiStream's `-inputformat` flag routes
  * a CLI job through these, so a reference invocation ports untouched.
  */
object Readers {

  /** Plain text lines → one `value` column (TextInputFormat). */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** KeyValueTextInputFormat: key = text before the FIRST tab, value =
    * the rest (limit-2 split, so tabs inside the value survive).
    */
  def kvText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t", 2).as("parts"))
      .select(col("parts").getItem(0).as("k"),
        // tab-less lines: value = "" (Hadoop's KeyValueTextInputFormat
        // semantic), not NULL — a NULL would reach exec'd children as
        // the literal string "null"
        coalesce(col("parts").getItem(1), lit("")).as("v"))

  /** SequenceFile[Text, Text] via the Hadoop RDD bridge — the one
    * legacy surface where RDDs are the honest carrier (no DataFrame
    * SequenceFile source exists).
    */
  def sequenceText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF("k", "v")
  }

  /** StreamXmlRecordReader analog: tag-delimited records that may span
    * lines, carried by TextInputFormat with the record delimiter set to
    * the BEGIN tag — splits land on record starts, records never
    * straddle splits. Each emitted `rec` is exactly one begin..end
    * span: the begin tag followed by the body up to (not including) its
    * end tag. Delimiting on the begin tag (rather than the end tag)
    * makes the spans exact the way the reference's StreamXmlRecordReader
    * is: inter-record junk lands BEFORE the next begin delimiter (cut
    * by `substring_index` on the end tag), and a trailing unterminated
    * record — begin tag but no end tag — has no end tag in its chunk
    * and is dropped, not emitted as a phantom record.
    */
  def xmlRecords(spark: SparkSession, path: String, beginTag: String,
      endTag: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", beginTag)
    spark.sparkContext.newAPIHadoopFile(path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      // offset 0 = each file's pre-first-delimiter chunk: the prologue
      // before the first begin tag (or "" when the file opens with
      // one). Dropping it by OFFSET — not by content — means a
      // prologue that happens to mention the end tag (a comment, a
      // stray closer) cannot fabricate a phantom record; every real
      // record chunk starts after a begin delimiter at offset > 0.
      .filter(_._1.get() > 0)
      .map(_._2.toString)
      .toDF("chunk")
      // unterminated trailing record (begin tag, no end tag): no end
      // tag in its chunk → dropped, not emitted as a phantom record
      .filter(col("chunk").contains(endTag))
      .select(concat(lit(beginTag),
        substring_index(col("chunk"), endTag, 1)).as("rec"))
  }

  /** Avro container files → DataFrame, without the spark-avro module
    * (absent from this classpath; only avro core + avro-mapred ship
    * with the Spark distribution here). The writer schema is sniffed
    * from the first container's header on the driver — one small
    * metadata read, the same move a DataSource `inferSchema` makes —
    * mapped onto Catalyst over the primitive subset plus `[null, T]`
    * unions, and rows then ride avro-mapred's `AvroKeyInputFormat`:
    * container sync-blocks split like any Hadoop input, so a
    * many-file, many-GB .avro corpus scans in parallel with no
    * driver-side row handling. Non-primitive fields fail loudly
    * rather than guessing a lossy mapping.
    */
  def avro(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.Schema
    import org.apache.spark.sql.types._

    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val avroFiles = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro"))
    if (avroFiles.isEmpty)
      sys.error(s"Readers.avro: no .avro container files under $path " +
        "to sniff the writer schema from")
    val first = avroFiles.minBy(_.getName.toString)
    val in = fs.open(first)
    val header =
      try {
        val r = new org.apache.avro.file.DataFileStream(in,
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try r.getSchema finally r.close()
      } finally { try in.close() catch { case _: Throwable => () } }

    def catalystOf(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case Schema.Type.UNION =>
        val branches =
          s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
        if (branches.size != 1 || branches.size == s.getTypes.size())
          sys.error(s"Readers.avro: only [null, T] unions supported, got $s")
        (catalystOf(branches.head)._1, true)
      case other =>
        sys.error(s"Readers.avro: unsupported avro type $other in $s")
    }
    val avroFields = header.getFields.asScala.toSeq
    val struct = StructType(avroFields.map { f =>
      val (dt, nullable) = catalystOf(f.schema())
      StructField(f.name, dt, nullable)
    })
    val names = avroFields.map(_.name)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[
          org.apache.avro.generic.GenericRecord]],
        classOf[org.apache.avro.mapred.AvroKey[
          org.apache.avro.generic.GenericRecord]],
        classOf[org.apache.hadoop.io.NullWritable], hconf)
      .map { case (k, _) =>
        // extract eagerly: the record reader REUSES the AvroKey holder
        val rec = k.datum()
        org.apache.spark.sql.Row.fromSeq(names.map { n =>
          rec.get(n) match {
            case null => null
            case u: org.apache.avro.util.Utf8 => u.toString
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case v => v
          }
        })
      }
    spark.createDataFrame(rows, struct)
  }
}
