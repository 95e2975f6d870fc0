package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-first equivalents of the line-pipe executables users run under
  * Hadoop Streaming (the reference pipes records through external
  * processes: MultiPipeMapRed.java writes each record to every child's
  * stdin and parses stdout back into key/value on a field separator).
  *
  * Here a "pipe stage" is `DataFrame => DataFrame` built from codegen'd
  * `functions._` — no process boundary, no row-at-a-time serialization,
  * and Catalyst can fuse consecutive stages into one WholeStageCodegen
  * span (chained executables in the reference cost a full MR job each).
  */
object Pipes {
  type Pipe = DataFrame => DataFrame

  /** `/bin/cat` — identity mapper (reference README's 4th example). */
  def cat: Pipe = identity

  /** `grep pattern` over a text column. */
  def grep(c: String, pattern: String): Pipe = _.filter(col(c).rlike(pattern))

  /** `grep -v`. */
  def grepV(c: String, pattern: String): Pipe = _.filter(!col(c).rlike(pattern))

  /** `cut -d sep -f fields` — 1-based field indexes, like cut(1).
    * Emits one column per requested field, named `f<i>`.
    */
  def cut(c: String, sep: String, fields: Seq[Int]): Pipe = { df =>
    val parts = split(col(c), java.util.regex.Pattern.quote(sep))
    df.select(fields.map(i => parts.getItem(i - 1).as(s"f$i")): _*)
  }

  /** `tr` / `sed s/…/…/g` — regex replace over a column. */
  def sed(c: String, pattern: String, replacement: String): Pipe =
    _.withColumn(c, regexp_replace(col(c), pattern, replacement))

  /** `/bin/wc` — lines, whitespace-delimited words, chars of a text
    * column. Single partial-aggregatable pass; at 100 TB this is a
    * map-side-combined global agg, not a driver loop.
    */
  def wc(c: String): Pipe = _.agg(
    count(lit(1)).as("lines"),
    sum(size(regexp_extract_all(col(c), lit("\\S+"), lit(0)))).as("words"),
    sum(length(col(c))).as("chars"))

  /** Canonical streaming wordcount: tokenize, explode, count. */
  def wordcount(c: String): Pipe = { df =>
    df.select(explode(split(lower(col(c)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Key extraction per `stream.num.map.output.key.fields` /
    * `stream.map.output.field.separator` (MultiPipeMapper.java:118-125):
    * key = first `numKeyFields` fields of the line, value = the rest.
    * The reference shuffles on this key (KeyFieldBasedPartitioner);
    * downstream groupBy/repartition on `key` is the Spark equivalent.
    */
  def keyBy(c: String, sep: String, numKeyFields: Int): Pipe = { df =>
    val q = java.util.regex.Pattern.quote(sep)
    val parts = split(col(c), q)
    df.withColumn("key",
        concat_ws(sep, (1 to numKeyFields).map(i => parts.getItem(i - 1)): _*))
      .withColumn("value",
        // everything after the first numKeyFields fields
        array_join(
          slice(parts, lit(numKeyFields + 1),
            greatest(size(parts) - numKeyFields, lit(0))), sep))
  }

  /** Build a delimited "line" from columns — the inverse bridge: turns a
    * structured frame into the text-line world the reference lives in.
    */
  def toLine(sep: String, cols: Seq[String]): Pipe = { df =>
    df.select(concat_ws(sep, cols.map(col): _*).as("line"))
  }

  /** Chain stages left-to-right — the reference chains MR jobs; here the
    * chain is one Catalyst plan.
    */
  def chain(stages: Pipe*): Pipe = stages.reduceLeft(_ andThen _)

  /** Hadoop Streaming's counter channel (`reporter:counter:group,name,n`
    * lines on a child's stderr, parsed by MultiPipeMapRed), Spark-first:
    * an `observe` stage records aggregate metrics DURING the same pass —
    * a CollectMetrics node in the plan, no second job, no UDF, the
    * surrounding stages stay codegen-fused. Read the values from the
    * Observation after the action:
    *
    * {{{
    * val obs = new org.apache.spark.sql.Observation("stage1")
    * val out = Pipes.chain(Pipes.grep("text", "spark"),
    *   Pipes.counted(obs, count(lit(1)).as("records_out")))(df)
    * out.write...; obs.get("records_out")
    * }}}
    */
  def counted(obs: org.apache.spark.sql.Observation,
      metrics: org.apache.spark.sql.Column*): Pipe = { df =>
    require(metrics.nonEmpty, "counted needs at least one metric column")
    df.observe(obs, metrics.head, metrics.tail: _*)
  }

  /** The external-executable escape hatch: pipe a text column through an
    * arbitrary child process, one process per partition, exactly the
    * reference's record model (MultiPipeMapRed.java:212 holds one child
    * stdin per pipeline; :764 frames records as lines). This is the
    * migration path for a legacy `-mapper ./score.py` that the native
    * stages above can't express.
    *
    * Every other stage in this file beats this one at scale — a child
    * process costs fork/exec per partition, line serialization both
    * ways, and is opaque to Catalyst (no pushdown through it, no
    * codegen fusion). Use it for the binaries you can't rewrite; tag
    * ids into the line (`toLine`) and parse them back out (`cut`) to
    * keep joinability.
    *
    * `env` is the `-cmdenv NAME=VALUE` surface (MultiPipeMapRed.java:203
    * addEnvironment): vars are set in each child's environment. For the
    * reference's `-file` shipping, distribute with
    * `spark.sparkContext.addFile(path)` and resolve per-executor inside
    * a shell wrapper, or inline small scripts via env:
    * `exec(c, Seq("/bin/sh", "-c", "python3 -c \"\$GRAFT_SRC\""),
    *       Map("GRAFT_SRC" -> src))`.
    *
    * The child must exit 0: Spark's PipedRDD fails the task otherwise.
    * Tools with grep-style "no match" exit codes need a
    * `sh -c '... || true'` wrapper.
    *
    * Output: one string column named like the input — exec stages chain
    * with each other and with every native stage.
    */
  def exec(c: String, command: Seq[String],
      env: Map[String, String] = Map.empty): Pipe = { df =>
    linesToDf(df, c, df.select(col(c).cast("string")))(command, env)
  }

  /** The external REDUCER contract, exactly as Hadoop Streaming frames
    * it: records are partitioned by key (first `numKeyFields`
    * `sep`-separated fields) and each partition is key-sorted before
    * the child sees it, so one child process receives every record of
    * each of its keys, contiguously — the child can aggregate by
    * watching the key change between lines, the way every streaming
    * reducer script is written. One shuffle, then one child per
    * partition; key groups never straddle children.
    */
  def execReduce(c: String, sep: String, numKeyFields: Int,
      command: Seq[String], env: Map[String, String] = Map.empty): Pipe = { df =>
    val keyed = keyBy(c, sep, numKeyFields)(df)
      .repartition(col("key"))
      .sortWithinPartitions(col("key"))
      .select(col(c).cast("string"))
    linesToDf(df, c, keyed)(command, env)
  }

  private def linesToDf(src: DataFrame, c: String,
      lines: DataFrame)(command: Seq[String], env: Map[String, String]): DataFrame =
    src.sparkSession.createDataFrame(
      lines.rdd.map(_.getString(0)).pipe(command, env)
        .map(org.apache.spark.sql.Row(_)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          c, org.apache.spark.sql.types.StringType, nullable = false))))
}
