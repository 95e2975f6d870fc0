package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Directory-granularity epoch store — the snapshot-isolation
  * mechanism behind [[graft.dedup.SnapshotIndex]], factored out
  * because it is index-agnostic: ANY saved artifact whose maintenance
  * rewrites files (IVF/PQ codebook indexes, exported shard trees,
  * packed-sequence snapshots) gets the same guarantees by writing each
  * rewrite into `epoch=<N+1>/` and publishing through here.
  *
  * Layout under a root dir:
  * {{{
  *   <dir>/epoch=<N>/...         (the artifact, any shape)
  *   <dir>/epoch=<N>/_PUBLISHED  (epoch is complete and readable)
  *   <dir>/_CURRENT              (content: current epoch number)
  * }}}
  *
  * Invariants (spec-pinned via SnapshotIndex):
  *  - an epoch without `_PUBLISHED` is invisible — a crashed
  *    half-written rewrite can never become current;
  *  - `_CURRENT` is rewritten delete+create; in the crash window
  *    readers fall back to the max published epoch, which is exactly
  *    the epoch the pointer was about to name;
  *  - publish(N) retires epochs < N − retain, so a reader that pinned
  *    an epoch survives at least `retain` subsequent publishes.
  */
object Epochs {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def epochPath(dir: String, epoch: Long): String = s"$dir/epoch=$epoch"

  /** All epochs carrying a `_PUBLISHED` marker, ascending. */
  def published(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark, dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return Seq.empty
    val EpochRe = "epoch=(\\d+)".r
    fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case EpochRe(n)
            if fs.exists(new Path(st.getPath, "_PUBLISHED")) => Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

  /** The current epoch: `_CURRENT`, falling back to max published. */
  def current(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    val ptr = new Path(dir, "_CURRENT")
    // a concurrent publish swaps the pointer (write-temp → delete →
    // rename), so the open can race the delete even after exists() —
    // treat FNF exactly like a missing pointer (fall back to max
    // published, which is the epoch the new pointer is about to name).
    // Belt-and-braces: an empty or unparseable pointer (a torn write
    // from a pre-rename layout, or a foreign file) is ALSO treated as
    // missing rather than crashing the reader — the rename swap never
    // produces one, but the fallback is the safe answer either way.
    val fromPtr =
      if (!fs.exists(ptr)) None
      else {
        try {
          val in = fs.open(ptr)
          val content =
            try new String(in.readAllBytes(), "UTF-8").trim
            finally in.close()
          content.toLongOption
        } catch { case _: java.io.FileNotFoundException => None }
      }
    fromPtr.getOrElse {
      val pub = published(spark, dir)
      require(pub.nonEmpty, s"no published epoch under $dir")
      pub.max
    }
  }

  /** Mark `epoch` published, swing `_CURRENT`, retire epochs older
    * than `epoch - retain`.
    */
  def publish(spark: SparkSession, dir: String, epoch: Long,
      retain: Int = 1): Unit = {
    val fs = fsOf(spark, dir)
    fs.create(new Path(epochPath(dir, epoch), "_PUBLISHED"), true).close()
    // pointer swap: the content is fully written and closed in a temp
    // file BEFORE it becomes visible under the pointer name
    // (delete + rename), so a concurrent reader sees the old full
    // content, nothing (FNF → max-published fallback), or the new full
    // content — never a zero-byte or half-written pointer
    val ptr = new Path(dir, "_CURRENT")
    val tmp = new Path(dir, "_CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(ptr, false)
    fs.rename(tmp, ptr)
    published(spark, dir).filter(_ < epoch - retain)
      .foreach(e => fs.delete(new Path(epochPath(dir, e)), true))
  }

  /** Rewrite the current epoch's artifact into the next epoch dir and
    * publish it; returns the new epoch. `rewrite(currentDir, nextDir)`
    * must fully materialize the artifact under nextDir.
    */
  def rewriteToNext(spark: SparkSession, dir: String, retain: Int = 1)(
      rewrite: (String, String) => Unit): Long = {
    val cur = current(spark, dir)
    val next = cur + 1
    rewrite(epochPath(dir, cur), epochPath(dir, next))
    publish(spark, dir, next, retain)
    next
  }
}
