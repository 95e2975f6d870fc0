package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Staging directories for queries that materialize intermediate files
  * (blob ingestion, compaction targets, bucketed warehouses).
  *
  * Two properties a driver-local `Files.createTempDirectory` lacks:
  *
  *  - **Shared-filesystem visibility**: the root derives from
  *    `graft.staging.dir` (session conf) falling back to
  *    `spark.sql.warehouse.dir`, so on a real cluster executor-side
  *    writes (`foreachPartition` + Hadoop `FileSystem`) land where the
  *    driver and every other node can read them — `/tmp` on one
  *    executor's local disk is invisible to the rest of the cluster.
  *  - **Cleanup**: every directory handed out is deleted by one JVM
  *    shutdown hook, so repeated bench/verify runs don't accrete
  *    orphaned staging trees. Deletion happens at exit, not eagerly,
  *    because the returned DataFrames read the files lazily.
  */
object Staging {

  private val issued = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile private var hookRegistered = false

  /** A fresh, empty directory under the shared staging root. The
    * UUID suffix keeps concurrent queries (and concurrent test suites
    * in one JVM) collision-free.
    */
  def dir(s: SparkSession, prefix: String): String = {
    val root = s.conf.getOption("graft.staging.dir")
      .getOrElse(s.conf.get("spark.sql.warehouse.dir"))
    val p = new Path(new Path(root, "graft_staging"),
      s"${prefix}_${java.util.UUID.randomUUID().toString.take(12)}")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val resolved = fs.makeQualified(p).toString
    issued.add(resolved)
    if (!hookRegistered) synchronized {
      if (!hookRegistered) {
        hookRegistered = true
        val conf = new org.apache.hadoop.conf.Configuration(
          s.sparkContext.hadoopConfiguration)
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          val it = issued.iterator()
          while (it.hasNext) {
            val d = new Path(it.next())
            try d.getFileSystem(conf).delete(d, true)
            catch { case _: Throwable => () }
          }
        }))
      }
    }
    resolved
  }

  /** Clone a directory tree for a run that will MUTATE its copy of a
    * shared fixture (the pristine-index pattern: build a persisted
    * index once per corpus dir, clone per run so appends/rewrites
    * never leak into the next run). Parquet DATA files are hard-linked
    * when both sides are the local FS — every graft store treats data
    * files as immutable (appends add part files, rewrites land in new
    * epoch dirs, retention deletes only unlink), so a link is safe and
    * turns the per-run copy into metadata ops. Markers (_SUCCESS,
    * _CURRENT, lease files — anything the commit protocol or Epochs
    * may re-create in place) are byte-copied, as is everything on a
    * non-local FS.
    */
  def cloneTree(s: SparkSession, from: String, to: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new Path(from)
    val dst = new Path(to)
    val srcFs = src.getFileSystem(conf)
    val dstFs = dst.getFileSystem(conf)
    val link = srcFs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] &&
      dstFs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem]
    def go(st: org.apache.hadoop.fs.FileStatus, d: Path): Unit =
      if (st.isDirectory) {
        dstFs.mkdirs(d)
        srcFs.listStatus(st.getPath)
          .foreach(c => go(c, new Path(d, c.getPath.getName)))
      } else if (link && st.getPath.getName.endsWith(".parquet")) {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(d.toUri.getPath),
          java.nio.file.Paths.get(st.getPath.toUri.getPath))
      } else {
        org.apache.hadoop.fs.FileUtil.copy(srcFs, st.getPath, dstFs, d,
          false, true, conf)
      }
    srcFs.listStatus(src).foreach(st =>
      go(st, new Path(dst, st.getPath.getName)))
  }

  /** Number of files under `dir` whose name ends with `suffix`, listed
    * through the Hadoop FileSystem API (works on any shared FS, not
    * just `java.io.File`-visible local paths).
    */
  def countFiles(s: SparkSession, dir: String, suffix: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(st => st.isFile && st.getPath.getName.endsWith(suffix)).toLong
  }
}
