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
