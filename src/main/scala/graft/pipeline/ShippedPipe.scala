package graft.pipeline

import java.io.{BufferedReader, File, InputStreamReader, PrintWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.SparkFiles
import org.apache.spark.rdd.RDD

/** The child-process runner behind every exec pipe — `RDD.pipe`'s
  * contract (feeder thread for stdin, stderr drained, nonzero exit
  * fails the task) plus two things PipedRDD can't give:
  *
  *  - **`-file` semantics** (reference MapStreamJob.java:282-287 ships
  *    files in the job jar; :232 rewrites the command to the basename,
  *    resolved in the task's unjarred working dir): PipedRDD's command
  *    tokens are fixed driver-side strings, but the executor-local path
  *    of a `SparkContext.addFile` file (`SparkFiles.get`) is only known
  *    INSIDE the task — at local[32] driver and executor share one
  *    files root, which is exactly the trap: a driver-resolved path
  *    works in every test and breaks on the first real cluster.
  *  - **Explicit UTF-8 on both child pipes**: PipedRDD reads and writes
  *    the child with the PLATFORM default charset, silently mangling
  *    multibyte text under a non-UTF-8 JVM default; the streaming
  *    contract is UTF-8 bytes, so Pipes routes ALL exec stages through
  *    here even with nothing shipped (PipeSpec pins the round-trip).
  */
object ShippedPipe {

  def pipe(lines: RDD[String], command: Seq[String],
      env: Map[String, String], shippedNames: Seq[String],
      archiveNames: Seq[String] = Nil): RDD[String] = {
    val names = shippedNames.toSet
    val archives = archiveNames.toSet
    // the child runs on EVERY partition, including empty ones — the
    // Hadoop contract RDD.pipe also honors: a reducer with no input
    // still executes (headers, "0" counts, side effects), and when
    // numPartitions pins the reducer count, the child count IS the
    // contract. Skipping empty partitions silently dropped those
    // children's output.
    lines.mapPartitions { it =>
      val root = new File(SparkFiles.getRootDirectory())
      val resolved = command.map { tok =>
        if (names(tok)) new File(SparkFiles.get(tok)).getAbsolutePath
        // `-archives` contract (reference MapStreamJob.java:307-311
        // cacheArchives: the archive is unpacked executor-side into a
        // directory named after it, and commands address members as
        // <archive>/<path>): SparkContext.addArchive unpacks under the
        // SparkFiles root, so the token resolves against it
        else if (archives.exists(a => tok.startsWith(a + "/")))
          new File(root, tok).getAbsolutePath
        else tok
      }
      // mark every shipped file executable, and run shipped pipes from
      // the SparkFiles root — the analog of Hadoop's unjarred task
      // working dir: a basename buried inside a `sh -c "...script.sh"`
      // string (the MultiSpec fall-through shape) can't be
      // token-substituted, but resolves against the cwd exactly as it
      // did under the reference
      val cwd =
        if (names.isEmpty && archives.isEmpty) None
        else {
          names.foreach(n => new File(SparkFiles.get(n)).setExecutable(true))
          // zip/jar archives do not carry the exec bit; a script bundle
          // is useless without it, so the whole (small, by contract)
          // unpacked tree is marked — the same effect as Hadoop's
          // unjarred working dir permissions
          archives.foreach(a => setExecutableTree(new File(root, a)))
          Some(root)
        }
      run(it, resolved, env, cwd)
    }
  }

  private def setExecutableTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(setExecutableTree))
    else { f.setExecutable(true); () }
  }

  private def run(input: Iterator[String], command: Seq[String],
      env: Map[String, String], cwd: Option[File] = None): Iterator[String] = {
    val pb = new ProcessBuilder(command: _*)
    cwd.foreach(pb.directory)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val cmdStr = command.mkString(" ")

    // drain stderr so a chatty child can't fill its pipe and deadlock
    val err = new Thread(() => {
      val r = new BufferedReader(
        new InputStreamReader(proc.getErrorStream, StandardCharsets.UTF_8))
      var line = r.readLine()
      while (line != null) {
        System.err.println(s"[graft.pipe $cmdStr] $line"); line = r.readLine()
      }
    }, "graft-pipe-stderr")
    err.setDaemon(true)
    err.start()

    // feed stdin off-thread: the task thread reads stdout concurrently,
    // so neither pipe buffer can stall the other (PipedRDD's design)
    @volatile var feedErr: Throwable = null
    val feeder = new Thread(() => {
      val w = new PrintWriter(new java.io.OutputStreamWriter(
        proc.getOutputStream, StandardCharsets.UTF_8))
      try { input.foreach(w.println); w.flush() }
      catch { case t: Throwable => feedErr = t }
      finally w.close()
    }, "graft-pipe-stdin")
    feeder.setDaemon(true)
    feeder.start()

    val out = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
    new Iterator[String] {
      private var nextLine: String = null
      private var done = false
      private def advance(): Unit = if (nextLine == null && !done) {
        nextLine = out.readLine()
        if (nextLine == null) {
          done = true
          val code = proc.waitFor()
          if (feedErr != null)
            throw new RuntimeException(s"pipe stdin feeder failed for: $cmdStr", feedErr)
          if (code != 0)
            throw new RuntimeException(s"pipe child exited $code: $cmdStr")
        }
      }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): String = {
        advance()
        if (done) throw new NoSuchElementException("pipe output exhausted")
        val l = nextLine; nextLine = null; l
      }
    }
  }
}
