package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.immutable.ListMap

/** The reference's headline feature re-expressed for Spark: one input,
  * N independent pipelines, each with its own output directory.
  *
  * Reference mechanics: MultiPipeMapper.java:137 writes every input
  * record to every registered mapper process in ONE map pass;
  * PrefixOutputCollector.java:18 tags map output with
  * `mapoutput/<dirKey>`; MultiStreamJobRunner.java:44-78 then launches
  * one reduce job per pipeline reading its tagged slice and writing
  * `<outputHome>/<dirKey>`.
  *
  * Spark-first: each branch is a declarative plan over the shared input.
  * Two sharing strategies, chosen by the caller:
  *
  *  - `share = false` (default): branches re-scan the source. With
  *    parquet + column pruning each branch reads only its columns —
  *    at 100 TB this is usually CHEAPER than materializing full rows,
  *    because branches rarely touch the same columns.
  *  - `share = true`: persist the input at MEMORY_AND_DISK before
  *    fan-out — right when branches share an expensive upstream
  *    (a join/parse) rather than a raw scan.
  *
  * Unlike the reference there is no tagged union through one shuffle:
  * each branch shuffles only its own (usually already-aggregated) data,
  * so a heavy branch can't skew the others' reducers.
  */
final class MultiPipeline private (
    input: DataFrame,
    share: Boolean,
    branches: ListMap[String, Pipes.Pipe]) {

  /** Register pipeline `name` (the reference's `-multiple "name|map|red"`). */
  def branch(name: String)(f: Pipes.Pipe): MultiPipeline = {
    require(!branches.contains(name), s"duplicate branch '$name'")
    new MultiPipeline(input, share, branches + (name -> f))
  }

  /** Plan all branches over the (optionally persisted) shared input.
    * With share = true the caller owns the persisted input's lifetime:
    * call `unpersistShared()` (or use `write`, which does it) once all
    * branch actions have run, or the cached blocks live until session
    * end.
    */
  def run(): ListMap[String, DataFrame] = {
    val src = if (share && branches.size > 1)
      input.persist(StorageLevel.MEMORY_AND_DISK) else input
    branches.map { case (name, f) => name -> f(src) }
  }

  /** Release the shared input's cached blocks (no-op if share = false). */
  def unpersistShared(): Unit = if (share) { input.unpersist(); () }

  /** Write each branch under `outputHome/<name>` — the reference's
    * output layout (MultiStreamJobRunner.java:66-69).
    *
    * Branch jobs are SUBMITTED CONCURRENTLY (bounded thread pool):
    * Spark's scheduler interleaves independent jobs, so a branch
    * waiting on shuffle fetch or output commit doesn't serialize the
    * others — the reference pays one full sequential MR job per
    * pipeline here. Set parallelism = 1 for strictly sequential writes.
    */
  def write(outputHome: String, format: String = "parquet",
      parallelism: Int = 4): Unit = {
    val planned = run().toSeq
    try {
      if (parallelism <= 1 || planned.sizeIs <= 1) {
        planned.foreach { case (name, df) =>
          df.write.mode("overwrite").format(format).save(s"$outputHome/$name")
        }
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(parallelism, planned.size))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try Await.result(
          Future.traverse(planned) { case (name, df) =>
            Future {
              df.write.mode("overwrite").format(format).save(s"$outputHome/$name")
            }
          }, Duration.Inf)
        finally pool.shutdown()
        ()
      }
    } finally unpersistShared()
  }
}

object MultiPipeline {
  def apply(input: DataFrame, share: Boolean = false): MultiPipeline =
    new MultiPipeline(input, share, ListMap.empty)
}
