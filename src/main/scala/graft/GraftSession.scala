package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's recommended configuration.
  *
  * Local runs: `local[32]` / 32 shuffle partitions to match the dev
  * machine. On a cluster, pass the real master and size
  * `spark.sql.shuffle.partitions` ≈ 2-3× total executor cores (and rely
  * on AQE coalescing to shrink small stages back down); nothing in the
  * library hardcodes a partition count.
  *
  * The AQE block is the 100 TB posture: runtime re-planning, automatic
  * coalescing of over-partitioned shuffles, and skew-join splitting for
  * the hot keys every real corpus has. UTC session time zone keeps
  * event-time semantics engine-independent (and oracle-comparable).
  */
object GraftSession {

  def builder(master: String = s"local[$defaultCpus]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", defaultCpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // some events.parquet generations carry TIMESTAMP(NANOS); set at
      // build time so no read path has to flip session conf mid-flight
      // (Tables.events still sets it defensively for sessions built
      // elsewhere; a no-op for micros/millis parquet)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Core count for local mode: SPARK_GRAFT_CPUS env, else 32 (the
    * driver contract's `local[32]`).
    */
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Build the session and register graft's native functions. */
  def create(master: String = s"local[$defaultCpus]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
