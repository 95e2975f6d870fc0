package graft

import org.apache.spark.sql.functions._

/** Ad-hoc plan/profiling entry point — not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val edges = graft.dedup.MinHashLSH.nearDuplicates(
      graft.util.Tables(spark, dir).documents, "doc_id", "text", 3, 0.7)
      .select(col("id_a"), col("id_b")).persist()
    time("pairs materialize")(edges.count())

    // replicate ConnectedComponents.labels with per-step timing
    val e = edges
    val sym = e.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(e.select(col("id_b").as("u"), col("id_a").as("v")))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    var cur = sym.select(col("u").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    time("init count")(cur.count())
    var it = 0
    var converged = false
    while (it < 10 && !converged) {
      val prop = sym.join(broadcast(cur), sym("v") === cur("id"))
        .select(sym("u").as("id"), col("label"), lit(null).cast("long").as("old"))
      val own = cur.select(col("id"), col("label"), col("label").as("old"))
      val agg = own.unionByName(prop)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
        .persist()
      val changed = time(s"iter $it")(agg.filter(col("label") < col("old")).count())
      println(s"[probe] iter $it changed=$changed")
      cur.unpersist()
      cur = agg
      converged = changed == 0
      it += 1
    }
    spark.stop()
  }
}
