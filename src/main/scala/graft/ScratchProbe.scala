package graft

import org.apache.spark.sql.functions._

/** TEMPORARY phase-level profiler for optimization round 13 — not part
  * of the driver contract; deleted before round end.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    if (args.headOption.contains("takedown")) {
      // warm plans first
      t("takedown face cold") {
        SparkEntry.queries("q_takedown_audit")(spark, dir).count() }
      (1 to 2).foreach { round =>
        import spark.implicits._
        val base = graft.util.Staging.dir(spark, s"scr_tk$round")
        val idxDir = s"$base/index"
        val docs = graft.util.Tables(spark, dir).documents
        val seen = docs.filter(pmod(col("doc_id"), lit(5)) < 4)
        val idx = t(s"r$round build") {
          graft.dedup.MinHashIndex.build(seen, "doc_id", "text", n = 3) }
        t(s"r$round init(save+publish)") {
          graft.dedup.SnapshotIndex.init(idx, spark, idxDir) }
        val w1 = t(s"r$round wave collect") { seen
          .filter(pmod(col("doc_id"), lit(97L)) === 3)
          .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted }
        val removedDocs = docs.filter(pmod(col("doc_id"), lit(5)) < 4 &&
            pmod(col("doc_id"), lit(97L)) === 3)
          .select(col("doc_id"), col("text"))
        t(s"r$round before-probe ckpt") {
          graft.dedup.MinHashIndex.probe(
              graft.dedup.SnapshotIndex.load(spark, idxDir).index,
              removedDocs, "doc_id", "text", n = 3, tau = 0.7)
            .groupBy(col("new_id").as("doc_id"))
            .agg(count(lit(1)).as("n_before"))
            .localCheckpoint(true) }
        t(s"r$round remove(epoch rewrite)") {
          graft.dedup.SnapshotIndex.remove(spark, idxDir, w1) }
        t(s"r$round audit write") {
          w1.map(i => (i, 1L)).toDF("doc_id", "epoch")
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$base/audit/batch=0") }
        t(s"r$round full face") {
          SparkEntry.queries("q_takedown_audit")(spark, dir).count() }
        // save variants
        val v = graft.util.Staging.dir(spark, s"scr_tkv$round")
        t(s"r$round SAVE current") {
          idx.bands.write.mode("overwrite").partitionBy("band_id")
            .parquet(s"$v/b0")
          idx.shingles.write.mode("overwrite").parquet(s"$v/s0") }
        println("[scratch] files b0: " + new java.io.File(
          new java.net.URI(s"$v/b0")).listFiles().map(d =>
            if (d.isDirectory) d.listFiles().length else 1).sum)
        t(s"r$round SAVE range") {
          idx.bands.repartitionByRange(col("band_id"), col("band_hash"))
            .write.mode("overwrite").partitionBy("band_id")
            .parquet(s"$v/b1")
          idx.shingles.write.mode("overwrite").parquet(s"$v/s1") }
        println("[scratch] files b1: " + new java.io.File(
          new java.net.URI(s"$v/b1")).listFiles().map(d =>
            if (d.isDirectory) d.listFiles().length else 1).sum)
        t(s"r$round SAVE bandpart") {
          idx.bands.repartition(col("band_id"))
            .write.mode("overwrite").partitionBy("band_id")
            .parquet(s"$v/b2")
          idx.shingles.write.mode("overwrite").parquet(s"$v/s2") }
        // read+rewrite cost against each layout
        Seq("b0","b1","b2").foreach { b =>
          t(s"r$round REWRITE from $b") {
            spark.read.parquet(s"$v/$b")
              .filter(!col("doc_id").isInCollection(w1.toSet))
              .repartition(col("band_id"))
              .write.mode("overwrite").partitionBy("band_id")
              .parquet(s"$v/${b}_rw") }
        }
      }
    } else if (args.headOption.contains("admission")) {
      t("admission face cold") {
        SparkEntry.queries("q_admission_audit")(spark, dir).count() }
      (1 to 2).foreach { round =>
        t(s"r$round full face") {
          SparkEntry.queries("q_admission_audit")(spark, dir).count() }
      }
    } else {
      val names = if (args.nonEmpty) args.toSeq else Seq("novelty_stream")
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val ts = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scratch] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} " +
          f"min ${ts.min}%.2f")
      }
    }
    spark.stop()
  }
}
