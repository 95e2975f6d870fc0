package graft
import org.apache.spark.sql.SparkSession
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 4) {
      var t0 = System.nanoTime()
      graft.queries.PipeQueries.pipeKeyfieldAgg(spark, "/root/testdata/sf0.1").count()
      val a = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime()
      graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.1").count()
      val b = (System.nanoTime()-t0)/1e9
      println(f"run$i: keyfield=$a%.2f q1=$b%.2f")
    }
    spark.stop()
  }
}
