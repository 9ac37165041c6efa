package graft

import org.apache.spark.sql.SparkSession

/** Temporary profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    for (n <- args) {
      def run(): Unit = {
        spark.catalog.clearCache()
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$n warm")(run())
      for (i <- 1 to 3) time(s"$n run$i")(run())
    }
    spark.stop()
  }
}
