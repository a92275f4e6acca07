package graft

import org.apache.spark.sql.SparkSession

/** Local-dev scratch main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, d)
      println(s"===== $name formatted plan =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"===== $name time: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
