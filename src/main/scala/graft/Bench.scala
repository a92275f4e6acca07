package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark harness (SURVEY.md §3 E1): mirrors the reference's
  * `perf stat -r N` discipline (reference src/benchmark_clickhouse.sh:26)
  * — per-query warmups then repeated measured runs, mean reported.
  *
  * Headline queries are the four reference benchmark aggregations
  * (SURVEY.md §2.4 A1-A4) plus one representative of each extension
  * family (join, dedup, ANN, text, streaming-equivalent sessionize) so
  * the bench tracks the whole operator surface, not just the easy scans.
  *
  * Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  */
object Bench {

  /** Queries timed per round. Order fixed for stable output. */
  val headline: Seq[String] = Seq(
    "q1_count_by_flag", "q2_avg_by_status", "q3_count_by_flag_year",
    "q4_count_3key_sorted", "q7_denorm_join", "q9_projection",
    "dedup_exact", "dedup_minhash", "ann_bruteforce",
    "text_stats", "sessionize", "asof_join", "range_join")

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Execute the full plan without collecting rows to the driver beyond
    * the aggregate result: count() on a cached-nothing plan would let
    * Catalyst prune work, so materialize via a no-op foreach instead. */
  private def run(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_WARMUPS", "1").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    // local-dev override: bench only the named queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = headline
      .filter(n => only.forall(_.contains(n)))
      .flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        try {
          (1 to warmups).foreach(_ => run(fn(spark, sfDir)))
          val times = (1 to repeats).map(_ => time(run(fn(spark, sfDir))))
          System.err.println(
            s"[bench] $name ${times.map("%.2f".format(_)).mkString(",")}s")
          name -> times.sum / times.size
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> -1.0
        }
      }
    }
    val qs = results.map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${"%.4f".format(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
