package graft.streaming

import graft.functions.{TextFunctions => TF}
import graft.operators.QualityRules
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming tier over the DOCUMENTS corpus — the streaming
  * ingest shape of an LLM data pipeline (documents arrive continuously
  * from a crawler; the quality gate runs on the stream, not in a nightly
  * batch). File-stream source with an explicit schema (no inference job
  * on the stream), same discipline as [[EventsStream]].
  */
object DocsStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-stream over documents.parquet. */
  def docsRawStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)

  /** Streaming quality gate: the [[QualityRules]] Gopher battery
    * applied per arriving micro-batch (a pure projection — no state),
    * with a complete-mode (lang, gopher_pass) count on top. The
    * projection+count composition is micro-batch-cut invariant, so the
    * drained stream equals the batch aggregation row for row — which is
    * the oracle. At 100 TB/day this is the always-on ingest monitor:
    * per-language pass rates maintained continuously, rejected docs
    * filterable in the same pass. */
  def streamingQualityGate(spark: SparkSession, sfDir: String,
      queryName: String = "doc_quality_gate"): DataFrame = {
    val flagged = QualityRules.gopherMetrics(
      docsRawStream(spark, sfDir)
        .withColumn("norm_text", TF.normalize(col("text"))),
      keep = Seq("lang"))
    val counts = flagged.groupBy(col("lang"), col("gopher_pass"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"))
    val q = counts.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
