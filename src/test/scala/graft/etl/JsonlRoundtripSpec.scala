package graft.etl

import graft.{SparkSpec, Tables}
import graft.queries.EtlQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gzip-sharded JSONL round-trip: losslessness (row-set equality incl.
  * multi-byte text), shard layout, and the lane's checksum shape. */
class JsonlRoundtripSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("round-trip is lossless row for row, including zh text") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_jsonl_spec"
    val src = Tables.documents(spark, sf())
    src.repartition(4, col("doc_id"))
      .write.mode("overwrite").option("compression", "gzip").json(out)
    val back = spark.read.schema(docSchema).json(out)
      .select(src.columns.map(col).toSeq: _*)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
    // gzip shards on disk, one per partition
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length === 4)
    // multi-byte text genuinely crossed the escape/encode boundary
    val zh = back.filter(col("lang") === "zh").count()
    assert(zh > 0L)
  }

  test("ORC round-trip is lossless and lane-equal to JSONL") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_orc_spec"
    val src = Tables.documents(spark, sf())
    src.repartition(4, col("doc_id"))
      .write.mode("overwrite").option("compression", "zlib").orc(out)
    val back = spark.read.orc(out).select(src.columns.map(col).toSeq: _*)
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
    // both format lanes compute the same aggregate of the same data
    val viaOrc = EtlQueries.orcRoundtrip(spark, sf()).collect().toSeq
    val viaJsonl = EtlQueries.jsonlRoundtrip(spark, sf()).collect().toSeq
    assert(viaOrc === viaJsonl)
  }

  test("lane aggregate matches the same aggregate on the parquet source") {
    val lane = EtlQueries.jsonlRoundtrip(spark, sf()).collect()
    val direct = Tables.documents(spark, sf())
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(graft.functions.TextFunctions.rollingHash(col("text")))
          .as("content_sum"))
      .orderBy("lang").collect()
    assert(lane.toSeq === direct.toSeq)
  }
}
