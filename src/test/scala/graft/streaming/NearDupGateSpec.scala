package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.{ShingleFunctions, TextFunctions => TF}
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class NearDupGateSpec extends SparkSpec {

  /** Pure-batch twin of the streaming gate: both sides' band keys from
    * the same row-local family, plain joins. */
  private def batchGate(d: String): DataFrame = {
    def bandsOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("source"),
        ShingleFunctions.distinctShingles(
          TF.tokens(TF.normalize(col("text"))), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("h0", Dedup.portableShingleHashes(col("sh")))
      .select(col("doc_id"), col("source"),
        posexplode(Dedup.portableBandKeysFromHashes(col("h0")))
          .as(Seq("band", "bkey")))
    val all = Tables.documents(spark, d)
    val cb = bandsOf(all.filter(pmod(col("doc_id"), lit(5)) =!= 0))
      .select("band", "bkey").distinct()
    val flagged = bandsOf(all.filter(pmod(col("doc_id"), lit(5)) === 0))
      .join(cb, Seq("band", "bkey"))
      .select("doc_id", "source").distinct()
      .groupBy("source").agg(count(lit(1)).as("n_flagged"))
    all.filter(pmod(col("doc_id"), lit(5)) === 0)
      .groupBy("source").agg(count(lit(1)).as("n_stream"))
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("n_stream"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        (col("n_stream") - coalesce(col("n_flagged"), lit(0L)))
          .as("n_pass"))
  }

  test("streaming near-dup gate equals the batch LSH probe") {
    val streamed = DocsStream.streamingNearDupGate(
      spark, sf(), "spec_neardup_gate")
    val batch = batchGate(sf())
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("row-local band keys equal the groupBy-min signature form") {
    // the aggregation-form portable pipeline and the row-local form
    // must produce identical candidate structure: same band keys per
    // doc. Compare via the pair sets each induces on the split corpus.
    val docs = Tables.documents(spark, sf())
      .withColumn("norm_text", TF.normalize(col("text")))
    val rowLocal = Dedup
      .shingleSets(docs, "doc_id", "norm_text", shingleLen = 3)
      .filter(size(col("sh")) > 0)
      .withColumn("h0", Dedup.portableShingleHashes(col("sh")))
      .select(col("id"),
        posexplode(Dedup.portableBandKeysFromHashes(col("h0")))
          .as(Seq("band", "bkey")))
    val pairsRowLocal = rowLocal.as("a").join(rowLocal.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val pairsAgg = Dedup.minhashPairsPortable(
      docs.filter(TF.tokenCount(col("norm_text")) > 0),
      "doc_id", "norm_text").select("id_a", "id_b")
    assert(pairsRowLocal.exceptAll(pairsAgg).count() === 0)
    assert(pairsAgg.exceptAll(pairsRowLocal).count() === 0)
  }

  test("the gate flags the planted near-dups and passes the rest") {
    val out = DocsStream.streamingNearDupGate(
      spark, sf(), "spec_neardup_gate2")
    val tot = out.agg(sum("n_stream"), sum("n_flagged"), sum("n_pass"))
      .head()
    assert(tot.getLong(0) === tot.getLong(1) + tot.getLong(2))
    assert(tot.getLong(1) > 0, "planted near-dups must be caught")
    assert(tot.getLong(2) > 0, "clean docs must pass")
  }
}
