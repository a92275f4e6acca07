package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded export: manifest/write agreement, one file per shard,
  * within-file training order, and determinism across layouts. */
class ShardedExportSpec extends SparkSpec {

  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, s"doc text $i", i % 7 + 1))
    .toDF("doc_id", "text", "n_toks")

  test("manifest partitions every doc exactly once") {
    val m = ShardedExport.manifest(docs, "doc_id", "n_toks", shards = 4)
      .collect()
    assert(m.map(_.getLong(1)).sum === 200L)
    assert(m.map(_.getLong(2)).sum ===
      docs.agg(sum("n_toks")).head().getLong(0))
    assert(m.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    // key ranges are consistent: first_key <= last_key, hex format
    m.foreach { r =>
      assert(r.getString(3) <= r.getString(4))
      assert(r.getString(3).matches("[0-9a-f]{32}"))
    }
  }

  test("write: one sorted file per shard, roundtrip preserves all rows") {
    val dir = Files.createTempDirectory("graft_export").toString
    ShardedExport.write(docs, "doc_id", dir, shards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 200L)
    assert(back.select("doc_id").distinct().count() === 200L)
    // one data file per shard directory
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$dir/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $s")
    }
    // within-file order is the order key (training order): re-derive
    // the key over each shard file in read order; it must be sorted
    (0 until 4).foreach { s =>
      val keys = spark.read.parquet(s"$dir/shard=$s")
        .select(Packing.orderKey(col("doc_id"), "export"))
        .collect().map(_.getString(0))
      assert(keys.toSeq === keys.sorted.toSeq, s"shard $s order")
    }
  }

  test("manifest is invariant to input partition layout") {
    val a = ShardedExport.manifest(docs, "doc_id", "n_toks", 4)
      .collect().toSet
    val b = ShardedExport.manifest(docs.repartition(13), "doc_id",
      "n_toks", 4).collect().toSet
    assert(a === b)
  }
}
