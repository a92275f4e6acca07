package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing: chunk placement arithmetic, next-fit invariants,
  * determinism under layout changes, and the oversized-document edge. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    // (id, tokens) — mixed sizes incl. one oversized (> budget 100)
    (1L, 40L), (2L, 50L), (3L, 30L), (4L, 130L), (5L, 10L),
    (6L, 99L), (7L, 1L), (8L, 60L), (9L, 0L), (10L, 100L),
  ).toDF("id", "tok")

  test("lengthBucketBatches: every doc batched once, batches bounded, " +
    "padding beats random batching") {
    val got = Packing.lengthBucketBatches(docs, "id", col("tok"),
      binWidth = 32L, batchSize = 3)
    assert(got.agg(sum(col("n_docs"))).head().getLong(0) == 10L)
    assert(got.filter(col("n_docs") > 3).count() == 0L)
    // padding identity per batch
    assert(got.filter(
      col("padding") =!= col("n_docs") * col("max_len") - col("sum_len"))
      .count() == 0L)
    val bucketedWaste = got.agg(sum(col("padding"))).head().getLong(0)
    // control: batch in id order, ignoring length — same batch size
    val wId = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    val naive = docs
      .withColumn("rn", row_number().over(wId).cast("long"))
      .withColumn("batch_id", ((col("rn") - 1) / 3).cast("long"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n"), max(col("tok")).as("mx"),
        sum(col("tok")).as("sm"))
      .agg(sum(col("n") * col("mx") - col("sm"))).head().getLong(0)
    assert(bucketedWaste <= naive,
      s"bucketed $bucketedWaste > naive $naive")
    // length buckets are honest: a doc's len sits in its bucket's bin
    val flat = Packing.lengthBucketBatches(docs, "id", col("tok"),
      binWidth = 1000L, batchSize = 100)
    assert(flat.count() == 1L) // one bucket, one batch at these bounds
  }

  test("chunkPack: per-shard token intervals tile without gaps") {
    val out = Packing.chunkPack(docs, "id", "tok", budget = 100,
      shards = 2).collect()
    // within a shard, sorted by start_tok, each doc starts where the
    // previous ended; offsets and seq ids agree with the arithmetic
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      sorted.foldLeft(0L) { (expectStart, r) =>
        val (start, firstSeq, lastSeq, off, splits) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))
        assert(start === expectStart)
        assert(firstSeq === start / 100)
        assert(off === start % 100)
        assert(splits === lastSeq - firstSeq)
        val tok = docs.filter(col("id") === r.getLong(0))
          .head().getLong(1)
        if (tok > 0) assert(lastSeq === (start + tok - 1) / 100)
        start + tok
      }
    }
  }

  test("nextFitPack: sequences never overflow except oversized singletons") {
    val out = Packing.nextFitPack(docs, "id", "tok", budget = 100,
      shards = 2)
    val toks = docs.withColumnRenamed("id", "jid")
    val fills = out.join(toks, col("id") === col("jid"))
      .groupBy("shard", "seq_id")
      .agg(sum("tok").as("fill"), count(lit(1)).as("n"))
      .collect()
    fills.foreach { r =>
      val (fill, n) = (r.getLong(2), r.getLong(3))
      assert(fill <= 100 || n === 1,
        s"overfull multi-doc sequence: $r")
    }
    // seq ids are contiguous from 0 within each shard
    fills.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val seqs = rows.map(_.getLong(1)).sorted
      assert(seqs === (0L until seqs.size).toArray.toSeq)
    }
  }

  test("nextFitPack matches a driver-side replay of the same fold") {
    val out = Packing.nextFitPack(docs, "id", "tok", budget = 100,
      shards = 2).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replay: same md5 order key, same next-fit recurrence
    val keyed = docs.select(col("id"), col("tok"),
        Packing.orderKey(col("id"), "pack").as("ord"))
      .withColumn("shard", Packing.shardOf(col("ord"), 2))
      .collect().map(r => (r.getLong(3), r.getString(2), r.getLong(0),
        r.getLong(1)))
    keyed.groupBy(_._1).foreach { case (shard, rows) =>
      var (seq, fill) = (0L, 0L)
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, id, tok) =>
        if (fill > 0 && fill + tok > 100) { seq += 1; fill = 0 }
        fill += tok
        assert(out(id) === (shard, seq), s"doc $id")
      }
    }
  }

  test("packing is invariant to the input partition layout") {
    val base = Packing.nextFitPack(docs, "id", "tok", 100, 2)
      .collect().toSet
    val shuffled = Packing.nextFitPack(
      docs.repartition(7, col("tok")), "id", "tok", 100, 2)
      .collect().toSet
    assert(base === shuffled)
    val chunkBase = Packing.chunkPack(docs, "id", "tok", 100, 2)
      .collect().toSet
    val chunkShuffled = Packing.chunkPack(
      docs.repartition(7, col("tok")), "id", "tok", 100, 2)
      .collect().toSet
    assert(chunkBase === chunkShuffled)
  }

  test("packReport: fill rate accounts every token exactly once") {
    val packed = Packing.nextFitPack(docs, "id", "tok", 100, 2)
    val report = Packing.packReport(packed, docs, "id", "tok", 100)
      .collect()
    val totalTokens = report.map(_.getLong(3)).sum
    assert(totalTokens === docs.agg(sum("tok")).head().getLong(0))
    report.foreach { r =>
      val (nSeqs, nTokens, fillRate) =
        (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(fillRate === nTokens.toDouble / (nSeqs * 100L).toDouble)
    }
  }

  test("slidingChunks windows with overlap; trailing windows shrink") {
    import spark.implicits._
    // 10 tokens, size 8, stride 4 → windows at 1 (8 toks), 5 (6), 9 (2)
    val d = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, ""))
      .toDF("id", "text")
    val out = Packing.slidingChunks(d, "id", "text",
      chunkSize = 8, stride = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 8L), (1L, 6L), (2L, 2L)))
  }

  test("slidingChunks with stride == size tiles exactly, no overlap") {
    import spark.implicits._
    val d = Seq((1L, (1 to 12).map(i => s"w$i").mkString(" ")))
      .toDF("id", "text")
    val out = Packing.slidingChunks(d, "id", "text",
      chunkSize = 4, stride = 4).collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(2)).sum === 12L) // every token exactly once
  }
}
