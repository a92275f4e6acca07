package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"), // near dup of 1
      (4L, "completely different content about database engines and query planners"),
      (5L, "spark catalyst optimizer rewrites logical plans into physical plans"),
    ).toDF("doc_id", "text")
  }

  test("exactDedup groups identical normalized content") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    assert(out.count() === 4) // 5 docs, one exact pair
    val dup = out.filter(col("dup_cnt") === 2).head()
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("minhash LSH finds exact and near duplicates, not distinct docs") {
    val pairs = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("portable minhash finds the planted dups, like the xxhash64 path") {
    val pairs = Dedup.minhashPairsPortable(docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("portable minhash base hash matches the cross-engine definition") {
    // DuckDB: CAST(concat('0x', substring(md5('hello world'), 1, 15))
    //   AS BIGINT) = 426544247714475757 — the 60-bit md5-prefix trick
    // must produce the identical value on the Spark side.
    import spark.implicits._
    val h = Seq("hello world").toDF("s")
      .select(expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"))
      .head().getLong(0)
    assert(h === 426544247714475757L)
  }

  test("portable minhash is layout-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashPairsPortable(df, "doc_id", "text")
        .collect().map(_.toSeq).toSet
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("portable simhash: identical equal, near close, distinct far, empty zero") {
    import spark.implicits._
    val withEmpty = docs.union(Seq((6L, "   ")).toDF("doc_id", "text"))
    val sh = Dedup.simhashPortable(withEmpty, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) === sh(2L))
    assert(ham(sh(1L), sh(3L)) <= 12)
    assert(ham(sh(1L), sh(4L)) > 12)
    assert(ham(sh(1L), sh(5L)) > 12)
    assert(sh(6L) === 0L)
    // 60-bit hash: bits 60..63 never set
    assert(sh.values.forall(v => (v >>> 60) === 0L))
  }

  test("portable minhash rejects a band count that does not divide k") {
    intercept[IllegalArgumentException] {
      Dedup.minhashPairsPortable(docs, "doc_id", "text", k = 32, bands = 5)
    }
  }

  test("exact-dup pair has jaccard 1.0") {
    val j = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .head().getAs[Double]("jaccard")
    assert(j === 1.0)
  }

  test("simhash: identical docs equal, near-dups close, distinct far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
    assert(sh(1L) !== sh(4L))
  }

  test("simhashPairs blocks and filters by hamming") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngramJaccardPairs computes exact jaccard within blocks") {
    import spark.implicits._
    val blocked = docs.withColumn("grp", lit("g"))
    val out = Dedup.ngramJaccardPairs(blocked, "doc_id", "text", n = 3,
      threshold = 0.5, blockCols = Seq("grp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = out.find(p => p._1 == 1L && p._2 == 2L).get
    assert(exact._3 === 1.0)
    // near-dup pair differs in the last of 14 tokens: 12 shingles each,
    // 11 shared → union 13 → j = 11/13 ≈ 0.8462 (rounded to 4dp)
    val near = out.find(p => p._1 == 1L && p._2 == 3L).get
    assert(near._3 === 0.8462)
  }

  test("embeddingNearDup finds the planted close pair only") {
    import spark.implicits._
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(0.999f, 0.01f, 0.0f)),
      (3L, 0, Array(0.0f, 1.0f, 0.0f)),
      (4L, 1, Array(1.0f, 0.0f, 0.0f)), // other block: never paired with 1
    ).toDF("vec_id", "label", "embedding")
    val out = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.9, blockCols = Seq("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L)))
  }

  test("embeddingNearDup fails loudly on a hot block instead of going quadratic") {
    import spark.implicits._
    val emb = (1L to 10L).map(i => (i, 0, Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDup(emb, "vec_id", "embedding",
        threshold = 0.9, blockCols = Seq("label"), maxBlockRows = 5L)
    }
    assert(e.getMessage.contains("quadratic") &&
      e.getMessage.contains("hyperplaneBucketsPortable"))
    // under the limit the same corpus computes normally
    assert(Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.9, blockCols = Seq("label"), maxBlockRows = 10L)
      .count() === 45L)
  }

  test("semanticDedup blocks by ASSIGNED cluster and keeps min id per component") {
    import spark.implicits._
    // Label-0 prototype ≈ x-axis, label-1 prototype ≈ y-axis. Vector 4
    // is LABELED 1 but sits on the x-axis: label-blocking would never
    // compare it with 1/2; assignment-blocking routes it to cluster 0
    // and catches the duplicate.
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.999f, 0.01f)), // near-dup of 1, same label
      (3L, 1, Array(0.0f, 1.0f)),
      (4L, 1, Array(0.998f, 0.02f)), // near-dup of 1/2, WRONG label
      (5L, 1, Array(0.01f, 0.999f)), // near-dup of 3, same label
    ).toDF("vec_id", "label", "embedding")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", "label",
      threshold = 0.9)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // 4 is assigned to cluster 0 despite label 1, and folds into 1's
    // component; the label-blocked operator cannot produce this
    assert(out(4L) === ((0L, 1L, false)))
    assert(out(1L) === ((0L, 1L, true)))  // min id survives
    assert(out(2L) === ((0L, 1L, false)))
    assert(out(3L)._3 === true && out(5L)._3 === false) // y-axis pair
    assert(out.values.count(_._3) === 2) // one survivor per component
    // label-blocking misses the cross-label pair — the contrast that
    // motivates the operator
    val labelBlocked = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.9, blockCols = Seq("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!labelBlocked.contains((1L, 4L)))
  }

  test("semanticDedup hot cluster degrades to star+LSH instead of refusing") {
    import spark.implicits._
    // cluster 0 (x-axis) gets SIX members — over maxClusterRows=5, so
    // the quadratic guard would refuse the naive path: three exact
    // copies of v1, two exact copies of a distinct-but-near vector,
    // and one far-but-same-cluster vector. Cluster 1 (y-axis) stays
    // small and takes the exact path.
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(1.0f, 0.0f)),      // exact copy of 1 → star pair
      (3L, 0, Array(1.0f, 0.0f)),      // exact copy of 1 → star pair
      (4L, 0, Array(0.995f, 0.09f)),   // distinct near-dup of 1 (cos≈0.995)
      (5L, 0, Array(0.995f, 0.09f)),   // exact copy of 4 → star pair
      (6L, 0, Array(0.4f, 0.3f)),      // same cluster, cos(1,6)=0.8 < 0.9
      (7L, 1, Array(0.0f, 1.0f)),
      (8L, 1, Array(0.01f, 0.999f)),   // small-cluster near-dup of 7
    ).toDF("vec_id", "label", "embedding")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", "label",
      threshold = 0.9, maxClusterRows = 5L)
      .collect().map(r => (r.getLong(0),
        (r.getLong(2), r.getBoolean(3)))).toMap
    // exact copies fold to their min-id representative via star pairs
    assert(out(2L) === ((1L, false)) && out(3L) === ((1L, false)))
    // the two distinct reps (v1, v4) pair in the LSH-bucketed residue
    // (identical direction up to cos 0.995 → same hyperplane bucket)
    assert(out(4L) === ((1L, false)) && out(5L) === ((1L, false)))
    assert(out(1L) === ((1L, true)))
    // far vector stays its own component despite sharing the cluster
    assert(out(6L) === ((6L, true)))
    // the small cluster still runs the exact path
    assert(out(7L) === ((7L, true)) && out(8L) === ((7L, false)))
  }

  test("semanticDedup hotClusterApprox=false restores the strict refusal") {
    import spark.implicits._
    // same hot-cluster fixture as the degrade test — with the opt-out
    // the over-limit cluster must refuse loudly, never silently
    // downgrade an exactness-dependent caller to the star+LSH tier
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f)),
      (3L, 0, Array(1.0f, 0.0f)), (4L, 0, Array(0.995f, 0.09f)),
      (5L, 0, Array(0.995f, 0.09f)), (6L, 0, Array(0.4f, 0.3f)),
    ).toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "vec_id", "embedding", "label",
        threshold = 0.9, maxClusterRows = 5L,
        hotClusterApprox = false).count()
    }
    assert(e.getMessage.contains("hotClusterApprox"))
    assert(e.getMessage.contains("maxClusterRows"))
  }

  test("semanticDedup hot-path residue guard still fails loudly") {
    import spark.implicits._
    // 6 DISTINCT near-identical vectors (one hot cluster, no exact
    // duplicates to collapse; all are x-dominant so every ±1
    // hyperplane scores them by sign(w_x) — one LSH bucket whatever
    // the planes): the residue quadratic exceeds maxClusterRows=5 and
    // must refuse, not burn
    val emb = (1 to 6).map(i =>
      (i.toLong, 0, Array(1.0f, i * 0.001f))).toDF("vec_id", "label",
      "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "vec_id", "embedding", "label",
        threshold = 0.9, maxClusterRows = 5L).count()
    }
    assert(e.getMessage.contains("quadratic"))
  }

  test("incrementalDedup drops exact, near, and within-batch dups") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "b", "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "b", "spark catalyst optimizer rewrites logical plans into physical plans"),
    ).toDF("doc_id", "blk", "text")
    val batch = Seq(
      (10L, "b", "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of corpus 1 → dropped (a)
      (11L, "b", "the quick brown fox jumps over the lazy dog near the river bank tomorrow"), // near dup of corpus 1 (j ≈ 0.85) → dropped (b)
      (12L, "b", "completely different content about database engines and query planners"),
      (13L, "b", "completely different content about database engines and query planners"), // batch dup of 12 → dropped (c)
      (14L, "b", ""), // tokenless: skips the near stage, kept
    ).toDF("doc_id", "blk", "text")
    val kept = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
      n = 3, threshold = 0.6, blockCols = Seq("blk"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(12L, 14L))
  }

  test("incrementalDedup near stage respects blocks") {
    import spark.implicits._
    val corpus = Seq((1L, "x",
      "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "blk", "text")
    // same near-dup text but in another block → not compared, kept
    val batch = Seq((10L, "y",
      "the quick brown fox jumps over the lazy dog near the river bank tomorrow"))
      .toDF("doc_id", "blk", "text")
    val kept = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
      n = 3, threshold = 0.6, blockCols = Seq("blk"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L))
  }
}
