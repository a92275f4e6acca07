package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {

  test("vector math: dot, norm, cosine") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
    val r = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("dot"),
      VectorFunctions.l2Norm(col("a")).as("na"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("cos"),
      VectorFunctions.l2DistanceSq(col("a"), col("b")).as("d2")).head()
    assert(r.getAs[Double]("dot") === 2.0)
    assert(r.getAs[Double]("na") === 3.0)
    assert(math.abs(r.getAs[Double]("cos") - 2.0 / (3.0 * 2.0)) < 1e-12)
    assert(r.getAs[Double]("d2") === (1.0 + 4.0 + 4.0))
  }

  test("zero vector cosine is 0, not NaN") {
    import spark.implicits._
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineSimilarity(col("a"), col("b")))
      .head().getDouble(0) === 0.0)
  }

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)),
      (4L, Array(0.7f, 0.7f)),
    ).toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks by cosine, excludes self, caps at k") {
    val out = SimilaritySearch.bruteForceTopK(
      corpus, corpus.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
      .orderBy("rk").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("cand_id")).toSeq === Seq(1L, 4L, 2L))
    assert(out.head.getAs[Double]("cos") > 0.99)
  }

  test("hardNegativesTopK never returns a same-label candidate") {
    val labeled = corpus.withColumn("label",
      when(col("vec_id") < 2, lit(0L)).otherwise(lit(1L)))
    val out = SimilaritySearch.hardNegativesTopK(
      labeled, labeled.filter(col("vec_id") === 0), "vec_id", "embedding",
      "label", k = 3).orderBy("rk").collect()
    // probe 0 (label 0): candidates are only vec_ids 2,3,4 (label 1),
    // ranked by cosine: 4 (0.7,0.7) > 2 (0,1) > 3 (-1,0)
    assert(out.map(_.getAs[Long]("cand_id")).toSeq === Seq(4L, 2L, 3L))
    assert(out.forall(_.getAs[Long]("cand_label") === 1L))
    assert(out.map(_.getAs[Long]("rk")).toSeq === Seq(1L, 2L, 3L))
  }

  test("lshTopK results are a subset of correct cosine ordering") {
    val out = SimilaritySearch.lshTopK(
      corpus, corpus.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, planes = 4).collect()
    // bucket-mates only; every returned cosine must match brute-force value
    val brute = SimilaritySearch.bruteForceTopK(
      corpus, corpus.filter(col("vec_id") === 0), "vec_id", "embedding", 4)
      .collect().map(r => r.getAs[Long]("cand_id") -> r.getAs[Double]("cos"))
      .toMap
    out.foreach { r =>
      assert(brute(r.getAs[Long]("cand_id")) === r.getAs[Double]("cos"))
    }
  }

  test("quantizedTopK: int8 bounds, determinism, and high recall vs exact") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(
      emb, probes, "vec_id", "embedding", k = 5).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("cand_id"))
    val quant = SimilaritySearch.quantizedTopK(
      emb, probes, "vec_id", "embedding", k = 5).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("cand_id"))
    // int8 quantization perturbs each coordinate by <= 0.5/scale, so
    // top-5 overlap with the exact ranking stays high
    val recall = exact.count(quant.toSet) / exact.length.toDouble
    assert(recall >= 0.8, s"recall@5 = $recall")
    // scores are integer-ratio exact -> a second run is identical
    val again = SimilaritySearch.quantizedTopK(
      emb, probes, "vec_id", "embedding", k = 5).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("cand_id"))
    assert(quant.toSeq === again.toSeq)
    // cosine of int vectors stays in [-1, 1]
    SimilaritySearch.quantizedTopK(emb, probes, "vec_id", "embedding", 5)
      .collect().foreach { r =>
        val c = r.getAs[Double]("qcos")
        assert(c >= -1.0 && c <= 1.0)
      }
  }

  test("native cosine expression is bit-identical to the HOF composition") {
    import spark.implicits._
    // pseudo-random float vectors, incl. negatives and a zero vector
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16) { d =>
        if (i == 49) 0.0f
        else (((i * 31 + d * 7) % 97) - 48).toFloat / 13.0f
      })
    }.toDF("vec_id", "embedding")
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
    val diff = pairs.select(
      VectorFunctions.cosineSimilarity(col("a.embedding"),
        col("b.embedding")).as("native"),
      VectorFunctions.cosineSimilarityHof(col("a.embedding"),
        col("b.embedding")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("portable hyperplane buckets: sign antisymmetry and determinism") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 0.8f - 0.4f)))
    // 40 vectors and their exact negations
    val df = (vecs ++ vecs.map { case (i, v) =>
      (i + 100L, v.map(x => -x)) }).toDF("vec_id", "embedding")
    val planes = SimilaritySearch.portablePlanes(8, 16)
    val out = SimilaritySearch
      .hyperplaneBucketsPortable(df, "vec_id", "embedding", planes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 80)
    assert(out.values.forall(b => b >= 0L && b < 256L))
    // with no zero dot products, negating the vector flips every sign
    // bit: bucket(−v) = 255 − bucket(v)
    vecs.foreach { case (i, _) =>
      assert(out(i + 100L) === 255L - out(i), s"vec $i")
    }
    // plane generation is deterministic
    assert(planes === SimilaritySearch.portablePlanes(8, 16))
  }

  test("hyperplaneBucket is deterministic and partitions the space") {
    import spark.implicits._
    val b = corpus.select(col("vec_id"),
      VectorFunctions.hyperplaneBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = corpus.select(col("vec_id"),
      VectorFunctions.hyperplaneBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b === b2)
    // antipodal vectors land in complementary buckets
    assert(b(0L) === (~b(3L) & 0xFF))
  }

  test("gated IVF lane: dense ranks, bounded cosines, descending per probe") {
    val rows = graft.queries.PipelineQueries.annIvfOracle(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byProbe.values.foreach { ps =>
      assert(ps.map(_._2).sorted.toSeq === (1L to 5L))
      val cos = ps.sortBy(_._2).map(_._3)
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }
}
