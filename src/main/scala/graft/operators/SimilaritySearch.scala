package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *   - [[bruteForceTopK]] — exact cosine top-k via broadcast of the
  *     probe set against the full corpus: the correctness baseline, and
  *     at 100 TB still the right shape when |probes| is small (probes
  *     broadcast; the corpus scan is embarrassingly parallel, one pass,
  *     no shuffle until the tiny per-probe top-k combine).
  *   - [[lshTopK]] — random-hyperplane LSH bucketing: corpus and probes
  *     hash to `planes`-bit buckets ([[VF.hyperplaneBucket]]); candidates
  *     are bucket-mates re-ranked exactly. Trades recall for touching
  *     only ~1/2^planes of the corpus per probe; bucket id is the
  *     shuffle/cluster key at scale (an IVF analogue with hash-derived,
  *     storable centroids).
  *
  * Ranking is on cosine rounded to 4dp with id tie-break, so results are
  * deterministic and engine-independent (oracle-comparable).
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors for each probe (self-matches excluded).
    * Output: probe_id, rk (1..k), cand_id, cos. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("cand_id"))
      .withColumn("cos", round(VF.cosineSimilarity(col("pvec"), col("cvec")), 4))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("cos"))
  }

  /** Hard-negative mining for contrastive training: each probe's top-k
    * most-similar candidates with a DIFFERENT label — the confusable
    * negatives that actually move a contrastive loss (easy negatives
    * are free; hard ones need exactly this query). Same broadcast-probe
    * one-pass shape as [[bruteForceTopK]]; the label-mismatch predicate
    * rides the join so same-label pairs are never scored. */
  def hardNegativesTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"),
      col(labelCol).as("cand_label"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"),
      col(labelCol).as("probe_label"))
    val scored = c.join(broadcast(p),
        col("probe_id") =!= col("cand_id") &&
          col("probe_label") =!= col("cand_label"))
      .withColumn("cos",
        round(VF.cosineSimilarity(col("pvec"), col("cvec")), 4))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("probe_label"), col("rk"),
        col("cand_id"), col("cand_label"), col("cos"))
  }

  /** Int8 scalar-quantized top-k — the memory tier of the ANN ladder.
    *
    * Each vector is quantized independently: `scale = 127 / max|xᵢ|`,
    * `qᵢ = round(xᵢ · scale)` — int8 range, 4× smaller than float32
    * (~8× smaller than the double the exact path computes in), which at
    * 100 TB is the difference between an in-memory corpus scan and a
    * spilling one. Scoring ranks by the cosine of the QUANTIZED
    * vectors: `dot(qa,qb) / sqrt(‖qa‖²·‖qb‖²)` — all three terms are
    * exact 64-bit integers (|q| ≤ 127, so a 64-dim dot ≤ ~10⁶), and the
    * one floating division is the same IEEE operation in any engine, so
    * the result is deterministic and oracle-comparable, not
    * approximately-equal. Same broadcast-probe one-pass shape as
    * [[bruteForceTopK]]; recall loss comes only from quantization
    * (tight: per-coordinate error ≤ 0.5/scale).
    *
    * Output: probe_id, rk (1..k), cand_id, qcos. */
  def quantizedTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    def quantized(df: DataFrame, id: String, q: String): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      val maxAbs = aggregate(v, lit(0.0),
        (acc, x) => greatest(acc, abs(x)))
      val scale = lit(127.0) / greatest(maxAbs, lit(1e-30))
      df.select(col(idCol).as(id),
        transform(v, x => round(x * scale).cast("long")).as(q))
    }
    def dot(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    def norm2(a: String) =
      aggregate(col(a), lit(0L), (acc, x) => acc + x * x)
    val c = quantized(corpus, "cand_id", "qc")
    val p = quantized(probes, "probe_id", "qp")
    val scored = c.join(broadcast(p), col("probe_id") =!= col("cand_id"))
      .withColumn("_dot", dot("qp", "qc"))
      .withColumn("_n2", norm2("qp") * norm2("qc"))
      .withColumn("qcos", when(col("_n2") === 0L, lit(0.0))
        .otherwise(round(col("_dot") / sqrt(col("_n2").cast("double")), 4)))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("qcos").desc, col("cand_id").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("qcos"))
  }

  /** Multi-table LSH ANN: `tables` independent hyperplane families of
    * `planes` bits each; a candidate is any corpus vector sharing the
    * probe's bucket in ANY table (union), exact-cosine re-ranked. More
    * tables → higher recall, more candidates touched — the classic
    * recall/cost dial. At scale the (table, bucket) pair is the shuffle
    * key and the probe side broadcasts. Probes whose buckets are empty
    * in every table return fewer than k rows. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4, tables: Int = 8): DataFrame = {
    def indexed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(VF.lshTableBuckets(col(vecCol), planes, tables)).as("tb"))
        .select(col(id), col(vec), col("tb.tbl").as("tbl"),
          col("tb.bkt").as("bkt"))
    val cands = indexed(corpus, "cand_id", "cvec")
      .join(broadcast(indexed(probes, "probe_id", "pvec")), Seq("tbl", "bkt"))
      .filter(col("probe_id") =!= col("cand_id"))
      .dropDuplicates("probe_id", "cand_id")
    val scored = cands.withColumn("cos",
      round(VF.cosineSimilarity(col("pvec"), col("cvec")), 4))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("cos"))
  }

  /** Fixed ±1 hyperplane set for [[hyperplaneBucketsPortable]]:
    * deterministic (seeded LCG), shared between the Spark plan and the
    * generated oracle SQL — both sides inline the SAME literals, which
    * is what makes the bucketing replayable. */
  def portablePlanes(nPlanes: Int, dim: Int,
      seed: Long = 42L): Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
  }

  /** Hyperplane-LSH bucket assignment under the oracle gate (the
    * rows-only `ann_lsh` lane proves recall; this proves the BUCKETING
    * MECHANICS value for value): embeddings are quantized to exact
    * integers (×10⁴ — a float times 10⁴ can never land on an exact .5,
    * so round() agrees in every engine), hyperplane weights are ±1
    * literals, and each bucket bit is the sign of an exact integer dot
    * product. No floating comparison anywhere past the quantize.
    *
    * Shape: corpus × broadcast(planes) — a constant fan-out of
    * |planes|, like the band explode in MinHash — then one groupBy id
    * to assemble bucket bits. The bucket id is the shuffle/cluster key
    * the ANN index stores at 100 TB. */
  def hyperplaneBucketsPortable(vecs: DataFrame, idCol: String,
      vecCol: String, planes: Seq[Seq[Long]]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val planesDf = planes.zipWithIndex.map { case (w, p) => (p, w) }
      .toDF("p", "w")
    val q = vecs.select(col(idCol),
      transform(col(vecCol), x => round(x.cast("double") * 10000)
        .cast("long")).as("q"))
    q.crossJoin(broadcast(planesDf))
      .withColumn("dot", aggregate(
        zip_with(col("q"), col("w"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .groupBy(col(idCol))
      .agg(sum(when(col("dot") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(0L))
        .as("bucket"))
  }
}
