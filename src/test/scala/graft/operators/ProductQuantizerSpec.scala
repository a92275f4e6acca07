package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ProductQuantizer: code-range/coverage invariants, determinism, the
  * ADC distance cross-checked against an independent reconstruction,
  * and recall against the exact L2 baseline on real embeddings. */
class ProductQuantizerSpec extends SparkSpec {

  private val M = 16
  private val K = 64
  private val D = 4

  private lazy val emb = Tables.embeddings(spark, sf())
  private lazy val cb = ProductQuantizer.trainCodebooks(
    emb, "vec_id", "embedding", m = M, k = K, subDim = D)
  private lazy val codes = ProductQuantizer.encode(
    emb, "vec_id", "embedding", cb, m = M, subDim = D)

  test("every vector gets exactly one in-range code per subspace") {
    val n = emb.count()
    assert(codes.count() == n * M)
    assert(codes.groupBy("vec_id", "m").count()
      .filter(col("count") =!= 1).count() == 0L)
    assert(codes.filter(col("code") < 0 || col("code") >= K)
      .count() == 0L)
    assert(codes.filter(col("m") < 0 || col("m") >= M).count() == 0L)
  }

  test("training and encoding are deterministic") {
    val cb2 = ProductQuantizer.trainCodebooks(
      emb, "vec_id", "embedding", m = M, k = K, subDim = D)
    assert(cb.exceptAll(cb2).count() == 0L &&
      cb2.exceptAll(cb).count() == 0L)
  }

  test("ADC distance equals an independent reconstruction") {
    val probes = emb.filter(col("vec_id") < 3)
    val got = ProductQuantizer.adcTopK(codes, cb, probes,
      "vec_id", "embedding", subDim = D, k = 5)
    // Independent path: reassemble each probe's micro subvector rows
    // and each candidate's ASSIGNED codebook rows, then sum squared
    // diffs directly — no distance table, no per-(m) pre-aggregation.
    val psub = probes.select(col("vec_id").as("probe_id"),
      posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("probe_id"), (col("dim") / D).cast("int").as("m"),
        (col("dim") % D).cast("int").as("j"),
        floor(col("v").cast("double") * 1000000L).cast("long").as("pm"))
    val candCb = codes.select(col("vec_id").as("cand_id"), col("m"),
      col("code").cast("int").as("g")).join(cb, Seq("m", "g"))
    val direct = psub.join(candCb, Seq("m", "j"))
      .filter(col("cand_id") =!= col("probe_id"))
      .groupBy("probe_id", "cand_id")
      .agg(sum((col("pm") - col("cm")) * (col("pm") - col("cm")))
        .as("ddist"))
    val joined = got.join(direct, Seq("probe_id", "cand_id"))
    assert(joined.count() == got.count())
    assert(joined.filter(col("adist") =!= col("ddist")).count() == 0L)
  }

  test("IVF-PQ prunes to the probed cells and prices identically") {
    val probes = emb.filter(col("vec_id") < 3)
    val ivf = IvfIndex.build(spark, emb, "vec_id", "embedding", k = 8)
    val got = ProductQuantizer.searchIvfPq(codes, cb,
      ivf.assigned.select("vec_id", "cell"), ivf.centroids, probes,
      "vec_id", "embedding", subDim = D, k = 5, nProbe = 2)
    val full = ProductQuantizer.adcTopK(codes, cb, probes,
      "vec_id", "embedding", subDim = D, k = emb.count().toInt)
    // every pruned result carries the SAME price as the full ADC pass,
    // and only candidates from the probed cells appear
    val j = got.join(full.withColumnRenamed("adist", "full_adist")
      .drop("rk"), Seq("probe_id", "cand_id"))
    assert(j.count() == got.count())
    assert(j.filter(col("adist") =!= col("full_adist")).count() == 0L)
    assert(got.groupBy("probe_id").count()
      .filter(col("count") > 5).count() == 0L)
    // pruning is real: some full-ADC top candidate set differs from the
    // pruned one only via cell membership — verify every returned cand
    // is in a probed cell
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cdist").asc, col("cell").asc)
    import graft.functions.{VectorFunctions => VF}
    val probeCells = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("pv"))
      .crossJoin(broadcast(ivf.centroids))
      .withColumn("cdist", VF.l2DistanceSq(col("pv"), col("centroid")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= 2).select("probe_id", "cell")
    val outside = got
      .join(ivf.assigned.select(col("vec_id").as("cand_id"),
        col("cell")), Seq("cand_id"))
      .join(probeCells, Seq("probe_id", "cell"), "left_anti")
    assert(outside.count() == 0L)
  }

  test("recall@10 beats random against the exact L2 baseline") {
    import graft.functions.{VectorFunctions => VF}
    val probes = emb.filter(col("vec_id") < 5)
    val got = ProductQuantizer.adcTopK(codes, cb, probes,
      "vec_id", "embedding", subDim = D, k = 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("dist").asc, col("cand_id").asc)
    val exact = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("pv"))
      .crossJoin(emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv")))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("dist", VF.l2DistanceSq(col("pv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("probe_id", "cand_id")
    val hits = got.select("probe_id", "cand_id")
      .intersect(exact).count()
    val total = exact.count()
    // Measured 0.58 on this synthetic (cluster-free) corpus — pin well
    // above chance (10/500 = 0.02) with slack for data regeneration.
    assert(hits.toDouble / total >= 0.3,
      s"recall@10 ${hits.toDouble / total} < 0.3")
  }

  test("m=1 is whole-vector KMeans: Lloyd's separates planted clusters") {
    import spark.implicits._
    // two tight planted clusters around (0,0,0,0) and (10,10,10,10):
    // whatever the md5 init scatters, two Lloyd iterations must land
    // every vector with its own cluster — and centroids on the means
    val vecs = ((0L until 12L).map(i =>
      (i, Array(0.01 * i, 0.01 * i, 0.0, 0.0))) ++
      (12L until 24L).map(i =>
        (i, Array(10.0 + 0.01 * i, 10.0, 10.0, 0.01 * i))))
      .toDF("vec_id", "embedding")
    val cbk = ProductQuantizer.trainCodebooks(vecs, "vec_id", "embedding",
      m = 1, k = 2, subDim = 4, lloydIters = 3, salt = "km")
    val assign = ProductQuantizer.encode(vecs, "vec_id", "embedding",
      cbk, m = 1, subDim = 4)
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loCodes = (0L until 12L).map(assign).toSet
    val hiCodes = (12L until 24L).map(assign).toSet
    assert(loCodes.size === 1 && hiCodes.size === 1 && loCodes != hiCodes,
      s"lo=$loCodes hi=$hiCodes")
    // centroid components are the exact integer-micro floor-div means
    val cmap = cbk.collect().map(r => (r.getAs[Int]("g"),
      r.getAs[Int]("j")) -> r.getAs[Long]("cm")).toMap
    val loG = loCodes.head.toInt
    val expected = (0 until 4).map { j =>
      val vals = (0L until 12L).map(i =>
        math.floor(Array(0.01 * i, 0.01 * i, 0.0, 0.0)(j) * 1e6).toLong)
      Math.floorDiv(vals.sum, vals.length.toLong)
    }
    (0 until 4).foreach(j => assert(cmap((loG, j)) === expected(j), s"j=$j"))
  }

  test("shared train-once codebook is identical to a direct retrain " +
      "(the pq_encode/ann_pq/ann_recall lanes may share safely)") {
    // training is deterministic (md5 init, exact integer arithmetic),
    // so the driver-side cache behind the lane family must reproduce
    // trainCodebooks bit for bit — this is what lets the DuckDB
    // oracles keep replaying the FULL training chain against lanes
    // that only paid for it once.
    val direct = ProductQuantizer.trainCodebooks(
      emb, "vec_id", "embedding", m = 16, k = 64, subDim = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    val viaLane1 = graft.queries.PipelineQueries.pqEncode(spark, sf())
    val viaLane2 = graft.queries.PipelineQueries.annPq(spark, sf())
    assert(viaLane1.count() > 0 && viaLane2.count() > 0)
    val cached = graft.queries.PipelineQueries
      .sharedPqCodebookForTest(spark, sf())
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(cached === direct)
  }

  test("kmeans_train lane: sizes cover the corpus, 64 components each") {
    val rows = graft.queries.PipelineQueries.kmeansTrain(spark, sf())
      .collect()
    val n = emb.count()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, rs) =>
      assert(rs.length === 64, s"cluster $c has ${rs.length} components")
      assert(rs.map(_.getAs[Long]("n_members")).distinct.length === 1)
    }
    assert(byCluster.map(_._2.head.getAs[Long]("n_members")).sum === n)
  }
}
