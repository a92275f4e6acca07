package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-path operators: salting, IVF, bucketed co-located joins. */
class ScaleOpsSpec extends SparkSpec {

  test("salted aggregation equals the direct group-by") {
    val li = Tables.lineitem(spark, sf())
    val salted = SkewTools.saltedCountSum(li, "l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === direct)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val big = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"))
      .toDF("k", "v")
    val small = Seq((1L, "dim1"), (2L, "dim2"), (3L, "dim3"))
      .toDF("sk", "dim")
    val (bigS, smallS, cond) = SkewTools.saltedJoinSides(
      big, small, "k", "sk", saltBuckets = 4)
    val salted = bigS.join(smallS, cond)
      .select("k", "v", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "v", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("IVF search: deterministic, positive recall, exact cosines") {
    val emb = Tables.embeddings(spark, sf())
    val probes = emb.filter(col("vec_id") < 3)
    val index = IvfIndex.build(spark, emb, "vec_id", "embedding", k = 8)
    assert(index.centroids.count() === 8)
    assert(index.assigned.count() === emb.count())
    val res = IvfIndex.search(index, probes, "vec_id", "embedding",
      k = 5, nProbe = 3)
    val res2 = IvfIndex.search(index, probes, "vec_id", "embedding",
      k = 5, nProbe = 3)
    assert(res.collect().toSet === res2.collect().toSet) // deterministic
    // every returned cosine matches the brute-force value for that pair
    val brute = SimilaritySearch.bruteForceTopK(
      emb, probes, "vec_id", "embedding", k = 100)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Double]("cos")).toMap
    res.collect().foreach { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))
      brute.get(key).foreach(c => assert(c === r.getAs[Double]("cos")))
    }
    assert(res.count() > 0)
  }

  test("IVF build stays columnar (no RDD scan) and the persisted index " +
      "round-trips with identical search results") {
    val emb = Tables.embeddings(spark, sf())
    val probes = emb.filter(col("vec_id") < 3)
    val index = IvfIndex.build(spark, emb, "vec_id", "embedding", k = 8)
    // declarative conversion: the assigned plan must read parquet via
    // the columnar scan, with no RDD-boundary (ExistingRDD/Scan rdd)
    val assignedPlan = index.assigned.queryExecution.executedPlan.toString
    assert(!assignedPlan.contains("ExistingRDD"),
      s"RDD hop in IVF build:\n$assignedPlan")
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.write(index, dir)
    val reloaded = IvfIndex.read(spark, dir)
    // cell is a partition dir in the persisted layout
    assert(new java.io.File(s"$dir/assigned").listFiles()
      .exists(_.getName.startsWith("cell=")))
    val a = IvfIndex.search(index, probes, "vec_id", "embedding",
      k = 5, nProbe = 3).collect().toSet
    val b = IvfIndex.search(reloaded, probes, "vec_id", "embedding",
      k = 5, nProbe = 3).collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("bucketed tables join without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    val li = Tables.lineitem(spark, sf())
      .select("l_orderkey", "l_quantity")
    val or = Tables.orders(spark, sf())
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS or_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    or.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/or_b").mode("overwrite").saveAsTable("or_b")
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("or_b"),
        col("l_orderkey") === col("o_orderkey"))
    joined.queryExecution.toRdd.foreach(_ => ())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() === li.count()) // every lineitem has an order
  }
}
