package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

class MinHashBandsSpec extends SparkSpec {
  import MinHashBandFunctions._

  /** Literal replay of the documented family. */
  private def replay(shingles: Seq[String], k: Int,
      bands: Int): Seq[Long] = {
    if (shingles.isEmpty) return Seq.empty
    val slots = Array.fill(k)(Long.MaxValue)
    shingles.foreach { s =>
      val h0 = XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 42L)
      (0 until k).foreach { i =>
        val h = XXH64.hashLong(h0, i.toLong)
        if (h < slots(i)) slots(i) = h
      }
    }
    val r = k / bands
    (0 until bands).map { b =>
      (0 until r).foldLeft(42L)((acc, i) =>
        XXH64.hashLong(slots(b * r + i), acc))
    }
  }

  test("minhash_bands matches the literal replay, eval and codegen") {
    import spark.implicits._
    val rows = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("x y z"),
      Seq.empty[String])
    val out = rows.toDF("sh")
      .select(col("sh"), minhashBands(col("sh"), 32, 8).as("bk"))
      .collect()
    out.foreach { r =>
      val sh = r.getSeq[String](0)
      assert(r.getSeq[Long](1) === replay(sh, 32, 8))
    }
    // null input stays null
    val n = Seq(Option.empty[Seq[String]]).toDF("sh")
      .select(minhashBands(col("sh"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("LSH semantics: near-dups collide, unrelated docs do not") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i tok${i + 1} tok${i + 2}")
    val nearDup = base.take(57) ++ Seq("alt x y", "alt y z", "alt z w")
    val unrelated = (1 to 60).map(i => s"other$i blah${i * 7} q$i")
    val df = Seq(("a", base), ("b", nearDup), ("c", unrelated))
      .toDF("id", "sh")
      .select(col("id"), posexplode(minhashBands(col("sh"), 64, 16))
        .as(Seq("band", "key")))
    val pairs = df.as("x").join(df.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("a", "b")), "95%-overlap docs must collide")
    assert(!pairs.exists(p => p._2 == "c" || p._1 == "c"),
      "disjoint shingle sets must not collide")
  }

  test("neardup_bands lane: planted corpus near-dups collide") {
    val r = graft.queries.PipelineQueries.neardupBands(spark, sf()).head()
    assert(r.getAs[Long]("n_buckets") > 0)
    assert(r.getAs[Long]("n_collision_buckets") > 0,
      "the corpus's planted near-dups must share at least one band")
    assert(r.getAs[Long]("n_colliding_docs") >=
      2 * r.getAs[Long]("n_collision_buckets"))
  }
}
