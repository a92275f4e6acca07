package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Blocked edit-distance linkage: planted typos, lossless blocking vs
  * the naive cross join, and the blocking precondition. */
class FuzzyJoinSpec extends SparkSpec {

  test("planted typos link to the right canonical row with ties by id") {
    import spark.implicits._
    val base = Seq((1L, "widget"), (2L, "gadget"), (3L, "widget"))
      .toDF("id", "name")
    val probe = Seq(
      (10L, "widgt"), // drop       → widget (dist 1), tie → id 1
      (11L, "gadgetx"), // suffix   → gadget (dist 1)
      (12L, "completely different")) // no match within 2
      .toDF("id", "name")
    val got = FuzzyJoin.bestMatch(probe, "id", "name",
      base, "id", "name", maxDist = 2, blockWidth = 4)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("base_id"), r.getAs[Long]("dist"))).toMap
    assert(got === Map(10L -> (1L, 1L), 11L -> (2L, 1L)))
  }

  test("blocking is lossless: equals the naive cross join on real names") {
    val p = Tables.part(spark, sf())
    val m = pmod(col("p_partkey"), lit(3))
    val corrupted =
      when(m === 0, concat(substring(col("p_name"), 1, 1),
        substring(col("p_name"), 3, 1000)))
        .when(m === 1, concat(substring(col("p_name"), 2, 1),
          substring(col("p_name"), 1, 1), substring(col("p_name"), 3, 1000)))
        .otherwise(concat(col("p_name"), lit("x")))
    val probe = p.select(col("p_partkey").as("qid"), corrupted.as("qname"))
    val blocked = FuzzyJoin.bestMatch(probe, "qid", "qname",
      p, "p_partkey", "p_name", maxDist = 2, blockWidth = 4)
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val cand = probe.crossJoin(
        p.select(col("p_partkey").as("base_id"), col("p_name").as("base_name")))
        .withColumn("dist", levenshtein(col("qname"), col("base_name")))
        .filter(col("dist") <= 2)
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("dist").asc, col("base_id").asc)
      cand.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("qid").as("probe_id"), col("qname").as("q"),
          col("base_id"), col("base_name"),
          col("dist").cast("long").as("dist"))
    }
    assert(blocked.exceptAll(naive).isEmpty && naive.exceptAll(blocked).isEmpty)
    assert(blocked.count() === probe.count()) // every corruption links back
  }

  test("segment blocking equals length blocking and the naive join") {
    val p = Tables.part(spark, sf())
    val m = pmod(col("p_partkey"), lit(3))
    val corrupted =
      when(m === 0, concat(substring(col("p_name"), 1, 1),
        substring(col("p_name"), 3, 1000)))
        .when(m === 1, concat(substring(col("p_name"), 2, 1),
          substring(col("p_name"), 1, 1), substring(col("p_name"), 3, 1000)))
        .otherwise(concat(col("p_name"), lit("x")))
    val probe = p.select(col("p_partkey").as("qid"), corrupted.as("qname"))
    val seg = FuzzyJoin.bestMatchSegmented(probe, "qid", "qname",
      p, "p_partkey", "p_name", maxDist = 2)
    val len = FuzzyJoin.bestMatch(probe, "qid", "qname",
      p, "p_partkey", "p_name", maxDist = 2, blockWidth = 4)
    assert(seg.exceptAll(len).isEmpty && len.exceptAll(seg).isEmpty)
    assert(seg.count() === probe.count())
  }

  test("segment blocking survives adversarial edit placements") {
    import spark.implicits._
    val base = Seq((1L, "abcdefghij"), (2L, "qrstuvwxyz")).toDF("id", "name")
    val probe = Seq(
      (10L, "Xbcdefghij"), // sub at segment 0
      (11L, "abcdXfghij"), // sub at segment 1 (middle)
      (12L, "abcdefghiX"), // sub at segment 2 (end)
      (13L, "bcdefghij"), // delete first char (everything shifts left)
      (14L, "abcdefghijXY"), // two appends
      (15L, "XbYdeZghij"), // three scattered subs — NO match at k=2
      (16L, "aXbcdeYfghij")) // two inserts in different segments
      .toDF("id", "name")
    val got = FuzzyJoin.bestMatchSegmented(probe, "id", "name",
      base, "id", "name", maxDist = 2)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("base_id"), r.getAs[Long]("dist"))).toMap
    assert(got === Map(10L -> (1L, 1L), 11L -> (1L, 1L), 12L -> (1L, 1L),
      13L -> (1L, 1L), 14L -> (1L, 2L), 16L -> (1L, 2L)))
  }

  test("blockWidth must exceed maxDist (losslessness precondition)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      FuzzyJoin.bestMatch(df, "id", "name", df, "id", "name",
        maxDist = 4, blockWidth = 4)
    }
  }
}
