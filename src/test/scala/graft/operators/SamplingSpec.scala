package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Deterministic sampling: layout-independence, nesting, split
  * disjointness, stratified rates. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  test("leakageSafeSplit keeps every group whole across the cut") {
    import spark.implicits._
    // groups chosen so ROW-keyed hashing would split some of them:
    // members of each group get ids that hash to different sides
    val df = (1L to 400L).map(id => (id, id % 50)).toDF("id", "grp")
    val split = Sampling.leakageSafeSplit(df, "grp",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(split.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") =!= 1).count() == 0L)
    // exhaustive + all three names present at 50 groups
    assert(split.filter(col("split").isNull).count() == 0L)
    val names = split.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(names.subsetOf(Set("train", "val", "test")) && names.size >= 2)
    // row-keyed hashing DOES split some group (the leak this exists
    // to prevent): reuse the same hash on the row id
    val rowKeyed = Sampling.leakageSafeSplit(df, "id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(rowKeyed.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() > 0L)
  }

  test("leakageSafeSplit validates fractions") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(df, "grp", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(df, "grp", Seq(("a", 0.5), ("a", 0.5)))
    }
  }

  test("sample is identical across runs and partition layouts") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("samples nest: 10% is a subset of 30% under the same salt") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("different salts give (near-)independent samples") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3, salt = "x")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.3, salt = "y")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }

  test("split is disjoint, exhaustive, and roughly proportioned") {
    val n = docs.count()
    val counts = Sampling.split(docs, "doc_id",
      Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "eval", "test"))
    assert(counts.values.sum === n)
    assert(counts("train") > counts("eval") * 4)
  }

  test("group quota keeps exactly n best rows per group, map-side pruned") {
    import org.apache.spark.sql.functions.{col, lit}
    val quota = Sampling.groupQuota(docs, Seq("lang", "source"),
      Seq(col("doc_id").asc), n = 3)
    val sizes = quota.groupBy("lang", "source").count()
      .collect().map(_.getLong(2))
    assert(sizes.nonEmpty && sizes.forall(_ <= 3))
    // kept rows are the n smallest doc_ids of each group
    val perGroup = docs.groupBy("lang", "source")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("min_id"))
    val joined = quota.join(perGroup, Seq("lang", "source"))
      .filter(col("doc_id") === col("min_id"))
    assert(joined.count() === perGroup.count()) // every group's min kept
    // the rank filter must compile to map-side WindowGroupLimit
    val plan = quota.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter not pushed to WindowGroupLimit:\n$plan")
  }

  test("weighted quota favors heavy rows, deterministically") {
    import org.apache.spark.sql.functions.{col, lit, when}
    import spark.implicits._
    // one group, 200 rows: ids 0..99 weight 1, ids 100..199 weight 50
    val df = spark.range(200).select(lit("g").as("g"), col("id"),
      when(col("id") >= 100, 50.0).otherwise(1.0).as("w"))
    val pick = Sampling.weightedQuota(df, "id", "w", Seq("g"), n = 20,
      salt = "t")
    val picked = pick.collect().map(_.getLong(1)).toSet
    assert(picked.size === 20)
    // expectation: heavy rows dominate the sample (P(heavy) ~ 50/51
    // per slot); 15+ of 20 heavy is a loose, deterministic bound
    assert(picked.count(_ >= 100) >= 15)
    // same data + salt -> identical selection under any layout
    val again = Sampling.weightedQuota(df.repartition(7), "id", "w",
      Seq("g"), n = 20, salt = "t").collect().map(_.getLong(1)).toSet
    assert(again === picked)
    // zero/negative weights can never be sampled
    val withZero = df.union(Seq(("g", 500L, 0.0), ("g", 501L, -1.0))
      .toDF("g", "id", "w"))
    val p2 = Sampling.weightedQuota(withZero, "id", "w", Seq("g"),
      n = 200, salt = "t").collect().map(_.getLong(1)).toSet
    assert(!p2.contains(500L) && !p2.contains(501L))
  }

  test("null keys are deterministically assigned, not dropped or lumped") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val withNulls = (Seq[Option[Long]](None) ++ (1L to 99L).map(Some(_)))
      .toDF("k")
    // the null-keyed row participates in splits like any other row
    val splits = Sampling.split(withNulls, "k",
      Seq("a" -> 0.5, "b" -> 0.5))
    assert(splits.count() === 100)
    val nullSplit = splits.filter(col("k").isNull)
      .head().getAs[String]("split")
    // and lands in a hash-determined split, stably across runs
    val again = Sampling.split(withNulls.repartition(7), "k",
      Seq("a" -> 0.5, "b" -> 0.5))
      .filter(col("k").isNull).head().getAs[String]("split")
    assert(nullSplit === again)
  }

  test("mixture composition hits token budgets within doc-length slack") {
    import org.apache.spark.sql.functions.{col, length}
    val withToks = docs.withColumn("n_toks", length(col("text")))
    val budgets = Map("en" -> 30000L, "es" -> 10000L)
    val out = Sampling.composeMixture(withToks, "doc_id", "lang",
      "n_toks", budgets)
    val realized = out.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // zero-budget strata are dropped entirely
    assert(realized.keySet.subsetOf(budgets.keySet))
    // realized totals near the budget (hash sampling of whole docs:
    // generous 50% slack at this tiny scale)
    budgets.foreach { case (lang, b) =>
      assert(realized(lang) > b / 2 && realized(lang) < b * 3 / 2,
        s"$lang: realized ${realized(lang)} vs budget $b")
    }
    // deterministic under repartition
    val again = Sampling.composeMixture(withToks.repartition(13),
      "doc_id", "lang", "n_toks", budgets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("stratified rates apply per stratum") {
    val perLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), default = 0.0)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1.0 keeps every en doc; rate 0.0 drops every other stratum
    assert(got === Map("en" -> perLang("en")))
  }

  private lazy val docsWithToks = docs.withColumn("n_toks",
    graft.functions.TextFunctions.tokenCount(col("text")))

  test("temperatureMixture: budget >= corpus keeps everything") {
    val total = docsWithToks.agg(sum("n_toks")).head().getLong(0)
    val kept = Sampling.temperatureMixture(docsWithToks, "doc_id", "lang",
      "n_toks", alpha = 0.5, totalBudget = total * 2)
    assert(kept.count() === docs.count())
  }

  test("temperatureMixture flattens the language distribution") {
    val natural = docsWithToks.groupBy("lang").agg(sum("n_toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalNat = natural.values.sum.toDouble
    val kept = Sampling.temperatureMixture(docsWithToks, "doc_id", "lang",
      "n_toks", alpha = 0.25, totalBudget = totalNat.toLong / 4,
      salt = "tm")
      .groupBy("lang").agg(sum("n_toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalKept = kept.values.sum.toDouble
    val head = natural.maxBy(_._2)._1
    val tail = natural.minBy(_._2)._1
    // α < 1 shifts share away from the head language toward the tail
    assert(kept(head) / totalKept < natural(head) / totalNat)
    assert(kept(tail) / totalKept > natural(tail) / totalNat)
  }

  test("temperatureMixture is layout-independent") {
    val a = Sampling.temperatureMixture(docsWithToks, "doc_id", "lang",
      "n_toks", alpha = 0.5, totalBudget = 3000L, salt = "tm")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMixture(docsWithToks.repartition(13),
      "doc_id", "lang", "n_toks", alpha = 0.5, totalBudget = 3000L,
      salt = "tm")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
  }
}
