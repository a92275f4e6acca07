package graft.operators

import graft.SparkSpec

/** Decontamination on a hand corpus with a planted overlap. */
class DecontaminationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely unrelated text about sailing ships at dawn"),
    (3L, "short doc")).toDF("doc_id", "text")
  private lazy val eval = Seq(
    // shares the 5-gram "quick brown fox jumps over" with train doc 1
    (100L, "a quick brown fox jumps over everything it sees"))
    .toDF("doc_id", "text")

  test("source overlap matrix counts distinct shared n-grams per pair") {
    val docs = Seq(
      ("s1", "alpha beta gamma delta epsilon zeta"),
      ("s2", "alpha beta gamma delta epsilon other"), // shares 2 5-grams? no: 1
      ("s2", "alpha beta gamma delta epsilon zeta"), // duplicate of s1 doc
      ("s3", "nothing in common with anyone here at all"),
    ).toDF("source", "text")
    val m = Decontamination.sourceOverlapMatrix(docs, "source", "text",
      n = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // s1 grams: {a b g d e, b g d e z}; s2 grams: both docs' grams =
    // {a b g d e, b g d e o, b g d e z} -> distinct shared = 2
    assert(m === Map(("s1", "s2") -> 2L))
  }

  test("flags exactly the training doc sharing a 5-gram with eval") {
    val flagged = Decontamination.flagOverlaps(train, eval,
      "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet === Set(1L))
    assert(flagged(1L) >= 1L)
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val clean = Decontamination.decontaminate(train, eval,
      "doc_id", "text", n = 5)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(2L, 3L))
    assert(clean.columns.toSeq === train.columns.toSeq) // schema untouched
  }

  test("no overlap flags nothing") {
    val flagged = Decontamination.flagOverlaps(train,
      Seq((200L, "zero ngram intersection with anything here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", n = 5)
    assert(flagged.count() === 0)
  }

  test("bloom pre-screen returns exactly the exact-join flags") {
    val exact = Decontamination.flagOverlaps(train, eval,
      "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Decontamination.flagOverlapsBloom(train, eval,
      "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom === exact)
    assert(bloom.keySet === Set(1L)) // no false negatives on the plant
  }

  test("bloom pre-screen on real docs equals exact on sf0.001") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text")
    val evalSide = docs.filter($"doc_id" % 10 === 0)
    val trainSide = docs.filter($"doc_id" % 10 =!= 0)
    val exact = Decontamination.flagOverlaps(trainSide, evalSide,
      "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Decontamination.flagOverlapsBloom(trainSide, evalSide,
      "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom === exact)
  }

  test("bloom filter predicate prunes non-overlapping n-grams") {
    // a bloom built from ONE n-gram must reject essentially all of a
    // disjoint set (fpp at 2^23 bits over 1 item is ~0)
    val bf = Decontamination.evalNgramBloom(eval, "doc_id", "text", n = 5)
    assert(bf.length > 0)
  }
}
