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
}
