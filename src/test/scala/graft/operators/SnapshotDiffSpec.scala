package graft.operators

import graft.SparkSpec

/** Snapshot diffing on hand corpora: every status class, whitespace /
  * case changes that normalize away, and full-outer totality. */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private val prev = Seq(
    (1L, "stable document text"),
    (2L, "this one will change"),
    (3L, "this one disappears"),
    (4L, "Formatting   CHANGES only"),
  ).toDF("doc_id", "text")

  private val cur = Seq(
    (1L, "stable document text"),
    (2L, "this one has changed"),
    (4L, "formatting changes only"), // same after normalization
    (5L, "brand new document"),
  ).toDF("doc_id", "text")

  test("statuses: added, removed, changed, same (normalized)") {
    val got = SnapshotDiff.diff(prev, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      4L -> "same", 5L -> "added"))
  }

  test("summary counts partition every id exactly once") {
    val s = SnapshotDiff.summary(prev, cur, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s === Map("same" -> 2L, "changed" -> 1L, "removed" -> 1L,
      "added" -> 1L))
    assert(s.values.sum === 5L) // |prev ∪ cur| by id
  }
}
