package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE semantics on a hand dataset: update wins wholesale, delete
  * removes, insert appends, orphan delete is a no-op, untouched rows
  * pass through byte-identical. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  test("merge applies update/delete/insert and ignores orphan deletes") {
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "v", "x")
    val changes = Seq(
      (2L, "B2", 99.0, false), // update
      (3L, "c", 30.0, true),   // delete
      (5L, "e", 50.0, false),  // insert
      (9L, "z", 0.0, true))    // orphan delete: no-op
      .toDF("k", "v", "x", "_delete")
    val got = MergeInto.merge(base, changes, "k", "_delete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got === Set(
      (1L, "a", 10.0), (2L, "B2", 99.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("change rows win wholesale: an explicit NULL overwrites") {
    val base = Seq((1L, Some("old"))).toDF("k", "v")
    val changes = Seq((1L, None: Option[String], false))
      .toDF("k", "v", "_delete")
    val got = MergeInto.merge(base, changes, "k", "_delete").collect()
    assert(got.length === 1 && got(0).isNullAt(1))
  }

  test("NULL-key change rows insert (never emit a base-side NULL ghost)") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq(
      (Option.empty[Long], "nullkey", false), // can never equi-match → insert
      (Option.empty[Long], "gone", true))     // null-key delete: no-op
      .toDF("k", "v", "_delete")
    val got = MergeInto.merge(base, changes, "k", "_delete")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
      .toSet
    assert(got === Set((Some(1L), "a"), (None, "nullkey")))
  }

  test("assertUniqueKeys rejects duplicate merge keys") {
    val base = Seq((1L, "a"), (1L, "a2")).toDF("k", "v")
    val changes = Seq((2L, "b", false)).toDF("k", "v", "_delete")
    val e = intercept[IllegalArgumentException] {
      MergeInto.merge(base, changes, "k", "_delete", assertUniqueKeys = true)
    }
    assert(e.getMessage.contains("duplicate merge key") ||
      e.getMessage.contains("duplicate key"))
    // and the happy path still resolves with the check on
    val ok = MergeInto.merge(Seq((1L, "a")).toDF("k", "v"), changes,
      "k", "_delete", assertUniqueKeys = true).collect()
    assert(ok.map(_.getString(1)).toSet === Set("a", "b"))
  }

  test("merge_upsert lane counts reconcile with base populations") {
    val d = sf()
    val base = graft.Tables.orders(spark, d)
    val n = base.count()
    val nDel = base.filter(col("o_orderkey") % 97 === 0).count()
    val nIns = base.filter(col("o_orderkey") % 10 === 7).count()
    val lane = graft.queries.RelationalQueries.qMergeUpsert(spark, d)
      .agg(sum("cnt")).head().getLong(0)
    assert(lane === n - nDel + nIns)
  }
}
