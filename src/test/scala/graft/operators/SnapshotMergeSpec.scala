package graft.operators

import graft.SparkSpec
import graft.etl.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[MergeInto.mergeCommit]] — the copy-on-write MERGE write path over
  * the snapshot layer: partition-pruned rewrite, cross-partition row
  * moves, drained-partition drops, carried-by-reference untouched
  * partitions, atomic visibility under a concurrent reader, and
  * algebraic agreement with the plain [[MergeInto.merge]] resolve the
  * `merge_upsert` oracle already pins. */
class SnapshotMergeSpec extends SparkSpec {

  import spark.implicits._

  /** Base table: three month-partitions, two rows each. */
  private def baseRows: DataFrame = Seq(
    (1L, "2024-01", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 10.0),
    (2L, "2024-01", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
    (3L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), 30.0),
    (4L, "2024-02", java.sql.Timestamp.valueOf("2024-02-25 00:00:00"), 40.0),
    (5L, "2024-03", java.sql.Timestamp.valueOf("2024-03-07 00:00:00"), 50.0),
    (6L, "2024-03", java.sql.Timestamp.valueOf("2024-03-19 00:00:00"), 60.0))
    .toDF("id", "m", "ts", "price")

  /** Changeset: update id=3 IN PLACE (price 99), MOVE id=5 from
    * 2024-03 to 2024-01, DELETE id=6 (draining 2024-03 together with
    * the move), delete an absent key (no-op), and INSERT id=9 into
    * the untouched-by-updates month 2024-02. */
  private def changeRows: DataFrame = Seq(
    (3L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), 99.0, false),
    (5L, "2024-01", java.sql.Timestamp.valueOf("2024-01-09 00:00:00"), 55.0, false),
    (6L, "2024-03", java.sql.Timestamp.valueOf("2024-03-19 00:00:00"), 60.0, true),
    (7L, "2024-03", java.sql.Timestamp.valueOf("2024-03-30 00:00:00"), 0.0, true),
    (9L, "2024-02", java.sql.Timestamp.valueOf("2024-02-14 00:00:00"), 90.0, false))
    .toDF("id", "m", "ts", "price", "_del")

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_merge_$tag").toString

  private def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.select("id", "m", "price").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  private val expectedAfter = Set(
    (1L, "2024-01", 10.0), (2L, "2024-01", 20.0), (5L, "2024-01", 55.0),
    (3L, "2024-02", 99.0), (4L, "2024-02", 40.0), (9L, "2024-02", 90.0))

  test("mergeCommit applies updates, moves, deletes and inserts; the " +
      "result equals the plain merge() resolve over the full base") {
    val root = tmpRoot("alg")
    SnapshotStore.write(baseRows, root, "m", "ts")
    MergeInto.mergeCommit(spark, root, changeRows, "id", "_del", "m", "ts")
    assert(rows(SnapshotStore.read(spark, root)) === expectedAfter)
    // algebraic agreement with the oracle-pinned whole-table resolve
    assert(rows(MergeInto.merge(baseRows, changeRows, "id", "_del")) ===
      expectedAfter)
  }

  test("a partition the MERGE does not touch carries forward by " +
      "reference (same physical dir); a drained partition's entry is " +
      "DROPPED, not carried (deleted rows cannot resurface)") {
    val root = tmpRoot("prune")
    SnapshotStore.write(baseRows, root, "m", "ts")
    // changeset touching only 2024-01 (in-place update of id=1)
    val c1 = Seq((1L, "2024-01",
      java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 11.0, false))
      .toDF("id", "m", "ts", "price", "_del")
    val febBefore = SnapshotStore.current(root).get
      .entries.find(_.value == "2024-02").get.dir
    MergeInto.mergeCommit(spark, root, c1, "id", "_del", "m", "ts")
    val m2 = SnapshotStore.current(root).get
    assert(m2.entries.find(_.value == "2024-02").get.dir === febBefore)
    assert(!m2.entries.find(_.value == "2024-01").get.dir
      .startsWith("data/snap-1/"),
      "touched partition was carried instead of restated")

    // drain 2024-03 entirely: move id=5 out, delete id=6
    MergeInto.mergeCommit(spark, root,
      changeRows.filter(col("id").isin(5L, 6L)), "id", "_del", "m", "ts")
    val m3 = SnapshotStore.current(root).get
    assert(m3.entries.forall(_.value != "2024-03"),
      s"drained partition still listed: ${m3.entries}")
    assert(rows(SnapshotStore.read(spark, root)) === Set(
      (1L, "2024-01", 11.0), (2L, "2024-01", 20.0), (5L, "2024-01", 55.0),
      (3L, "2024-02", 30.0), (4L, "2024-02", 40.0)))
  }

  test("a changeset matching nothing and inserting nothing is a no-op: " +
      "the snapshot id does not advance") {
    val root = tmpRoot("noop")
    val id1 = SnapshotStore.write(baseRows, root, "m", "ts")
    val noop = Seq((42L, "2024-09",
      java.sql.Timestamp.valueOf("2024-09-01 00:00:00"), 0.0, true))
      .toDF("id", "m", "ts", "price", "_del")
    assert(MergeInto.mergeCommit(spark, root, noop, "id", "_del", "m", "ts")
      === id1)
    assert(SnapshotStore.current(root).get.id === id1)
  }

  test("the pre-merge snapshot remains time-travelable: the moved and " +
      "deleted rows are intact AS OF the base commit") {
    val root = tmpRoot("tt")
    val id1 = SnapshotStore.write(baseRows, root, "m", "ts")
    MergeInto.mergeCommit(spark, root, changeRows, "id", "_del", "m", "ts")
    assert(rows(SnapshotStore.read(spark, root, asOf = Some(id1))) ===
      rows(baseRows))
  }

  test("a reader concurrent with a stream of MERGE commits sees only " +
      "whole committed states — never a mix, never an error") {
    val root = tmpRoot("conc")
    SnapshotStore.write(baseRows, root, "m", "ts")
    // commit k updates id=3's price to 100k: total price sum moves
    // through a known sequence, any other total is a torn read
    val nMerges = 6
    val baseSum = 210.0
    val valid = (0 to nMerges).map(k =>
      if (k == 0) baseSum else baseSum - 30.0 + 100.0 * k).toSet
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get() && bad.get() == null) {
        try {
          val s = SnapshotStore.read(spark, root)
            .agg(sum("price")).collect()(0).getDouble(0)
          if (!valid(s)) bad.set(s"torn state observed: sum=$s")
        } catch {
          case e: Throwable => bad.set(s"reader threw: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try (1 to nMerges).foreach { k =>
      val c = Seq((3L, "2024-02",
        java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), 100.0 * k, false))
        .toDF("id", "m", "ts", "price", "_del")
      MergeInto.mergeCommit(spark, root, c, "id", "_del", "m", "ts")
    } finally { stop.set(true); reader.join(60000) }
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(SnapshotStore.read(spark, root)
      .agg(sum("price")).collect()(0).getDouble(0) ===
      baseSum - 30.0 + 100.0 * nMerges)
  }

  test("graft.merge.materialize=reliable swaps the changeset pin to a " +
      "replicated persist and produces the identical result") {
    val root = tmpRoot("reliable")
    SnapshotStore.write(baseRows, root, "m", "ts")
    spark.conf.set("graft.merge.materialize", "reliable")
    try {
      MergeInto.mergeCommit(spark, root, changeRows, "id", "_del",
        "m", "ts")
    } finally spark.conf.unset("graft.merge.materialize")
    assert(rows(SnapshotStore.read(spark, root)) === expectedAfter)
  }
}
