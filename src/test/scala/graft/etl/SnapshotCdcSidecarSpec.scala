package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Row-exact CDC sidecars for DML commits: a row-level UPDATE/DELETE or
  * MERGE persists its already-materialized changeset (pre/post images,
  * Delta CDF vocabulary) with the commit, and the change feed — batch
  * [[SnapshotStore.changeFeed]], the batch DSV2 face, and the streaming
  * CDF — emits exactly those rows instead of the wholesale restated
  * partitions. Compaction (a pure rewrite) emits nothing. */
class SnapshotCdcSidecarSpec extends SparkSpec {

  import spark.implicits._

  private def table(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id"),
      concat(lit("2024-0"), (col("id") % 3 + 1).cast("string")).as("m"),
      (col("id") % 100).cast("double").as("price"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cdc_$tag")
      .toString + "/t"

  private def feedRows(root: String, a: Long, b: Long)
      : Seq[(Long, String, Double, String)] =
    SnapshotStore.changeFeed(spark, root, a, b).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(r.fieldIndex("_change_type"))))

  test("row-level UPDATE of 3 rows in a 1000-row table: the feed emits " +
      "EXACTLY 6 rows — 3 update_preimage with old values, 3 " +
      "update_postimage with new — never the restated partitions") {
    val root = tmp("upd")
    SnapshotStore.write(table(1000), root, "m", "id")
    graft.operators.RowLevelOps.updateCommit(spark, root,
      col("id") % 333 === 7, Seq("price" -> (col("price") + lit(1000.0))),
      "m", "id")
    val feed = feedRows(root, 1, 2)
    assert(feed.size === 6, s"exactly 3 pre + 3 post, got: $feed")
    val pre = feed.filter(_._4 == "update_preimage")
    val post = feed.filter(_._4 == "update_postimage")
    assert(pre.map(_._1).sorted === Seq(7L, 340L, 673L))
    assert(post.map(_._1).sorted === Seq(7L, 340L, 673L))
    assert(pre.map(r => r._1 % 100 -> r._3).forall {
      case (k, p) => p == k.toDouble })
    assert(post.map(r => r._1 % 100 -> r._3).forall {
      case (k, p) => p == k.toDouble + 1000.0 })
  }

  test("row-level DELETE: the feed emits exactly the deleted rows " +
      "tagged delete; a DELETE that DRAINS a partition keeps its " +
      "sidecar through expire (the pin)") {
    val root = tmp("del")
    SnapshotStore.write(table(300), root, "m", "id")
    // drain partition 2024-02 entirely (ids ≡ 1 mod 3) via a
    // row-level predicate the partition drop cannot express syntactically
    graft.operators.RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 3 === 1 && col("price") >= 0.0, "m", "id")
    val feed = feedRows(root, 1, 2)
    assert(feed.size === 100)
    assert(feed.forall(_._4 == "delete"))
    assert(feed.forall(_._2 == "2024-02"))
    // the drained partition's snap dir holds the sidecar but is
    // referenced by NO entry — expire must pin it while the commit is
    // retained
    SnapshotStore.expire(root, keepLast = 10)
    val after = feedRows(root, 1, 2)
    assert(after.size === 100, "sidecar survived expire")
  }

  test("MERGE (flag form): delete/update/insert changesets emit " +
      "row-exactly — one delete image, pre+post for updates, the " +
      "inserted rows; untouched rows of restated partitions never " +
      "appear") {
    val root = tmp("merge")
    SnapshotStore.write(table(90), root, "m", "id")
    val changes = Seq(
      (3L, "2024-01", 0.0, true),    // delete id 3
      (7L, "2024-02", 777.0, false), // update id 7
      (900L, "2024-01", 9.0, false)  // insert id 900
    ).toDF("id", "m", "price", "_del")
    graft.operators.MergeInto.mergeCommit(spark, root, changes,
      key = "id", deleteFlag = "_del", partCol = "m", sortCol = "id")
    val feed = feedRows(root, 1, 2)
    assert(feed.toSet === Set(
      (3L, "2024-01", 3.0, "delete"),
      (7L, "2024-02", 7.0, "update_preimage"),
      (7L, "2024-02", 777.0, "update_postimage"),
      (900L, "2024-01", 9.0, "insert")),
      s"row-exact MERGE changeset, got: $feed")
  }

  test("clause-form MERGE: a matched row no clause claims emits " +
      "nothing; delete-only and insert-only clauses emit only their " +
      "rows") {
    val root = tmp("clauses")
    SnapshotStore.write(table(60), root, "m", "id")
    import graft.operators.MergeInto.{DelCol, InsCol, UpdCol}
    val changes = Seq(
      (6L, "2024-01", 0.0, true, false, false),   // delete
      (10L, "2024-02", 1.0, false, false, false), // matched, no clause
      (800L, "2024-03", 8.0, false, false, true)  // insert
    ).toDF("id", "m", "price", DelCol, UpdCol, InsCol)
    graft.operators.MergeInto.mergeClausesCommit(spark, root, changes,
      key = "id", partCol = "m", sortCol = "id")
    val feed = feedRows(root, 1, 2)
    assert(feed.toSet === Set(
      (6L, "2024-01", 6.0, "delete"),
      (800L, "2024-03", 8.0, "insert")))
  }

  test("compaction is a pure rewrite: its commit emits NOTHING through " +
      "the feed (empty sidecar = dataChange=false), and a multi-commit " +
      "range unions per-commit changes around it") {
    val root = tmp("compact")
    SnapshotStore.write(table(30), root, "m", "id")
    SnapshotStore.appendPartitions(
      Seq((500L, "2024-01", 5.0)).toDF("id", "m", "price"), root, "m", "id")
    SnapshotStore.compact(spark, root, "m", "id") // seq 3
    assert(feedRows(root, 2, 3).isEmpty,
      "compaction emits no change rows")
    // append (insert) + compaction (nothing) replayed per commit
    val range = feedRows(root, 1, 3)
    assert(range === Seq((500L, "2024-01", 5.0, "insert")))
  }

  test("batch DSV2 read with readChangeFeed=true (startingSeq / " +
      "endingSeq) matches SnapshotStore.changeFeed") {
    val root = tmp("batchdsv2")
    SnapshotStore.write(table(200), root, "m", "id")
    graft.operators.RowLevelOps.updateCommit(spark, root,
      col("id") === 42L, Seq("price" -> lit(4242.0)), "m", "id")
    val viaDsv2 = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingSeq", 1L).option("endingSeq", 2L)
      .load(root).collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(2),
        r.getString(r.fieldIndex("_change_type")))).toSet
    assert(viaDsv2 === Set(
      (42L, 42.0, "update_preimage"), (42L, 4242.0, "update_postimage")))
    // default range = (0, head]: per-commit bootstrap + the update
    val full = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(root)
    assert(full.count() === 200 + 2)
    assert(full.filter(col("_change_type") === "insert").count() === 200)
  }

  test("streaming CDF across a restart emits the DML sidecar rows " +
      "exactly once: drain, UPDATE, drain again — the second " +
      "incarnation sees ONLY the 2 change rows") {
    val root = tmp("stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cdc_stream_ck").toString
    SnapshotStore.write(table(100), root, "m", "id")
    def drainOnce(): Seq[(Long, Double, String)] = {
      val sink = scala.collection.mutable.ArrayBuffer[Row]()
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(root)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          sink.synchronized { sink ++= df.collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sink.toSeq.map(r => (r.getLong(0), r.getDouble(2),
        r.getString(r.fieldIndex("_change_type"))))
    }
    assert(drainOnce().size === 100) // bootstrap inserts
    graft.operators.RowLevelOps.updateCommit(spark, root,
      col("id") === 5L, Seq("price" -> lit(-1.0)), "m", "id")
    val second = drainOnce()
    assert(second.toSet === Set(
      (5L, 5.0, "update_preimage"), (5L, -1.0, "update_postimage")),
      s"row-exact across restart, got: $second")
    // third incarnation: nothing new
    assert(drainOnce().isEmpty)
  }

  test("SQL UPDATE through the statement rewriter carries the sidecar " +
      "too — the whole path from parser to feed is row-exact") {
    val root = tmp("sql")
    SnapshotStore.write(table(120), root, "m", "id")
    val wh = new java.io.File(root).getParent
    val name = new java.io.File(root).getName
    spark.conf.set("spark.sql.catalog.cdcspec",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdcspec.warehouse", wh)
    spark.sql(s"UPDATE cdcspec.`$name` SET price = price * 2.0 " +
      "WHERE id IN (11, 13)")
    val feed = feedRows(root, 1, 2)
    assert(feed.toSet === Set(
      (11L, "2024-03", 11.0, "update_preimage"),
      (11L, "2024-03", 22.0, "update_postimage"),
      (13L, "2024-02", 13.0, "update_preimage"),
      (13L, "2024-02", 26.0, "update_postimage")))
  }
}
