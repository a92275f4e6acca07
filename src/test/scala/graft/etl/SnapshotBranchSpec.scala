package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Branches + write-audit-publish ([[SnapshotStore.branch]] /
  * [[SnapshotStore.appendToBranch]] / [[SnapshotStore.resetBranch]] /
  * [[SnapshotStore.fastForward]]): staged commits are invisible to
  * main readers (no chain slot — the main resolution path is
  * structurally unable to see them), the publish is one ordinary
  * conflict-checked chain commit, and retention pins branch heads. */
class SnapshotBranchSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_branch_$tag").toString

  private def base() = Seq(
    (1L, "2024-01", 10.0), (2L, "2024-01", 20.0),
    (3L, "2024-02", 30.0), (4L, "2024-02", 40.0))
    .toDF("id", "m", "price")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("id")).as[Long].collect().toSet

  test("the WAP loop: bad commits die on the branch, main readers " +
      "never see the intermediate state, fast-forward publishes " +
      "exactly the validated head") {
    val root = mkRoot("wap")
    SnapshotStore.write(base(), root, "m", "id")
    val ref = SnapshotStore.branch(root, "audit")
    assert(ref.fork === 1L)
    // WRITE (bad): negative price sentinel
    SnapshotStore.appendToBranch(
      Seq((100L, "2024-02", -1.0)).toDF("id", "m", "price"), root, "audit")
    // main is untouched; the branch sees the staged rows
    assert(ids(SnapshotStore.read(spark, root)) === Set(1L, 2L, 3L, 4L))
    assert(ids(SnapshotStore.readBranch(spark, root, "audit"))
      === Set(1L, 2L, 3L, 4L, 100L))
    // the DSV2 reader's branch option sees the same staged state
    assert(ids(spark.read.format("graft-snapshot")
      .option("branch", "audit").load(root)) ===
      Set(1L, 2L, 3L, 4L, 100L))
    // AUDIT fails → reset the branch to its fork
    assert(SnapshotStore.readBranch(spark, root, "audit")
      .filter(col("price") < 0).count() === 1L)
    SnapshotStore.resetBranch(root, "audit", toId = ref.id)
    assert(ids(SnapshotStore.readBranch(spark, root, "audit"))
      === Set(1L, 2L, 3L, 4L))
    // WRITE (good) → AUDIT passes → PUBLISH
    SnapshotStore.appendToBranch(
      Seq((5L, "2024-03", 50.0)).toDF("id", "m", "price"), root, "audit")
    val seqBefore = SnapshotStore.currentSeq(root)
    val pubId = SnapshotStore.fastForward(root, "audit")
    assert(SnapshotStore.currentSeq(root) === seqBefore + 1)
    assert(ids(SnapshotStore.read(spark, root)) ===
      Set(1L, 2L, 3L, 4L, 5L))
    // the publish is ONE ordinary chain commit: the feed over it
    // emits exactly the staged rows, never the abandoned bad ones
    val feed = SnapshotStore.changeFeed(spark, root, seqBefore,
      seqBefore + 1)
    assert(feed.select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((5L, "insert")))
    // the branch re-forked at the published head: the next WAP cycle
    // continues on the same name
    val ref2 = SnapshotStore.branches(root)("audit")
    assert(ref2.id === pubId && ref2.fork === seqBefore + 1)
  }

  test("fastForward refuses when main advanced since the fork — the " +
      "lost update a silent merge would cause") {
    val root = mkRoot("race")
    SnapshotStore.write(base(), root, "m", "id")
    SnapshotStore.branch(root, "audit")
    SnapshotStore.appendToBranch(
      Seq((5L, "2024-03", 50.0)).toDF("id", "m", "price"), root, "audit")
    // main advances underneath
    SnapshotStore.appendPartitions(
      Seq((6L, "2024-03", 60.0)).toDF("id", "m", "price"), root, "m", "id")
    val e = intercept[IllegalArgumentException](
      SnapshotStore.fastForward(root, "audit"))
    assert(e.getMessage.contains("main advanced"))
    // main keeps its own state; the branch keeps the staged one
    assert(ids(SnapshotStore.read(spark, root)) ===
      Set(1L, 2L, 3L, 4L, 6L))
    assert(ids(SnapshotStore.readBranch(spark, root, "audit")) ===
      Set(1L, 2L, 3L, 4L, 5L))
  }

  test("retention pins the branch head (manifest + dirs); a dropped " +
      "branch's staging ages out") {
    val root = mkRoot("pin")
    SnapshotStore.write(base(), root, "m", "id")
    SnapshotStore.branch(root, "audit")
    SnapshotStore.appendToBranch(
      Seq((5L, "2024-03", 50.0)).toDF("id", "m", "price"), root, "audit")
    // churn main past the retention window
    SnapshotStore.appendPartitions(
      Seq((7L, "2024-04", 70.0)).toDF("id", "m", "price"), root, "m", "id")
    SnapshotStore.appendPartitions(
      Seq((8L, "2024-04", 80.0)).toDF("id", "m", "price"), root, "m", "id")
    SnapshotStore.expire(root, keepLast = 1)
    assert(ids(SnapshotStore.readBranch(spark, root, "audit")) ===
      Set(1L, 2L, 3L, 4L, 5L),
      "the branch head must survive retention")
    // drop the branch; the staged snap dir is now unreferenced
    val stagedDir = SnapshotStore.branchManifest(root, "audit").entries
      .map(_.dir).find(_.contains("2024-03")).get
    assert(SnapshotStore.dropBranch(root, "audit"))
    SnapshotStore.expire(root, keepLast = 1)
    assert(!new java.io.File(
      s"$root/${stagedDir.split("/").take(2).mkString("/")}").exists(),
      "a dropped branch's staged data ages out with the next expire")
    intercept[IllegalArgumentException](
      SnapshotStore.readBranch(spark, root, "audit"))
  }

  test("SQL surface: CALL system.branch / fast_forward / drop_branch; " +
      "re-branching a live name refuses") {
    val wh = mkRoot("sqlwh")
    val root = s"$wh/t"
    SnapshotStore.write(base(), root, "m", "id")
    spark.conf.set("spark.sql.catalog.br",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.br.warehouse", wh)
    spark.sql("CALL br.system.branch('t', 'audit')")
    intercept[Exception](SnapshotStore.branch(root, "audit"))
    SnapshotStore.appendToBranch(
      Seq((5L, "2024-03", 50.0)).toDF("id", "m", "price"), root, "audit")
    spark.sql("CALL br.system.fast_forward('t', 'audit')")
    assert(ids(SnapshotStore.read(spark, root)) ===
      Set(1L, 2L, 3L, 4L, 5L))
    assert(spark.sql("CALL br.system.drop_branch('t', 'audit')")
      .head().getLong(0) === 1L)
    assert(SnapshotStore.branches(root).isEmpty)
  }
}
