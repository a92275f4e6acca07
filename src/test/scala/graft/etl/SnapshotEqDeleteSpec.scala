package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equality deletes ([[SnapshotStore.appendUpsert]] — Iceberg v2
  * equality deletes, the streaming-upsert commit shape): one O(batch)
  * commit appends the batch AND displaces every older row with the
  * batch's keys at read time. Pins displacement semantics, same-commit
  * immunity, stacking, era gating, DML refusal, folding via
  * rewriteDataFiles (with auto-prune of aged deletes), change-feed
  * net-correctness, retention, and idempotent re-delivery. */
class SnapshotEqDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def base(n: Int = 100): DataFrame =
    ((1 to n).map(i => (i.toLong, "2024-01",
      java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
      i * 1.0)) ++
      (1 to n).map(i => (100L + i, "2024-02",
        java.sql.Timestamp.valueOf(f"2024-02-${i % 28 + 1}%02d 00:00:00"),
        i * 2.0)))
      .toDF("id", "m", "ts", "price")

  private def batch(rows: (Long, String, String, Double)*): DataFrame =
    rows.map { case (id, m, ts, p) =>
      (id, m, java.sql.Timestamp.valueOf(ts), p)
    }.toDF("id", "m", "ts", "price")

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_eq_$tag").toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def register(root: String, cat: String): String = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      new java.io.File(root).getParent)
    s"$cat.`${new java.io.File(root).getName}`"
  }

  test("an upsert displaces older rows with its keys — 1:1 row count, " +
      "new values win, same-commit rows immune, era 3 stamped; Scala " +
      "and SQL (DSV2 rewrite) reads agree; time travel reads the " +
      "pre-upsert state") {
    val root = tmpRoot("disp")
    val id1 = SnapshotStore.write(base(), root, "m", "ts")
    val id2 = SnapshotStore.appendUpsert(
      batch((50L, "2024-01", "2024-01-05 00:00:00", -5.0),
        (150L, "2024-02", "2024-02-05 00:00:00", -15.0)),
      root, "m", "ts", keyCols = Seq("id"))
    val m = SnapshotStore.current(root).get
    assert(m.props.get(SnapshotStore.ReaderVersionProp) === Some("3"))
    assert(SnapshotStore.eqDeletesOf(m).map(_.rows) === Seq(2L))
    // THE ECONOMICS PIN: the upsert commit wrote only its own batch
    // (2 month parts + the _eqdel sidecar) — no prior partition was
    // read or restated, and the whole commit is KB-scale
    val snapDir = new java.io.File(s"$root/data/snap-$id2")
    val written = Option(snapDir.listFiles()).get.map(_.getName)
      .filterNot(n => n.contains("_SUCCESS")).toSet
    assert(written === Set("__part=2024-01", "__part=2024-02",
      SnapshotStore.EqDelDirName),
      s"an upsert commit must write only its batch, wrote: $written")
    assert(graft.util.Fs.du(snapDir) < 64 * 1024,
      "an upsert commit over a large table must stay KB-scale")
    assert(m.entries.count(_.dir.startsWith(s"data/snap-$id1/")) === 2,
      "prior entries must carry by reference")
    val r = SnapshotStore.read(spark, root)
    assert(r.count() === 200L, "each displaced key replaced 1:1")
    assert(r.filter(col("id") === 50L).select("price").head().getDouble(0)
      === -5.0)
    assert(r.filter(col("id") === 150L).select("price").head().getDouble(0)
      === -15.0)
    // SQL path goes through the resolved-read rewrite
    val t = register(root, "eqspec")
    assert(spark.sql(s"SELECT count(*) AS c FROM $t").head().getLong(0)
      === 200L)
    assert(spark.sql(
      s"SELECT price FROM $t WHERE id = 50").head().getDouble(0) === -5.0)
    // time travel: the pre-upsert snapshot is untouched
    val old = SnapshotStore.read(spark, root, asOf = Some(id1))
    assert(old.filter(col("id") === 50L).select("price").head()
      .getDouble(0) === 50.0)
  }

  test("upserts stack (the newest batch wins per key) and the batch " +
      "contract is enforced: duplicate keys and null keys refuse " +
      "loudly before any commit") {
    val root = tmpRoot("stack")
    SnapshotStore.write(base(), root, "m", "ts")
    SnapshotStore.appendUpsert(
      batch((50L, "2024-01", "2024-01-05 00:00:00", -5.0)),
      root, "m", "ts", Seq("id"))
    SnapshotStore.appendUpsert(
      batch((50L, "2024-01", "2024-01-06 00:00:00", -6.0)),
      root, "m", "ts", Seq("id"))
    val r = SnapshotStore.read(spark, root)
    assert(r.filter(col("id") === 50L).count() === 1L)
    assert(r.filter(col("id") === 50L).select("price").head().getDouble(0)
      === -6.0)
    val headId = SnapshotStore.current(root).get.id
    val dup = intercept[IllegalArgumentException] {
      SnapshotStore.appendUpsert(
        batch((7L, "2024-01", "2024-01-01 00:00:00", 1.0),
          (7L, "2024-01", "2024-01-02 00:00:00", 2.0)),
        root, "m", "ts", Seq("id"))
    }
    assert(dup.getMessage.contains("not key-unique"))
    val nul = intercept[IllegalArgumentException] {
      SnapshotStore.appendUpsert(
        Seq((Option.empty[Long], "2024-01",
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
          .toDF("id", "m", "ts", "price"),
        root, "m", "ts", Seq("id"))
    }
    assert(nul.getMessage.contains("NULL keys"))
    assert(SnapshotStore.current(root).get.id === headId,
      "a refused batch must not commit")
  }

  test("exactly-once: a re-delivered (writer, token) batch is a no-op") {
    val root = tmpRoot("once")
    SnapshotStore.write(base(), root, "m", "ts")
    val b = batch((50L, "2024-01", "2024-01-05 00:00:00", -5.0))
    val id2 = SnapshotStore.appendUpsert(b, root, "m", "ts", Seq("id"),
      idempotence = Some(("ckpt-a", "batch-0")))
    val id3 = SnapshotStore.appendUpsert(b, root, "m", "ts", Seq("id"),
      idempotence = Some(("ckpt-a", "batch-0")))
    assert(id3 === id2, "the retry must recognize the committed token")
    assert(SnapshotStore.read(spark, root).count() === 200L)
  }

  test("row-level DML refuses while equality deletes are live; " +
      "rewriteDataFiles folds them — reads byte-identical, props " +
      "auto-pruned, era lifted, DML unblocked") {
    val root = tmpRoot("fold")
    SnapshotStore.write(base(), root, "m", "ts")
    SnapshotStore.appendUpsert(
      batch((50L, "2024-01", "2024-01-05 00:00:00", -5.0),
        (150L, "2024-02", "2024-02-05 00:00:00", -15.0)),
      root, "m", "ts", Seq("id"))
    val refusal = intercept[IllegalArgumentException] {
      graft.operators.RowLevelOps.deleteRowsCommit(spark, root,
        col("id") === 60L, "m", "ts")
    }
    assert(refusal.getMessage.contains("equality deletes are live"))
    // dropping a live delete's KEY column would wedge every read —
    // the DDL must refuse it too
    val dropRefusal = intercept[IllegalArgumentException] {
      SnapshotStore.dropColumns(root, Seq("id"))
    }
    assert(dropRefusal.getMessage.contains("equality delete"))
    val before = sortedRows(SnapshotStore.read(spark, root))
    SnapshotStore.rewriteDataFiles(spark, root)
    val m = SnapshotStore.current(root).get
    assert(SnapshotStore.eqDeletesOf(m).isEmpty,
      "folding every pre-delete entry must auto-prune the delete")
    assert(!m.props.contains(SnapshotStore.ReaderVersionProp))
    assert(sortedRows(SnapshotStore.read(spark, root)) === before)
    // DML unblocked and correct post-fold
    graft.operators.RowLevelOps.deleteRowsCommit(spark, root,
      col("id") === 60L, "m", "ts")
    assert(SnapshotStore.read(spark, root).count() === 199L)
  }

  test("the change feed across an upsert commit is net-correct: " +
      "retract-then-upsert replay from the pre-upsert state lands on " +
      "the post-upsert table exactly") {
    val root = tmpRoot("cdc")
    SnapshotStore.write(base(), root, "m", "ts")
    val seqA = SnapshotStore.history(root).last.seq
    SnapshotStore.appendUpsert(
      batch((50L, "2024-01", "2024-01-05 00:00:00", -5.0),
        (150L, "2024-02", "2024-02-05 00:00:00", -15.0)),
      root, "m", "ts", Seq("id"))
    val seqB = SnapshotStore.history(root).last.seq
    val feed = SnapshotStore.changeFeed(spark, root, seqA, seqB)
    val dels = feed.filter(col("_change_type") === "delete")
      .drop("_change_type")
    val ins = feed.filter(col("_change_type") === "insert")
      .drop("_change_type")
    assert(SnapshotStore.changeFeed(spark, root, seqA, seqA).count()
      === 0L, "empty range must emit nothing")
    // multiset replay: A − deletes + inserts == B
    def multiset(xs: Seq[String]): Map[String, Int] =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    val mA = multiset(sortedRows(
      readAt(root, seqA)))
    val mDel = multiset(sortedRows(dels))
    val mIns = multiset(sortedRows(ins))
    val mB = multiset(sortedRows(SnapshotStore.read(spark, root)))
    val net = (mA.keySet ++ mDel.keySet ++ mIns.keySet).map { k =>
      k -> (mA.getOrElse(k, 0) - mDel.getOrElse(k, 0) +
        mIns.getOrElse(k, 0))
    }.filter(_._2 != 0).toMap
    assert(net === mB.filter(_._2 != 0),
      "retract-then-upsert replay must land on the post-upsert state")
  }

  private def readAt(root: String, seq: Long): DataFrame = {
    val h = SnapshotStore.history(root).find(_.seq == seq).get
    SnapshotStore.read(spark, root, asOf = Some(h.id))
  }

  test("retention: expire keeps the sidecar a retained manifest's " +
      "props reference — the table still resolves after history ages " +
      "out") {
    val root = tmpRoot("ret")
    SnapshotStore.write(base(), root, "m", "ts")
    SnapshotStore.appendUpsert(
      batch((50L, "2024-01", "2024-01-05 00:00:00", -5.0)),
      root, "m", "ts", Seq("id"))
    // two more appends age the upsert commit out of keepLast=2
    SnapshotStore.appendPartitions(
      batch((9001L, "2024-03", "2024-03-01 00:00:00", 1.0)),
      root, "m", "ts")
    SnapshotStore.appendPartitions(
      batch((9002L, "2024-03", "2024-03-02 00:00:00", 1.0)),
      root, "m", "ts")
    SnapshotStore.expire(root, keepLast = 2)
    val r = SnapshotStore.read(spark, root)
    assert(r.count() === 202L)
    assert(r.filter(col("id") === 50L).select("price").head().getDouble(0)
      === -5.0, "the displaced row must stay displaced after expire")
  }
}
