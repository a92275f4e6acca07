package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore

/** Native SQL `UPDATE` and row-level `DELETE FROM` over snapshot
  * tables ([[graft.plans.SnapshotUpdateRewrite]] /
  * [[graft.plans.SnapshotRowDeleteRewrite]] →
  * [[graft.operators.RowLevelOps]]): copy-on-write restatement of only
  * the touched partitions, SQL UPDATE evaluation semantics (all SETs
  * see the old row), cross-partition moves, no-op statements never
  * burning a snapshot, and loud refusals for the shapes whose two-pass
  * evaluation could disagree. */
class SnapshotSqlUpdateSpec extends SparkSpec {

  import spark.implicits._

  private def mkRows() = Seq(
    (1L, "2024-01", 1, 10.0), (2L, "2024-01", 2, 20.0),
    (3L, "2024-02", 3, 30.0), (4L, "2024-02", 4, 40.0),
    (5L, "2024-03", 5, 50.0))
    .toDF("id", "m", "v", "price")

  private def mkTable(tag: String): (String, String) = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft_snapupd_$tag").toString
    SnapshotStore.write(mkRows(), s"$wh/t", "m", "v")
    (wh, s"$wh/t")
  }

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  private def state(cat: String): Set[(Long, String, Double)] =
    spark.sql(s"SELECT id, m, price FROM $cat.t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("UPDATE restates only the touched partition (others carried by " +
      "reference), SETs see the OLD row, and the prior snapshot stays " +
      "time-travel-visible") {
    val (wh, root) = mkTable("basic")
    register("snapu1", wh)
    val before = SnapshotStore.current(root).get
    // price doubles AND v becomes the old price: both assignments must
    // read pre-update values (standard SQL UPDATE), not each other's
    spark.sql(
      "UPDATE snapu1.t SET price = price * 2, v = CAST(price AS INT) " +
        "WHERE m = '2024-02' AND id = 3")
    assert(state("snapu1") === Set(
      (1L, "2024-01", 10.0), (2L, "2024-01", 20.0),
      (3L, "2024-02", 60.0), (4L, "2024-02", 40.0),
      (5L, "2024-03", 50.0)))
    assert(spark.sql("SELECT v FROM snapu1.t WHERE id = 3")
      .head().getInt(0) === 30, "SET v must see the OLD price")
    val after = SnapshotStore.current(root).get
    // untouched months carry the SAME dir entries; 2024-02 is fresh
    assert(after.entries.filter(_.value != "2024-02").toSet ===
      before.entries.filter(_.value != "2024-02").toSet)
    assert(after.entries.filter(_.value == "2024-02").toSet !==
      before.entries.filter(_.value == "2024-02").toSet)
    assert(SnapshotStore.read(spark, root, asOf = Some(before.id))
      .filter($"id" === 3).head().getDouble(3) === 30.0,
      "time travel sees the pre-update value")
  }

  test("UPDATE of the partition column MOVES rows: source and landing " +
      "partitions restate together, the row lands exactly once") {
    val (wh, root) = mkTable("move")
    register("snapu2", wh)
    spark.sql("UPDATE snapu2.t SET m = '2024-01' WHERE id = 3")
    assert(state("snapu2") === Set(
      (1L, "2024-01", 10.0), (2L, "2024-01", 20.0), (3L, "2024-01", 30.0),
      (4L, "2024-02", 40.0), (5L, "2024-03", 50.0)))
    // a move that DRAINS its source partition drops the entry
    spark.sql("UPDATE snapu2.t SET m = '2024-02' WHERE m = '2024-03'")
    assert(SnapshotStore.current(root).get.entries.map(_.value).toSet ===
      Set("2024-01", "2024-02"))
    assert(state("snapu2").map(_._1) === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("unconditional UPDATE rewrites every partition; a WHERE that " +
      "matches nothing commits NOTHING (no snapshot burned)") {
    val (wh, root) = mkTable("noop")
    register("snapu3", wh)
    spark.sql("UPDATE snapu3.t SET price = price + 1.0")
    assert(state("snapu3").map(_._3) === Set(11.0, 21.0, 31.0, 41.0, 51.0))
    val id = SnapshotStore.current(root).get.id
    spark.sql("UPDATE snapu3.t SET price = 0.0 WHERE id = 999")
    assert(SnapshotStore.current(root).get.id === id,
      "a no-op UPDATE must not burn a snapshot")
    // NULL-condition rows are NOT matched (WHERE NULL selects nothing)
    spark.sql("UPDATE snapu3.t SET price = 0.0 WHERE CAST(NULL AS BOOLEAN)")
    assert(SnapshotStore.current(root).get.id === id)
  }

  test("non-deterministic or subquery-bearing UPDATE/DELETE refuse at " +
      "analysis, loudly, with nothing committed") {
    val (wh, root) = mkTable("refuse")
    register("snapu4", wh)
    val id = SnapshotStore.current(root).get.id
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("UPDATE snapu4.t SET price = rand() WHERE id = 1")
    }
    assert(e1.getMessage.contains("non-deterministic"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("UPDATE snapu4.t SET price = 0.0 " +
        "WHERE id IN (SELECT id FROM snapu4.t WHERE price > 25.0)")
    }
    assert(e2.getMessage.contains("subquery"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM snapu4.t WHERE price > (SELECT avg(price) " +
        "FROM snapu4.t)")
    }
    assert(e3.getMessage.contains("subquery"))
    assert(SnapshotStore.current(root).get.id === id)
  }

  test("row-level DELETE restates only the partitions holding matches, " +
      "drops drained ones, and never rewrites untouched months; " +
      "partition-value DELETE keeps the metadata-only fast path") {
    val (wh, root) = mkTable("rowdel")
    register("snapu5", wh)
    val before = SnapshotStore.current(root).get
    // id=3 lives in 2024-02 next to the surviving id=4
    spark.sql("DELETE FROM snapu5.t WHERE m = '2024-02' AND id = 3")
    assert(state("snapu5") === Set(
      (1L, "2024-01", 10.0), (2L, "2024-01", 20.0),
      (4L, "2024-02", 40.0), (5L, "2024-03", 50.0)))
    val mid = SnapshotStore.current(root).get
    assert(mid.entries.filter(_.value != "2024-02").toSet ===
      before.entries.filter(_.value != "2024-02").toSet,
      "untouched months carry by reference")
    // price > 25 drains 2024-02 and 2024-03 wholesale: entries DROP
    spark.sql("DELETE FROM snapu5.t WHERE price > 25.0")
    assert(SnapshotStore.current(root).get.entries.map(_.value).toSet ===
      Set("2024-01"))
    assert(state("snapu5") ===
      Set((1L, "2024-01", 10.0), (2L, "2024-01", 20.0)))
    // no-op row-level DELETE: nothing matched, nothing committed
    val id = SnapshotStore.current(root).get.id
    spark.sql("DELETE FROM snapu5.t WHERE price > 999.0")
    assert(SnapshotStore.current(root).get.id === id)
    // a partition-value DELETE still commits METADATA-ONLY: the only
    // new thing under data/ is the commit's empty id-claim dir
    val dirsBefore = Option(new java.io.File(s"$root/data").listFiles())
      .get.map(_.getName).toSet
    spark.sql("DELETE FROM snapu5.t WHERE m = '2024-01'")
    val afterDel = SnapshotStore.current(root).get
    val newDirs = Option(new java.io.File(s"$root/data").listFiles())
      .get.map(_.getName).toSet -- dirsBefore
    assert(newDirs === Set(s"snap-${afterDel.id}"),
      "partition-value DELETE must not route through the row-level path")
    assert(Option(new java.io.File(s"$root/data/snap-${afterDel.id}")
      .listFiles()).get.isEmpty)
  }

  test("two concurrent row-level UPDATEs serialize through the table " +
      "lock: both land, neither is lost, the chain advances twice") {
    val (wh, root) = mkTable("race")
    register("snapu10", wh)
    val seq0 = SnapshotStore.currentSeq(root)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = Seq(
      Future(spark.sql(
        "UPDATE snapu10.t SET price = price + 1.0 WHERE m = '2024-01'")),
      Future(spark.sql(
        "UPDATE snapu10.t SET price = price + 2.0 WHERE m = '2024-02'")))
    fs.foreach(Await.result(_, 120.seconds))
    assert(state("snapu10") === Set(
      (1L, "2024-01", 11.0), (2L, "2024-01", 21.0),
      (3L, "2024-02", 32.0), (4L, "2024-02", 42.0),
      (5L, "2024-03", 50.0)),
      "both updates applied — no lost update under concurrency")
    assert(SnapshotStore.currentSeq(root) === seq0 + 2)
  }

  test("current-time predicates refuse loudly: discovery and rewrite " +
      "are two separately-optimized jobs, each stamping its own now()") {
    val (wh, root) = mkTable("timey")
    register("snapu7", wh)
    val id = SnapshotStore.current(root).get.id
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("UPDATE snapu7.t SET price = 0.0 " +
        "WHERE current_date() > DATE '2000-01-01' AND id = 1")
    }
    assert(e1.getMessage.contains("current time"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM snapu7.t " +
        "WHERE id = 1 AND now() > TIMESTAMP '2000-01-01 00:00:00'")
    }
    assert(e2.getMessage.contains("current time"))
    assert(SnapshotStore.current(root).get.id === id)
  }

  test("equivalently-RENDERING zone aliases pass every tz guard " +
      "(UTC vs Etc/UTC): append, partition DELETE and row-level DML " +
      "all work across the alias") {
    import spark.implicits._
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    val wh = java.nio.file.Files
      .createTempDirectory("graft_snapupd_alias").toString
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val rows = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 1),
        (2L, java.sql.Timestamp.valueOf("2024-02-15 10:00:00"), 2),
        (3L, java.sql.Timestamp.valueOf("2024-02-15 10:00:00"), 3))
        .toDF("id", "ts", "v")
      SnapshotStore.write(rows, s"$wh/t", partCol = "ts", sortCol = "v")
      register("snapu8", wh)
      spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
      // append under the alias
      SnapshotStore.appendPartitions(
        Seq((4L, java.sql.Timestamp.valueOf("2024-03-15 10:00:00"), 4))
          .toDF("id", "ts", "v"), s"$wh/t", "ts", "v")
      // row-level DELETE under the alias
      spark.sql("DELETE FROM snapu8.t WHERE id = 3")
      // metadata-only partition DELETE under the alias
      spark.sql(
        "DELETE FROM snapu8.t WHERE ts = TIMESTAMP '2024-01-15 10:00:00'")
      assert(spark.sql("SELECT id FROM snapu8.t").collect()
        .map(_.getLong(0)).toSet === Set(2L, 4L))
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("a legacy TZ-timestamp-partitioned table without a recorded " +
      "table.tz refuses row-level DML loudly — its token rendering " +
      "cannot be proven, and a silent no-op restatement would poison " +
      "the table with the wrong zone") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_snapupd_legacy").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 1),
      (2L, java.sql.Timestamp.valueOf("2024-02-15 10:00:00"), 2))
      .toDF("id", "ts", "v")
    SnapshotStore.write(rows, s"$wh/t", partCol = "ts", sortCol = "v")
    // simulate a pre-round-11 table: strip the table.tz prop from the
    // manifest (the chain slot shares the inode; the hint is a copy)
    for (f <- Seq(
        java.nio.file.Paths.get(s"$wh/t/MANIFEST"),
        java.nio.file.Paths.get(s"$wh/t/manifests/manifest-1"))) {
      val kept = java.nio.file.Files.readString(f).split("\n")
        .filterNot(_.startsWith("prop=table.tz\t")).mkString("", "\n", "\n")
      java.nio.file.Files.writeString(f, kept)
    }
    register("snapu9", wh)
    val e = intercept[IllegalArgumentException] {
      spark.sql("UPDATE snapu9.t SET v = 0 WHERE id = 1")
    }
    assert(e.getMessage.contains("predates timezone-recording"))
    assert(spark.sql("SELECT count(*) FROM snapu9.t WHERE v = 0")
      .head().getLong(0) === 0L, "nothing committed")
  }

  test("a float-partitioned row-level DELETE works through data-value " +
      "evaluation (the token-rendering ambiguity that blocks the " +
      "partition-drop path does not apply)") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_snapupd_f").toString
    val rows = Seq((1L, 1.5, 1), (2L, 2.5, 2)).toDF("id", "fp", "v")
    SnapshotStore.write(rows, s"$wh/t", partCol = "fp", sortCol = "v")
    register("snapu6", wh)
    spark.sql("DELETE FROM snapu6.t WHERE fp = CAST(1.5 AS DOUBLE)")
    assert(spark.sql("SELECT id FROM snapu6.t").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    assert(SnapshotStore.current(s"$wh/t").get.entries.map(_.value) ===
      Seq("2.5"), "the drained 1.5 partition drops")
  }
}
