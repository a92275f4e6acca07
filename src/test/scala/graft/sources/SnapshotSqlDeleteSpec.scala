package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore

/** SQL `DELETE FROM` over snapshot tables — the atomic DROP PARTITION:
  * partition-value predicates commit metadata-only through the locked
  * [[SnapshotStore.dropPartitions]]; row-level predicates are rejected
  * at analysis (deletes are partition-granular by design). */
class SnapshotSqlDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def mkRows() = Seq(
    (1L, "2024-01", 1, 10.0), (2L, "2024-01", 2, 20.0),
    (3L, "2024-02", 3, 30.0), (4L, "2024-02", 4, 40.0),
    (5L, "2024-03", 5, 50.0))
    .toDF("id", "m", "v", "price")

  private def mkTable(tag: String): (String, String) = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft_snapdel_$tag").toString
    SnapshotStore.write(mkRows(), s"$wh/t", "m", "v")
    (wh, s"$wh/t")
  }

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("DELETE of one partition is a metadata-only commit: survivors " +
      "carried by the SAME dirs, no data written, dropped dirs intact " +
      "for time travel") {
    val (wh, root) = mkTable("one")
    register("snapd1", wh)
    val before = SnapshotStore.current(root).get
    val dirsBefore = Option(new java.io.File(s"$root/data").listFiles())
      .get.map(_.getName).toSet
    spark.sql("DELETE FROM snapd1.t WHERE m = '2024-02'")
    val after = SnapshotStore.current(root).get
    assert(after.entries.map(_.value).toSet === Set("2024-01", "2024-03"))
    // carried BY REFERENCE: identical dir strings, not rewrites
    assert(after.entries.toSet ===
      before.entries.filterNot(_.value == "2024-02").toSet)
    // metadata-only: the only new thing under data/ is the commit's
    // EMPTY id-claim dir (deliberately left for expire's grace-aware
    // sweep — deleting it immediately would reopen the id-reuse race)
    val newDirs = Option(new java.io.File(s"$root/data").listFiles())
      .get.map(_.getName).toSet -- dirsBefore
    assert(newDirs === Set(s"snap-${after.id}"))
    assert(Option(new java.io.File(s"$root/data/snap-${after.id}")
      .listFiles()).get.isEmpty, "a DELETE must write no data")
    assert(spark.sql("SELECT sum(price) FROM snapd1.t")
      .head().getDouble(0) === 80.0)
    // the dropped month is still on disk and time-travel-visible
    assert(SnapshotStore.read(spark, root, asOf = Some(before.id))
      .count() === 5L)
  }

  test("IN-list and OR predicates translate to the metadata-only drop; " +
      "row-granular predicates route to the copy-on-write path " +
      "(SnapshotSqlUpdateSpec pins its semantics)") {
    val (wh, root) = mkTable("pred")
    register("snapd2", wh)
    spark.sql(
      "DELETE FROM snapd2.t WHERE m IN ('2024-01') OR m = '2024-03'")
    assert(SnapshotStore.current(root).get.entries.map(_.value) ===
      Seq("2024-02"))
    // a row-granular predicate is served by the row-level rewrite: it
    // RESTATES the touched partition (writes data), never drops it
    val dirsBefore = Option(new java.io.File(s"$root/data").listFiles())
      .get.map(_.getName).toSet
    spark.sql("DELETE FROM snapd2.t WHERE m = '2024-02' AND id = 3")
    assert(spark.sql("SELECT id FROM snapd2.t").collect()
      .map(_.getLong(0)).toSet === Set(4L))
    val after = SnapshotStore.current(root).get
    assert(Option(new java.io.File(s"$root/data/snap-${after.id}")
      .listFiles()).get.nonEmpty,
      "the row-level path restates (writes) the touched partition")
    assert(!dirsBefore.contains(s"snap-${after.id}"))
  }

  test("null-intolerance conjuncts and dominated ORs still take the " +
      "metadata-only drop: identity partition values are provably " +
      "non-null") {
    val (wh, root) = mkTable("nullconj")
    register("snapd7", wh)
    // Spark commonly attaches IsNotNull(m) beside m = 'x'; partition
    // values are non-null by the commit guard, so the conjunct decides
    // TRUE and the whole predicate stays partition-granular
    spark.sql(
      "DELETE FROM snapd7.t WHERE m IS NOT NULL AND m = '2024-01'")
    val after = SnapshotStore.current(root).get
    assert(after.entries.map(_.value).toSet === Set("2024-02", "2024-03"))
    assert(Option(new java.io.File(s"$root/data/snap-${after.id}")
      .listFiles()).get.isEmpty,
      "the IsNotNull conjunct must not force a copy-on-write rewrite")
    // m IS NULL can match no partition: a provably-no-op DELETE must
    // not even commit
    val idBefore = SnapshotStore.current(root).get.id
    spark.sql("DELETE FROM snapd7.t WHERE m IS NULL")
    assert(SnapshotStore.current(root).get.id === idBefore)
    // OR domination: every entry decides (the decided-true disjunct
    // wins for 2024-02; the others decide false on both sides)
    spark.sql(
      "DELETE FROM snapd7.t WHERE m = '2024-02' OR (m IS NULL)")
    assert(SnapshotStore.current(root).get.entries.map(_.value) ===
      Seq("2024-03"))
    assert(Option(new java.io.File(
      s"$root/data/snap-${SnapshotStore.current(root).get.id}")
      .listFiles()).get.isEmpty, "the dominated OR stays metadata-only")
  }

  test("unconditional DELETE truncates to a typed empty table; the " +
      "history survives for time travel") {
    val (wh, root) = mkTable("trunc")
    register("snapd3", wh)
    val id1 = SnapshotStore.current(root).get.id
    spark.sql("DELETE FROM snapd3.t")
    assert(spark.sql("SELECT count(*) FROM snapd3.t").head().getLong(0) === 0L)
    // schema preserved on the empty table
    assert(spark.table("snapd3.t").columns.toSeq ===
      Seq("id", "m", "v", "price"))
    assert(SnapshotStore.read(spark, root, asOf = Some(id1)).count() === 5L)
    // deleting what isn't there is a no-op that must not COMMIT: the
    // manifest id stays, so repeated idempotent cleanups can't push
    // real history out of the retention window
    val idBefore = SnapshotStore.current(root).get.id
    spark.sql("DELETE FROM snapd3.t WHERE m = '2030-01'")
    assert(SnapshotStore.current(root).get.id === idBefore,
      "a no-op DELETE must not burn a snapshot")
    assert(spark.sql("SELECT count(*) FROM snapd3.t").head().getLong(0) === 0L)
  }

  test("timestamp- and date-partitioned DELETE render the literal with " +
      "Spark's own cast (never Timestamp.toString's trailing .0) and " +
      "drop exactly the named partition") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_snapdel_ts").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 1),
      (2L, java.sql.Timestamp.valueOf("2024-02-15 10:00:00"), 2))
      .toDF("id", "ts", "v")
    SnapshotStore.write(rows, s"$wh/t", partCol = "ts", sortCol = "v")
    // java.sql.Timestamp.toString renders "…10:00:00.0" while the
    // writer's dir token (cast-to-string) has no ".0": the DELETE path
    // renders through Catalyst's Cast, so the tokens can never drift
    val dates = Seq(
      (1L, java.sql.Date.valueOf("2024-01-15"), 1),
      (2L, java.sql.Date.valueOf("2024-02-15"), 2))
      .toDF("id", "d", "v")
    SnapshotStore.write(dates, s"$wh/td", partCol = "d", sortCol = "v")
    register("snapd4", wh)
    spark.sql(
      "DELETE FROM snapd4.t WHERE ts = TIMESTAMP '2024-01-15 10:00:00'")
    assert(SnapshotStore.current(s"$wh/t").get.entries.map(_.value) ===
      Seq("2024-02-15 10:00:00"))
    assert(spark.sql("SELECT count(*) FROM snapd4.t").head().getLong(0) === 1L)
    spark.sql("DELETE FROM snapd4.td WHERE d = DATE '2024-02-15'")
    assert(SnapshotStore.current(s"$wh/td").get.entries.map(_.value) ===
      Seq("2024-01-15"))
    // a MISSING timestamp partition deletes nothing and burns no id
    val before = SnapshotStore.current(s"$wh/t").get.id
    spark.sql(
      "DELETE FROM snapd4.t WHERE ts = TIMESTAMP '2030-01-01 00:00:00'")
    assert(SnapshotStore.current(s"$wh/t").get.id === before)
  }

  test("a TZ-timestamp DELETE under a session timezone differing from " +
      "the table's recorded writer zone can never silently corrupt: " +
      "the row-level path evaluates instants correctly, and a " +
      "restatement under the wrong zone refuses loudly") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_snapdel_tzmm").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 1),
      (2L, java.sql.Timestamp.valueOf("2024-02-15 10:00:00"), 2))
      .toDF("id", "ts", "v")
    SnapshotStore.write(rows, s"$wh/t", partCol = "ts", sortCol = "v")
    register("snapd6", wh)
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    val other =
      if (tz0 == "Asia/Tokyo") "America/New_York" else "Asia/Tokyo"
    spark.conf.set("spark.sql.session.timeZone", other)
    try {
      // the mismatch diverts the token-rendered partition drop (which
      // would compare wall-clock strings across zones) onto the
      // row-level path — whose own discovery matches rendered tokens
      // against manifest values, so it refuses BEFORE any work rather
      // than committing a silent no-op restatement
      val id = SnapshotStore.current(s"$wh/t").get.id
      val e1 = intercept[IllegalArgumentException] {
        spark.sql(
          "DELETE FROM snapd6.t WHERE ts = TIMESTAMP '2024-01-15 10:00:00'")
      }
      assert(e1.getMessage.contains("timezone"))
      val e2 = intercept[IllegalArgumentException] {
        spark.sql("DELETE FROM snapd6.t WHERE id = 1")
      }
      assert(e2.getMessage.contains("timezone"))
      assert(spark.sql("SELECT count(*) FROM snapd6.t").head()
        .getLong(0) === 2L, "nothing committed")
      assert(SnapshotStore.current(s"$wh/t").get.id === id)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
    // under the writer's own zone the metadata-only drop still serves
    spark.sql(
      "DELETE FROM snapd6.t WHERE ts = TIMESTAMP '2024-01-15 10:00:00'")
    assert(spark.sql("SELECT count(*) FROM snapd6.t").head()
      .getLong(0) === 1L)
  }

  test("a float partition column never takes the metadata-only drop — " +
      "its literal-vs-cast token formatting is ambiguous — but the " +
      "row-level path serves it through data-value evaluation") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_snapdel_f").toString
    val rows = Seq((1L, 1.5, 1), (2L, 2.5, 2)).toDF("id", "fp", "v")
    SnapshotStore.write(rows, s"$wh/t", partCol = "fp", sortCol = "v")
    register("snapd5", wh)
    spark.sql("DELETE FROM snapd5.t WHERE fp = 1.5")
    assert(spark.sql("SELECT id FROM snapd5.t").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
  }
}
