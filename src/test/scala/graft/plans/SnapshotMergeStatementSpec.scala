package graft.plans

import graft.SparkSpec
import graft.etl.SnapshotStore
import org.apache.spark.sql.functions._

/** Native SQL `MERGE INTO` over snapshot tables: the standard
  * statement routed (post-hoc resolution rewrite) through the same
  * locked, stats-pruned commit as `CALL system.merge_into`. */
class SnapshotMergeStatementSpec extends SparkSpec {

  import spark.implicits._

  private def base() = Seq(
    (1L, "2024-01", 10.0), (2L, "2024-01", 20.0),
    (3L, "2024-02", 30.0), (4L, "2024-02", 40.0),
    (5L, "2024-03", 50.0))
    .toDF("id", "m", "price")

  private var n = 0
  private def mkTable(): (String, String, String) = synchronized {
    n += 1
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft_mergestmt_$n").toString
    SnapshotStore.write(base(), s"$wh/t", "m", "id")
    val cat = s"mstmt$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh, s"$wh/t")
  }

  private def changesView(name: String): Unit =
    Seq(
      (2L, "2024-01", 0.0, true),    // matched delete
      (3L, "2024-03", 333.0, false), // matched update, MOVES month
      (9L, "2024-02", 90.0, false),  // unmatched insert
      (99L, "2024-09", 0.0, true))   // unmatched delete: must no-op
      .toDF("id", "m", "price", "del")
      .createOrReplaceTempView(name)

  private def state(root: String): Map[Long, (String, Double)] =
    SnapshotStore.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("three-clause MERGE INTO ≡ the CALL procedure: same rows, " +
      "untouched partitions carried by reference, id row returned") {
    val (cat, _, root) = mkTable()
    val (catRef, _, rootRef) = mkTable()
    changesView("stmt_changes")
    val before = SnapshotStore.current(root).get
    val out = spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_changes AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND NOT s.del THEN INSERT *""".stripMargin)
      .collect()
    // the CALL twin on the identical second table
    spark.sql(s"CALL $catRef.system.merge_into('t', 'stmt_changes', " +
      "'id', 'del')")
    assert(state(root) === state(rootRef),
      "statement and procedure must commit identical tables")
    assert(state(root) === Map(
      1L -> ("2024-01", 10.0), 3L -> ("2024-03", 333.0),
      4L -> ("2024-02", 40.0), 5L -> ("2024-03", 50.0),
      9L -> ("2024-02", 90.0)))
    // returns the committed snapshot id, like CALL
    assert(out.map(_.getLong(0)).toSeq ===
      Seq(SnapshotStore.current(root).get.id))
    // untouched month 2024-01 was restated? NO — 2024-01 held a
    // matched delete (id 2), so it restates; no month is untouched in
    // this changeset except... verify carry on a second, disjoint run
    val after = SnapshotStore.current(root).get
    assert(SnapshotStore.seqOf(after) === SnapshotStore.seqOf(before) + 1,
      "one atomic commit")
    Seq((9L, "2024-02", 91.0, false)).toDF("id", "m", "price", "del")
      .createOrReplaceTempView("stmt_changes2")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_changes2 AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val fin = SnapshotStore.current(root).get
    def dirOf(m: SnapshotStore.Manifest, v: String) =
      m.entries.find(_.value == v).map(_.dir)
    assert(dirOf(fin, "2024-01") === dirOf(after, "2024-01"),
      "a month the changeset never touches carries by dir reference")
    assert(dirOf(fin, "2024-03") === dirOf(after, "2024-03"))
    assert(dirOf(fin, "2024-02") !== dirOf(after, "2024-02"))
    assert(state(root)(9L) === (("2024-02", 91.0)))
  }

  test("SQL clause semantics hold: an unconditional INSERT * inserts " +
      "even delete-flagged unmatched rows (unlike the procedure's " +
      "changeset model), and clause order is first-match-wins") {
    val (cat, _, root) = mkTable()
    changesView("stmt_changes_u")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_changes_u AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // id 99 (unmatched, del=true) now INSERTS — the statement's
    // clauses say so; the NOT s.del guard is what reproduces the
    // procedure semantics
    assert(state(root).contains(99L))
    // first-match-wins: UPDATE listed before DELETE wins on rows
    // matching both conditions
    val (cat2, _, root2) = mkTable()
    Seq((1L, "2024-01", 111.0, true)).toDF("id", "m", "price", "del")
      .createOrReplaceTempView("stmt_changes_o")
    spark.sql(
      s"""MERGE INTO $cat2.t AS t USING stmt_changes_o AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.price > 0 THEN UPDATE SET *
         |WHEN MATCHED AND s.del THEN DELETE""".stripMargin)
    assert(state(root2)(1L) === (("2024-01", 111.0)),
      "the earlier UPDATE clause must win over the later DELETE")
  }

  test("a NULL clause condition is 'not satisfied': the row FALLS " +
      "THROUGH to the next clause instead of being suppressed") {
    val (cat, _, root) = mkTable()
    // id 1 matches with del = NULL: SQL semantics say the DELETE
    // clause is not satisfied and the unconditional UPDATE fires — a
    // raw Not(NULL) in the first-match-wins fold would poison every
    // later clause and silently leave the base row unchanged
    Seq((1L, "2024-01", 111.0, Option.empty[Boolean]),
        (3L, "2024-02", 333.0, Some(true)))
      .toDF("id", "m", "price", "del")
      .createOrReplaceTempView("stmt_changes_nullc")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_changes_nullc AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(state(root)(1L) === (("2024-01", 111.0)),
      "NULL delete condition must fall through to the UPDATE")
    assert(!state(root).contains(3L), "true delete condition deletes")
  }

  test("delete-only MERGE and a no-op changeset") {
    val (cat, _, root) = mkTable()
    Seq((3L, true), (77L, true)).toDF("id", "del")
      .createOrReplaceTempView("stmt_del_only")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_del_only AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.del THEN DELETE""".stripMargin)
    assert(state(root).keySet === Set(1L, 2L, 4L, 5L))
    // nothing matches, nothing inserts → no commit burned
    val id = SnapshotStore.current(root).get.id
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_del_only AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.del THEN DELETE""".stripMargin)
    assert(SnapshotStore.current(root).get.id === id,
      "a MERGE that touches nothing must not commit")
  }

  test("TARGET-referencing clause conditions: WHEN MATCHED AND " +
      "t.price > 15 evaluates on the resolve join — only base rows " +
      "passing the target predicate are claimed") {
    val (cat, _, root) = mkTable()
    // every base row has a matching change row; the DELETE must claim
    // only those whose CURRENT price exceeds 15
    Seq((1L, true), (2L, true), (3L, true)).toDF("id", "del")
      .createOrReplaceTempView("stmt_tref")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_tref AS s
         |ON t.id = s.id
         |WHEN MATCHED AND t.price > 15 THEN DELETE""".stripMargin)
    assert(state(root).keySet === Set(1L, 4L, 5L),
      "ids 2 (20.0) and 3 (30.0) deleted; id 1 (10.0) kept by the " +
        "target predicate")
  }

  test("partial SET keeps unassigned target columns, and mixed " +
      "target/source SET values evaluate on the joined row") {
    val (cat, _, root) = mkTable()
    Seq((1L, 100.0), (3L, 300.0)).toDF("id", "p")
      .createOrReplaceTempView("stmt_pset")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_pset AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET price = t.price + s.p""".stripMargin)
    assert(state(root) === Map(
      1L -> ("2024-01", 110.0), 2L -> ("2024-01", 20.0),
      3L -> ("2024-02", 330.0), 4L -> ("2024-02", 40.0),
      5L -> ("2024-03", 50.0)),
      "price = old + s.p; month (unassigned) kept from the target")
  }

  test("diverging UPDATE and INSERT values are legal clauses now: " +
      "matched rows take the SET value, unmatched the INSERT value") {
    val (cat, _, root) = mkTable()
    Seq((1L, "2024-01", 5.0), (9L, "2024-09", 5.0))
      .toDF("id", "m", "price").createOrReplaceTempView("stmt_div")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_div AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET price = s.price * 2
         |WHEN NOT MATCHED THEN
         |  INSERT (id, m, price) VALUES (s.id, s.m, s.price + 1)""".stripMargin)
    assert(state(root)(1L) === (("2024-01", 10.0)), "update: 5*2")
    assert(state(root)(9L) === (("2024-09", 6.0)), "insert: 5+1")
  }

  test("a partition-moving partial SET restates source AND landing " +
      "months — the moved row lands exactly once, neighbours carried") {
    val (cat, _, root) = mkTable()
    Seq((1L, "2024-03")).toDF("id", "newm")
      .createOrReplaceTempView("stmt_move")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING stmt_move AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET m = s.newm""".stripMargin)
    assert(state(root)(1L) === (("2024-03", 10.0)),
      "row moved to 2024-03, price kept (partial SET)")
    assert(state(root).values.count(_._1 == "2024-03") === 2,
      "landing month holds its prior row AND the moved one")
  }

  test("unsupported shapes fail LOUDLY at analysis with nothing " +
      "committed: BY SOURCE clauses, multi-column ON, target refs in " +
      "NOT MATCHED, non-deterministic/current-time conditions") {
    val (cat, _, root) = mkTable()
    changesView("stmt_changes_e")
    val id = SnapshotStore.current(root).get.id
    def rejected(sql: String, needle: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(sql))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    // a by-source condition referencing the SOURCE is nonsense (the
    // row has no source values): Spark's own resolution rejects the
    // column (our target-only check is defense in depth behind it)
    rejected(
      s"""MERGE INTO $cat.t AS t USING stmt_changes_e AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE AND s.del THEN DELETE""".stripMargin,
      "del")
    rejected(
      s"""MERGE INTO $cat.t AS t USING stmt_changes_e AS s
         |ON t.id = s.id AND t.m = s.m
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
      "single")
    rejected(
      s"""MERGE INTO $cat.t AS t USING stmt_changes_e AS s
         |ON t.id = s.id
         |WHEN MATCHED AND rand() > 0.5 THEN DELETE""".stripMargin,
      "non-deterministic")
    rejected(
      s"""MERGE INTO $cat.t AS t USING stmt_changes_e AS s
         |ON t.id = s.id
         |WHEN MATCHED AND t.m < date_format(now(), 'yyyy-MM')
         |THEN DELETE""".stripMargin,
      "current time")
    assert(SnapshotStore.current(root).get.id === id,
      "rejected statements must not commit")
  }

  test("WHEN NOT MATCHED BY SOURCE: first-match-wins clause program " +
      "over unmatched target rows, row-exact CDC sidecar") {
    val (cat, _, root) = mkTable()
    val seq0 = SnapshotStore.currentSeq(root)
    // source carries ids 2 and 3 only → 1, 4, 5 are by-source rows
    Seq((2L, 222.0), (3L, 333.0)).toDF("id", "p")
      .createOrReplaceTempView("bs_src")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING bs_src AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET price = s.p
         |WHEN NOT MATCHED BY SOURCE AND t.price >= 50.0 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN
         |  UPDATE SET price = t.price - 1.0""".stripMargin)
    // 1 (10.0) → 9.0; 4 (40.0) → 39.0; 5 (50.0) → deleted (first
    // clause wins); 2/3 matched-updated
    assert(state(root) === Map(
      1L -> ("2024-01", 9.0), 2L -> ("2024-01", 222.0),
      3L -> ("2024-02", 333.0), 4L -> ("2024-02", 39.0)))
    // the CDC sidecar carries the by-source rows EXACTLY: one delete
    // image for 5, pre+post for the three updates (2, 3 matched; 1, 4
    // by-source) — one extra or missing row fails this set compare
    val cdc = SnapshotStore.changeFeed(spark, root, seq0,
      SnapshotStore.currentSeq(root))
      .collect().map(r => (r.getLong(0), r.getDouble(2),
        r.getString(3))).toSet
    assert(cdc === Set(
      (5L, 50.0, "delete"),
      (1L, 10.0, "update_preimage"), (1L, 9.0, "update_postimage"),
      (2L, 20.0, "update_preimage"), (2L, 222.0, "update_postimage"),
      (3L, 30.0, "update_preimage"), (3L, 333.0, "update_postimage"),
      (4L, 40.0, "update_preimage"), (4L, 39.0, "update_postimage")))
  }

  test("by-source UPDATE moving the partition column restates source " +
      "AND landing partitions; delete-only sync keeps the rest") {
    val (cat, _, root) = mkTable()
    // source keeps 1..4 → only 5 ('2024-03') is by-source; its SET
    // moves it to month 2024-09 (a partition that does not exist yet)
    Seq(1L, 2L, 3L, 4L).toDF("id").createOrReplaceTempView("bs_src_mv")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING bs_src_mv AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN
         |  UPDATE SET m = '2024-09', price = t.price + 0.5""".stripMargin)
    assert(state(root) === Map(
      1L -> ("2024-01", 10.0), 2L -> ("2024-01", 20.0),
      3L -> ("2024-02", 30.0), 4L -> ("2024-02", 40.0),
      5L -> ("2024-09", 50.5)))
    assert(SnapshotStore.current(root).get.entries
      .exists(_.value == "2024-09"), "landing partition committed")
    assert(!SnapshotStore.current(root).get.entries
      .exists(_.value == "2024-03"), "drained source partition dropped")
  }

  test("by-source discovery is EXACT: a clause claiming no row (the " +
      "condition holds for no unmatched target) commits nothing") {
    val (cat, _, root) = mkTable()
    val before = SnapshotStore.current(root).get
    // source drops ids 1 AND 2 (prices 10/20): they are the only
    // by-source rows, and the condition price >= 25 is false for both
    // — the probe pass (stats-pruned candidates, anti-joined against
    // the source keys, filtered by the bare condition) finds ZERO
    // claimed rows, and with no WHEN MATCHED clause the key-matched
    // partitions have nothing to restate either: full no-op
    Seq(3L, 4L, 5L).toDF("id").createOrReplaceTempView("bs_src_pr")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING bs_src_pr AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND t.price >= 25.0 THEN
         |  DELETE""".stripMargin)
    val after = SnapshotStore.current(root).get
    assert(state(root).keySet === Set(1L, 2L, 3L, 4L, 5L),
      "no row matched the by-source condition — content unchanged")
    assert(after.id === before.id,
      "a clause program claiming no row must not commit")
  }

  test("a no-op by-source sync (source covers every key) touches ZERO " +
      "partitions: the probe pass finds no claimed row, nothing commits") {
    val (cat, _, root) = mkTable()
    val before = SnapshotStore.current(root).get
    // the source carries EVERY target key → no row is by-source; the
    // unconditional DELETE clause claims nothing. Pre-r14 this
    // restated every candidate partition's data unchanged; now the
    // commit must be a pure no-op (same head, same dirs).
    Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
      .createOrReplaceTempView("bs_src_noop")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING bs_src_noop AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val after = SnapshotStore.current(root).get
    assert(after.id === before.id, "a no-op sync must not commit")
    assert(after.entries.map(_.dir) === before.entries.map(_.dir))
    // and the probe is EXACT, not just empty-safe: dropping one key
    // from the source deletes exactly that row, touching one partition
    Seq(1L, 2L, 3L, 4L).toDF("id")
      .createOrReplaceTempView("bs_src_one")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING bs_src_one AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(state(root).keySet === Set(1L, 2L, 3L, 4L))
    val m2 = SnapshotStore.current(root).get
    val changedDirs = m2.entries.map(_.dir)
      .filterNot(before.entries.map(_.dir).toSet)
    assert(changedDirs.isEmpty,
      "a delete-only by-source sync drains id 5's partition without " +
        s"restating any other (fresh dirs: $changedDirs)")
  }

  test("MERGE INTO a NON-snapshot v2 table is untouched by the rule " +
      "(Spark's own row-level path / error applies)") {
    changesView("stmt_changes_n")
    // a parquet-path table is not a snapshot table: Spark itself must
    // reject (no SupportsRowLevelOperations), proving the rewrite
    // didn't grab a table it doesn't own
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mergestmt_plain").toString
    base().write.mode("overwrite").parquet(s"$dir/p")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO parquet.`$dir/p` AS t USING stmt_changes_n AS s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
  }
}
