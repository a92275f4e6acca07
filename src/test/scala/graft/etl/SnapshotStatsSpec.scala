package graft.etl

import graft.SparkSpec
import graft.etl.SnapshotStore.{ColStats, Entry, EntryStats, Manifest}
import graft.operators.MergeInto
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest entry statistics (Iceberg-style per-partition min/max +
  * row counts) and the MERGE discovery pruning built on them. */
class SnapshotStatsSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val r = s"${sys.props("java.io.tmpdir")}/graft_statspec_${name}_" +
      s"p${ProcessHandle.current().pid()}"
    graft.util.Fs.deleteRecursively(new java.io.File(r))
    r
  }

  /** Key-correlated partitions: ids 1-100 → month 2024-01, 101-200 →
    * 2024-02, 201-300 → 2024-03 — the auto-increment-id shape where
    * key-range pruning identifies the touched month exactly. */
  private def keyedTable: DataFrame = {
    import spark.implicits._
    (1 to 300).map { id =>
      val month = f"2024-${(id - 1) / 100 + 1}%02d"
      (id.toLong, month, s"payload-$id", id * 1.5)
    }.toDF("id", "month", "note", "amount")
  }

  test("write captures per-entry row counts and column min/max") {
    val root = freshRoot("capture")
    SnapshotStore.write(keyedTable, root, partCol = "month", sortCol = "id")
    val m = SnapshotStore.current(root).get
    assert(m.entries.size === 3)
    val feb = m.entries.find(_.value === "2024-02").get
    val st = feb.stats.get
    assert(st.rows === 100L)
    assert(st.cols("id") === ColStats("101", "200"))
    assert(st.cols("amount") === ColStats("151.5", "300.0"))
    assert(st.cols("month") === ColStats("2024-02", "2024-02"))
    // stats survive the manifest render/parse round trip (current()
    // already parsed from disk) and layout props are recorded
    assert(SnapshotStore.tableLayout(m) === Some(("month", "id")))
  }

  test("statCompare orders numerically, not lexically") {
    assert(SnapshotStore.statCompare(LongType, "9", "10") < 0)
    assert(SnapshotStore.statCompare(DoubleType, "9.5", "10.25") < 0)
    assert(SnapshotStore.statCompare(StringType, "9", "10") > 0)
    assert(SnapshotStore.statCompare(DateType, "2024-02-01", "2024-10-01") < 0)
    assert(SnapshotStore.statCompare(TimestampType,
      "2024-01-01T00:00:00Z", "2024-01-01T00:00:01Z") < 0)
    // NaN sorts greatest, matching Spark's ordering
    assert(SnapshotStore.statCompare(DoubleType, "NaN", "1.0E308") > 0)
    // strings order by UTF-8 BYTES (Spark's UTF8String binary order),
    // not UTF-16 code units: U+10000 (surrogate pair, leads 0xF0 in
    // UTF-8) sorts ABOVE U+E000 (leads 0xEE) — Java compareTo says the
    // opposite, which would mis-prune
    assert(SnapshotStore.statCompare(StringType,
      new String(Character.toChars(0x10000)), "") > 0)
    assert("𐀀".compareTo("") < 0) // the trap this avoids
  }

  test("candidatePartitions prunes to the key-touched month") {
    import spark.implicits._
    val root = freshRoot("prune")
    SnapshotStore.write(keyedTable, root, partCol = "month", sortCol = "id")
    val m = SnapshotStore.current(root).get
    val changes = Seq((150L, "2024-02", "upd", 0.0, false))
      .toDF("id", "month", "note", "amount", "_delete")
    assert(MergeInto.candidatePartitions(m, changes, "id")
      === Some(Set("2024-02")))
    // a changeset with no non-null keys can match nothing in base
    val nullKeys = Seq((Option.empty[Long], "2024-02", "x", 0.0, false))
      .toDF("id", "month", "note", "amount", "_delete")
    assert(MergeInto.candidatePartitions(m, nullKeys, "id")
      === Some(Set.empty[String]))
    // an unordered key type disables pruning (full scan, not wrong scan)
    val arrayKey = Seq((Seq(1L), "2024-02")).toDF("id", "month")
    assert(MergeInto.candidatePartitions(m, arrayKey, "id") === None)
    // a changeset carrying the key as a DIFFERENT type than the base
    // column the stats were captured under also disables pruning —
    // comparing long-typed stat strings under string order would skip
    // partitions the resolve join (with its implicit casts) matches
    val stringKey = Seq(("150", "2024-02")).toDF("id", "month")
    assert(MergeInto.candidatePartitions(m, stringKey, "id") === None)
  }

  test("stats-less entries stay candidates (conservative prune)") {
    import spark.implicits._
    val withStats = Entry("2024-01", "data/snap-1/__part=2024-01",
      Some(EntryStats(10, Map("id" -> ColStats("1", "100")))))
    val preStats = Entry("2024-02", "data/snap-1/__part=2024-02", None)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("month", StringType)))
    val m = Manifest(1, Seq(withStats, preStats), Some(schema))
    val changes = Seq((500L, "x")).toDF("id", "month")
    // key 500 is outside 2024-01's range, but 2024-02 has no stats —
    // it must survive the prune
    assert(MergeInto.candidatePartitions(m, changes, "id")
      === Some(Set("2024-02")))
    // a manifest that predates schema-carrying commits cannot type the
    // key → pruning entirely disabled, never guessed
    assert(MergeInto.candidatePartitions(
      Manifest(1, Seq(withStats, preStats)), changes, "id") === None)
  }

  test("pruned discovery scan lists only the candidate month's files") {
    val root = freshRoot("scan")
    SnapshotStore.write(keyedTable, root, partCol = "month", sortCol = "id")
    val pruned = SnapshotStore.readWhere(spark, root, Set("2024-02"))
    val files = pruned.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("__part=2024-02")),
      s"pruned scan leaked other partitions: ${files.mkString(", ")}")
  }

  test("single-month MERGE restates one month, carries the rest by reference") {
    import spark.implicits._
    val root = freshRoot("merge")
    SnapshotStore.write(keyedTable, root, partCol = "month", sortCol = "id")
    val before = SnapshotStore.current(root).get
    val dirOf = (m: Manifest, v: String) => m.entries.find(_.value == v).get.dir
    // keys 150 (update) and 160 (delete): both live in 2024-02 only
    val changes = Seq(
      (150L, "2024-02", "updated", 999.0, false),
      (160L, "2024-02", "ignored", 0.0, true))
      .toDF("id", "month", "note", "amount", "_delete")
    MergeInto.mergeCommit(spark, root, changes, key = "id",
      deleteFlag = "_delete", partCol = "month", sortCol = "id")
    val after = SnapshotStore.current(root).get
    // untouched months carried BY REFERENCE: same dir strings
    assert(dirOf(after, "2024-01") === dirOf(before, "2024-01"))
    assert(dirOf(after, "2024-03") === dirOf(before, "2024-03"))
    assert(dirOf(after, "2024-02") !== dirOf(before, "2024-02"))
    // and the merged content is right
    val out = SnapshotStore.read(spark, root)
    assert(out.count() === 299) // one delete
    assert(out.filter(col("id") === 150L).select("amount")
      .head().getDouble(0) === 999.0)
    assert(out.filter(col("id") === 160L).count() === 0)
    // the restated month's entry re-captured stats
    val feb = after.entries.find(_.value == "2024-02").get.stats.get
    assert(feb.rows === 99L)
    assert(feb.cols("amount").max === "999.0")
  }

  /** Wide-typed fixture for the footer-vs-aggregate equivalence: every
    * supportedStatType family, nulls mixed in, one all-null column. */
  private def wideTable: DataFrame = {
    import spark.implicits._
    (1 to 200).map { i =>
      val month = f"2024-${(i - 1) / 100 + 1}%02d"
      (i.toLong, month,
        java.sql.Timestamp.valueOf(f"$month-${i % 28 + 1}%02d 07:3${i % 10}:05"),
        java.time.LocalDateTime.parse(f"2024-03-0${i % 9 + 1}T12:00:${i % 60}%02d"),
        java.sql.Date.valueOf(f"2024-0${i % 9 + 1}-15"),
        i * 1.25f, i * 2.5, i % 3 == 0,
        if (i % 7 == 0) None else Some(s"note-$i"),
        Option.empty[String], i % 100)
    }.toDF("id", "month", "ts", "ntz", "d", "f", "dbl", "b",
        "note", "allnull", "small")
      .withColumn("dec", (col("dbl") * 100).cast("decimal(20,2)"))
  }

  test("footer harvest ≡ aggregate stats on a wide-typed multi-file dir") {
    val dir = freshRoot("harvest") + "/__data"
    // hand-built layout (NOT the commit path): several files per
    // partition dir so the harvest must FOLD chunk stats across files,
    // including files where a nullable column happens to be all-null
    val df = wideTable
    org.apache.spark.sql.GraftPlanBridge.withSessionConf(
        df.withColumn("__part", col("month")).repartition(4),
        "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS")
      .write.partitionBy("__part").parquet(dir)
    val filesPerPart = Option(new java.io.File(s"$dir/__part=2024-01")
      .listFiles()).get.count(_.getName.endsWith(".parquet"))
    assert(filesPerPart > 1, "fixture must exercise the multi-file fold")
    val harvested = SnapshotStore.harvestStats(spark, dir, df.schema)
    val aggregated = SnapshotStore.collectStats(spark, dir, df.schema)
    assert(harvested.keySet === Set("2024-01", "2024-02"))
    for (part <- harvested.keySet) {
      val h = harvested(part); val a = aggregated(part)
      assert(h.rows === a.rows, s"row count for $part")
      assert(h.cols === a.cols,
        s"footer stats for $part diverge from the aggregate")
      // the harvest actually covered the interesting types
      for (c <- Seq("id", "ts", "ntz", "d", "f", "dbl", "b", "dec",
          "note", "small"))
        assert(h.cols.contains(c), s"missing harvested stats for $c")
      assert(!h.cols.contains("allnull"), "all-null column carries no stats")
    }
  }

  test("the commit path harvests timestamp stats (MICROS, not INT96) " +
      "and drops NaN-poisoned float columns instead of guessing") {
    import spark.implicits._
    val root = freshRoot("micros")
    val df = wideTable.withColumn("poison",
      when(col("id") === 5L, lit(Double.NaN)).otherwise(col("dbl")))
    SnapshotStore.write(df, root, partCol = "month", sortCol = "id")
    val m = SnapshotStore.current(root).get
    val jan = m.entries.find(_.value == "2024-01").get.stats.get
    // INT96 records no chunk statistics — a ts entry here proves the
    // snapshot writer switched the encoding to TIMESTAMP_MICROS
    assert(jan.cols("ts").min.endsWith("Z"))
    assert(jan.cols("ts").min < jan.cols("ts").max)
    assert(jan.cols("ntz").min.startsWith("2024-03-0"))
    // parquet-mr folds NaN through Math.min/max, poisoning the chunk
    // stats — the harvest drops the column (conservative: consumers
    // treat stats-less as always-candidate) rather than recording NaN
    assert(!jan.cols.contains("poison"),
      "NaN-poisoned column must carry no stats")
    assert(jan.cols.contains("dbl"), "clean double still harvested")
    // and the files really are MICROS: re-reading them yields the
    // exact timestamps written (no NANOS truncation surprises)
    val back = SnapshotStore.read(spark, root)
      .filter(col("id") === 1L).select("ts").as[java.sql.Timestamp].head()
    assert(back === java.sql.Timestamp.valueOf("2024-01-02 07:31:05"))
  }

  test("incremental commits must match the recorded layout") {
    import spark.implicits._
    val root = freshRoot("layout")
    SnapshotStore.write(keyedTable, root, partCol = "month", sortCol = "id")
    val patch = Seq((5L, "2024-01", "x", 1.0)).toDF("id", "month", "note", "amount")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.appendPartitions(patch, root,
        partCol = "note", sortCol = "id")
    }
    assert(e.getMessage.contains("recorded layout"))
    // a full write may redefine the layout
    SnapshotStore.write(keyedTable, root, partCol = "note", sortCol = "id")
    assert(SnapshotStore.tableLayout(SnapshotStore.current(root).get)
      === Some(("note", "id")))
  }
}
