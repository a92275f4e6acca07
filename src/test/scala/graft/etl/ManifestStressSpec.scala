package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Many-partition manifest stress: the manifest layer's costs must be
  * O(entries) — one text line (+ stats JSON) per partition dir — and
  * the publish must stay a single O(1) pointer swap whatever the entry
  * count. 5 000 partitions is ~50× the month-grain tables the lanes
  * use and the shape a date+tenant partitioning reaches quickly at
  * 100 TB. */
class ManifestStressSpec extends SparkSpec {

  test("5k-partition table: commit, incremental append, pruned read, " +
      "time travel and expire all stay manifest-scale") {
    val n = 5000
    // processScratchRoot so dead-pid leftovers (5k tiny dirs) get swept
    val root = graft.util.Fs.processScratchRoot("manifeststress", "")
    graft.util.Fs.deleteRecursively(new java.io.File(root))
    val df = spark.range(n).select(
      col("id"),
      col("id").cast("string").as("p"),
      (col("id") * 2).as("v"))
    val id1 = SnapshotStore.write(df, root, partCol = "p", sortCol = "id")
    val m1 = SnapshotStore.current(root).get
    assert(m1.entries.size === n)
    // every entry carries write-time stats (rows + min/max)
    assert(m1.entries.forall(_.stats.exists(_.rows == 1L)))
    // the manifest is O(entries): ~a couple hundred bytes per entry,
    // nowhere near data-scale
    val manifestBytes = new java.io.File(s"$root/MANIFEST").length()
    assert(manifestBytes < 2L * 1024 * 1024,
      s"manifest grew to $manifestBytes bytes for $n entries")

    // an incremental append touches ONE partition: the other n entries
    // carry forward BY REFERENCE (identical dir strings — no rewrite)
    import spark.implicits._
    val extra = Seq((5000L, "5000", 10000L)).toDF("id", "p", "v")
    SnapshotStore.appendPartitions(extra, root, partCol = "p",
      sortCol = "id")
    val m2 = SnapshotStore.current(root).get
    assert(m2.entries.size === n + 1)
    assert(m1.entries.map(_.dir).toSet.subsetOf(m2.entries.map(_.dir).toSet),
      "append restated carried entries instead of referencing them")

    // manifest-entry pruning reads exactly one dir out of 5 001
    val one = SnapshotStore.readWhere(spark, root, _ == "4321")
    assert(one.inputFiles.length === 1)
    assert(one.select("v").head().getLong(0) === 8642L)

    // full read and time travel stay exact
    assert(SnapshotStore.read(spark, root).count() === (n + 1).toLong)
    assert(SnapshotStore.read(spark, root, asOf = Some(id1)).count()
      === n.toLong)

    // expire to the current pointer only: drops manifest-1 but not one
    // byte of data (every dir is still referenced by the live pointer)
    SnapshotStore.expire(root, keepLast = 1)
    assert(SnapshotStore.read(spark, root).count() === (n + 1).toLong)
    assert(!new java.io.File(s"$root/manifests/manifest-$id1").exists())

    // this run's 5k-dir tree is large for tmp — reclaim it eagerly
    // rather than waiting for a future run's dead-pid sweep
    graft.util.Fs.deleteRecursively(new java.io.File(root))
  }
}
