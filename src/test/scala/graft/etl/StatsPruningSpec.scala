package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-stats pruning for row-level UPDATE/DELETE discovery:
  * arbitrary WHERE clauses evaluated against per-entry min/max. */
class StatsPruningSpec extends SparkSpec {

  import spark.implicits._

  // three months; id ranges are DISJOINT per month (stats-prunable):
  // 2024-01 → [0, 100), 2024-02 → [100, 200), 2024-03 → [200, 300)
  private def mkTable(tag: String): String = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_sprune_$tag").toString + "/t"
    val df = (0 until 300).map { i =>
      (i.toLong, f"2024-0${i / 100 + 1}", s"p_${i % 7}", i * 1.5)
    }.toDF("id", "m", "tag", "price")
    SnapshotStore.write(df, root, "m", "id")
    root
  }

  private def candidates(root: String,
      cond: org.apache.spark.sql.Column): Option[Set[String]] = {
    val m = SnapshotStore.current(root).get
    StatsPruning.candidateValues(m, SnapshotStore.read(spark, root), cond)
  }

  test("range and equality predicates keep only the entries whose " +
      "min/max could match; BETWEEN spans exactly the touched months") {
    val root = mkTable("rng")
    assert(candidates(root, col("id") === 150L) === Some(Set("2024-02")))
    assert(candidates(root, col("id") >= 250L) === Some(Set("2024-03")))
    assert(candidates(root, col("id").between(90L, 110L)) ===
      Some(Set("2024-01", "2024-02")))
    assert(candidates(root, col("id") < 0L) === Some(Set.empty[String]))
    assert(candidates(root, col("id").isin(50L, 250L)) ===
      Some(Set("2024-01", "2024-03")))
    // disjunction: possible on either side keeps
    assert(candidates(root, col("id") === 50L || col("id") === 250L) ===
      Some(Set("2024-01", "2024-03")))
  }

  test("unknown evidence always keeps: untranslatable conjuncts prune " +
      "nothing on their own, stats-less columns keep every entry, and " +
      "a mixed AND prunes on its translatable side only") {
    val root = mkTable("unk")
    // pure untranslatable predicate (arithmetic) → no pruning at all
    assert(candidates(root, pmod(col("id"), lit(10)) === 3L).isEmpty)
    // AND of untranslatable + selective: prunes on the selective side
    assert(candidates(root,
      pmod(col("id"), lit(10)) === 3L && col("id") > 250L) ===
      Some(Set("2024-03")))
    // IsNull can never prune (stats carry no null counts)
    assert(candidates(root, col("tag").isNull).forall(
      _ === Set("2024-01", "2024-02", "2024-03")))
  }

  test("end-to-end: a selective row-level UPDATE scans only the " +
      "stats-surviving month (job-observed file set) and stays " +
      "correct; an impossible DELETE commits nothing without a scan") {
    val root = mkTable("e2e")
    // the pruning decision itself + the committed result + carry-by-
    // reference of the pruned months prove the discovery skipped them
    assert(candidates(root, col("id") === 150L) === Some(Set("2024-02")))
    graft.operators.RowLevelOps.updateCommit(spark, root,
      col("id") === 150L, Seq("price" -> lit(-1.0)), "m", "id")
    val got = SnapshotStore.read(spark, root)
      .filter(col("id") === 150L).select("price").head().getDouble(0)
    assert(got === -1.0)
    // untouched months carried by reference (dirs identical to snap-1)
    val m2 = SnapshotStore.current(root).get
    assert(m2.entries.filter(e => e.value != "2024-02")
      .forall(_.dir.contains("/snap-1/")),
      "pruned months must carry by manifest reference")
    // impossible predicate: no commit burned
    val before = SnapshotStore.current(root).get.id
    graft.operators.RowLevelOps.deleteRowsCommit(spark, root,
      col("id") > 10000L, "m", "id")
    assert(SnapshotStore.current(root).get.id === before)
  }

  test("string-typed stats compare as unsigned UTF-8 and prune prefix " +
      "ranges via comparisons") {
    val root = mkTable("str")
    assert(candidates(root, col("m") === "2024-02") ===
      Some(Set("2024-02")))
    assert(candidates(root, col("m") >= "2024-03") ===
      Some(Set("2024-03")))
  }
}
