package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over snapshot tables: with
  * `spark.sql.sources.v2.bucketing.enabled`, a bucket/identity-specced
  * scan reports `KeyGroupedPartitioning` and plans one keyed input
  * partition per partition value, so co-layout equi-joins run with no
  * exchange under the join. Off by default — plans are unchanged
  * unless the session opts in. */
class SnapshotSpjSpec extends SparkSpec {

  import spark.implicits._

  private def mkWh(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_spj_$tag").toString

  private def rows(n: Int) = (1 to n).map(i =>
    (i.toLong, s"2024-0${i % 3 + 1}", i * 1.0)).toDF("id", "m", "price")

  private def spjSession(wh: String, cat: String) = {
    val clone = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(spark,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    clone.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftSnapshotCatalog].getName)
    clone.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    clone
  }

  private def executedPlan(
      df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan.toString
      case other => other.toString
    }
  }

  private def count(s: String, needle: String): Int = {
    var n = 0; var i = s.indexOf(needle)
    while (i >= 0) { n += 1; i = s.indexOf(needle, i + 1) }
    n
  }

  test("co-bucketed tables join with zero exchanges and exact rows " +
      "when the session opts in; identical query shuffles without it") {
    val wh = mkWh("bucket")
    SnapshotStore.write(rows(40), s"$wh/a", "bucket(4,id)", "m")
    SnapshotStore.write(
      rows(40).select(col("id"), (col("price") * 2).as("p2")),
      s"$wh/b", "bucket(4,id)", "id")
    val on = spjSession(wh, "spjon")
    val q = "SELECT a.id, a.price, b.p2 FROM %s.a a " +
      "JOIN %s.b b ON a.id = b.id"
    val dfOn = on.sql(q.format("spjon", "spjon"))
    val planOn = executedPlan(dfOn)
    assert(planOn.contains("SortMergeJoin"), planOn)
    assert(count(planOn, "Exchange") === 0,
      s"the co-bucketed join must be exchange-free:\n$planOn")
    assert(dfOn.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet ===
      (1 to 40).map(i => (i.toLong, i * 1.0, i * 2.0)).toSet,
      "one keyed task per bucket must still see every co-bucketed row")
    // default-off: same query through a non-opted catalog shuffles
    spark.conf.set("spark.sql.catalog.spjoff",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjoff.warehouse", wh)
    val off = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    off.conf.set("spark.sql.catalog.spjoff",
      classOf[GraftSnapshotCatalog].getName)
    off.conf.set("spark.sql.catalog.spjoff.warehouse", wh)
    val planOff = executedPlan(off.sql(q.format("spjoff", "spjoff")))
    assert(count(planOff, "Exchange") > 0,
      s"without the opt-in the join must keep its shuffles:\n$planOff")
  }

  test("identity+bucket composite specs report a compound key; " +
      "a join on both columns is exchange-free") {
    val wh = mkWh("comp")
    SnapshotStore.write(rows(30), s"$wh/a", "m,bucket(2,id)", "id")
    SnapshotStore.write(
      rows(30).select(col("id"), col("m"), (col("price") + 1).as("p1")),
      s"$wh/b", "m,bucket(2,id)", "id")
    val on = spjSession(wh, "spjcomp")
    val df = on.sql(
      """SELECT a.id, a.m, a.price, b.p1 FROM spjcomp.a a
        |JOIN spjcomp.b b ON a.id = b.id AND a.m = b.m""".stripMargin)
    val plan = executedPlan(df)
    assert(count(plan, "Exchange") === 0,
      s"compound-key SPJ must be exchange-free:\n$plan")
    assert(df.count() === 30L)
  }

  test("time/truncate specs and mixed-spec (evolved) tables do NOT " +
      "report a partitioning — plans stay correct, just shuffled") {
    val wh = mkWh("skip")
    val withTs = (1 to 10).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(s"2024-0${i % 3 + 1}-15 10:00:00"),
      i * 1.0)).toDF("id", "ts", "price")
    SnapshotStore.write(withTs, s"$wh/t", "months(ts)", "id")
    SnapshotStore.write(rows(10), s"$wh/e", "m", "id")
    SnapshotStore.evolvePartitionSpec(s"$wh/e", "m,bucket(2,id)")
    val on = spjSession(wh, "spjskip")
    val p1 = executedPlan(on.sql(
      "SELECT t1.id FROM spjskip.t t1 JOIN spjskip.t t2 ON t1.id = t2.id"))
    assert(count(p1, "Exchange") > 0, "time-transform spec: no SPJ")
    val dfE = on.sql(
      "SELECT e1.id FROM spjskip.e e1 JOIN spjskip.e e2 ON e1.id = e2.id")
    assert(count(executedPlan(dfE), "Exchange") > 0,
      "mixed-spec table: no SPJ")
    assert(dfE.count() === 10L)
  }

  test("MISMATCHED partition value sets still join exchange-free " +
      "(pushPartValues fills the gaps); the partially-clustered skew " +
      "conf keeps rows exact") {
    val wh = mkWh("gap")
    // a: months 2024-01..03; b: only 02..03 — one whole value missing
    SnapshotStore.write(rows(30), s"$wh/a", "m", "id")
    SnapshotStore.write(
      rows(30).filter(col("m") =!= "2024-01")
        .select(col("id"), col("m"), (col("price") * 3).as("p3")),
      s"$wh/b", "m", "id")
    // join keys (m, id) are a SUPERSET of the partition key (m):
    // co-partition on the subset needs the opt-out below (default-on
    // strictness would shuffle even with matching value sets)
    val on0 = spjSession(wh, "spjgap")
    val on = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(on0,
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    on.conf.set("spark.sql.catalog.spjgap",
      classOf[GraftSnapshotCatalog].getName)
    on.conf.set("spark.sql.catalog.spjgap.warehouse", wh)
    val q = """SELECT a.id, a.m, b.p3 FROM spjgap.a a
              |JOIN spjgap.b b ON a.m = b.m AND a.id = b.id""".stripMargin
    val df = on.sql(q)
    val plan = executedPlan(df)
    assert(count(plan, "Exchange") === 0,
      s"a missing partition value must not force a shuffle " +
        s"(pushPartValues):\n$plan")
    val expect = (1 to 30).filter(i => i % 3 + 1 != 1)
      .map(i => (i.toLong, s"2024-0${i % 3 + 1}", i * 3.0)).toSet
    assert(df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet === expect)
    // skew handling: partially-clustered distribution replicates the
    // smaller side's groups — rows must stay EXACT under it (the conf
    // changes the physical grouping, never the result)
    val pc = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(on,
      "spark.sql.sources.v2.bucketing.partiallyClustered" +
        ".distribution.enabled" -> "true")
    pc.conf.set("spark.sql.catalog.spjgap",
      classOf[GraftSnapshotCatalog].getName)
    pc.conf.set("spark.sql.catalog.spjgap.warehouse", wh)
    val dfPc = pc.sql(q)
    assert(dfPc.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet === expect,
      "partially-clustered SPJ changed the result set")
  }
}
