package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-column / transform PARTITION SPECS ([[PartitionSpec]]):
  * two-identity-column layouts, bucket(n, col) transforms, the token
  * escaping that keeps composite tokens unambiguous, and the full DML
  * surface (partition-granular DELETE pruning on BOTH columns,
  * row-level UPDATE/DELETE, MERGE) over a multipart table. */
class SnapshotMultipartSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_multipart_$tag").toString

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("spec parsing: legacy single column, multi identity, bucket; " +
      "canonical form is parse's fixed point") {
    val s1 = PartitionSpec.parse("m")
    assert(s1.isSingleIdentity && s1.canonical === "m")
    val s2 = PartitionSpec.parse("m, region")
    assert(s2.canonical === "m,region")
    assert(s2.identityCols === Seq("m", "region"))
    val s3 = PartitionSpec.parse("m, BUCKET( 16 , id )")
    assert(s3.canonical === "m,bucket(16,id)")
    assert(s3.hasBucket && s3.sourceCols === Seq("m", "id"))
    assert(PartitionSpec.parse(s3.canonical).canonical === s3.canonical)
    val s4 = PartitionSpec.parse("DAYS( ts ), truncate(3, name)")
    assert(s4.canonical === "days(ts),truncate(3,name)")
    assert(s4.zoneSensitiveCols === Seq("ts"))
    intercept[IllegalArgumentException](PartitionSpec.parse("zoom(ts)"))
    intercept[IllegalArgumentException](PartitionSpec.parse("m,,x"))
  }

  test("token escaping: composite tokens with '/' and '%' in values " +
      "roundtrip through write + readWhere exactly") {
    val root = mkRoot("esc")
    val df = Seq(
      ("a/b", "r%1", 1L, 1),
      ("a/b", "r/2", 2L, 2),
      ("c", "r%2F", 3L, 3) // a value spelling the escape sequence itself
    ).toDF("m", "region", "id", "v")
    SnapshotStore.write(df, root, "m,region", "id")
    val m = SnapshotStore.current(root).get
    val spec = PartitionSpec.parse("m,region")
    // tokens split back to the exact original component values
    val comps = m.entries.map(e => spec.splitToken(e.value).get).toSet
    assert(comps === Set(Seq("a/b", "r%1"), Seq("a/b", "r/2"),
      Seq("c", "r%2F")))
    // value-addressed pruning matches the rendered token exactly
    val tok = spec.joinComponents(Seq("a/b", "r/2"))
    val got = SnapshotStore.readWhere(spark, root, Set(tok))
    assert(got.select("id").as[Long].collect().toSeq === Seq(2L))
    // whole-table read is unaffected by escaping
    assert(SnapshotStore.read(spark, root).count() === 3L)
  }

  test("two-identity-column table: SQL CREATE/INSERT, partition-" +
      "granular DELETE prunes on both columns (metadata-only), and a " +
      "single-column predicate drops the matching partition set") {
    val wh = mkRoot("wh2id")
    register("snapmp1", wh)
    spark.sql(
      """CREATE TABLE snapmp1.t (id BIGINT, m STRING, region STRING, v INT)
        |PARTITIONED BY (m, region)
        |TBLPROPERTIES ('sort_col' = 'id')""".stripMargin)
    val root = s"$wh/t"
    assert(SnapshotStore.tableLayout(SnapshotStore.current(root).get)
      === Some(("m,region", "id")))
    spark.sql("INSERT INTO snapmp1.t VALUES " +
      "(1, '2024-01', 'eu', 1), (2, '2024-01', 'us', 2), " +
      "(3, '2024-02', 'eu', 3), (4, '2024-02', 'us', 4)")
    val pre = SnapshotStore.current(root).get
    assert(pre.entries.size === 4)
    // DELETE constrained on BOTH partition columns: exactly one
    // partition drops, METADATA-ONLY (every surviving entry carries by
    // reference — same dirs as before)
    spark.sql(
      "DELETE FROM snapmp1.t WHERE m = '2024-01' AND region = 'us'")
    val post = SnapshotStore.current(root).get
    assert(post.entries.size === 3)
    assert(post.entries.map(_.dir).toSet.subsetOf(
      pre.entries.map(_.dir).toSet),
      "partition-granular DELETE must carry surviving dirs by reference")
    assert(spark.sql("SELECT sum(v) FROM snapmp1.t").head().getLong(0)
      === 8L)
    // DELETE constrained on ONE column drops every matching partition
    spark.sql("DELETE FROM snapmp1.t WHERE region = 'eu'")
    val post2 = SnapshotStore.current(root).get
    assert(post2.entries.size === 1)
    assert(post2.entries.map(_.dir).toSet.subsetOf(
      pre.entries.map(_.dir).toSet))
    assert(spark.sql("SELECT sum(v) FROM snapmp1.t").head().getLong(0)
      === 4L)
    // OR across the two columns is still partition-granular
    spark.sql("INSERT INTO snapmp1.t VALUES (5, '2024-03', 'ap', 5)")
    spark.sql(
      "DELETE FROM snapmp1.t WHERE m = '2024-02' OR region = 'ap'")
    assert(spark.sql("SELECT count(*) FROM snapmp1.t").head().getLong(0)
      === 0L)
  }

  test("bucket spec (m, bucket(4, id)): rows route to stable buckets; " +
      "a predicate on the bucketed column is NOT partition-granular " +
      "(row-level path serves it exactly); UPDATE moving the bucket " +
      "column restates source and landing buckets") {
    val wh = mkRoot("whbkt")
    register("snapmp2", wh)
    spark.sql(
      """CREATE TABLE snapmp2.t (id BIGINT, m STRING, v INT)
        |PARTITIONED BY (m, bucket(4, id))
        |TBLPROPERTIES ('sort_col' = 'id')""".stripMargin)
    val root = s"$wh/t"
    spark.sql("INSERT INTO snapmp2.t VALUES " +
      (1L to 16L).map(i => s"($i, '2024-01', ${i * 10})").mkString(", "))
    val m0 = SnapshotStore.current(root).get
    val spec = PartitionSpec.parse("m,bucket(4,id)")
    // every token is (month, bucket∈[0,4)) and buckets match Spark's
    // own hash routing
    val toks = m0.entries.map(e => spec.splitToken(e.value).get)
    assert(toks.forall(c => c.head === "2024-01" &&
      (0 until 4).map(_.toString).contains(c(1))))
    val expected = spark.range(1, 17)
      .select(pmod(hash(col("id")), lit(4)).cast("string").as("b"))
      .distinct().as[String].collect().toSet
    assert(toks.map(_(1)).toSet === expected)
    // row-level DELETE on the bucketed column: the whole bucket holds
    // other ids, so the partition-drop path must NOT serve it — but
    // the result is still row-exact
    spark.sql("DELETE FROM snapmp2.t WHERE id = 7")
    assert(spark.sql("SELECT count(*) FROM snapmp2.t").head().getLong(0)
      === 15L)
    assert(spark.sql("SELECT count(*) FROM snapmp2.t WHERE id = 7")
      .head().getLong(0) === 0L)
    // other ids sharing bucket hash(7)%4 survived
    val bucketOf7 = spark.range(7, 8)
      .select(pmod(hash(col("id")), lit(4))).head().getInt(0)
    val survivors = spark.sql("SELECT id FROM snapmp2.t").as[Long]
      .collect().filter(i => math.floorMod(
        org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
          i, org.apache.spark.sql.types.LongType, 42).toInt, 4)
        == bucketOf7)
    assert(survivors.nonEmpty,
      "deleting one id must not drain its whole bucket")
    // UPDATE that moves a row across buckets (SET id): source and
    // landing buckets both restate; the row lands exactly once
    spark.sql("UPDATE snapmp2.t SET id = 100 WHERE id = 8")
    assert(spark.sql("SELECT count(*) FROM snapmp2.t WHERE id = 100")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM snapmp2.t WHERE id = 8")
      .head().getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM snapmp2.t").head().getLong(0)
      === 15L)
    // v of the moved row carried
    assert(spark.sql("SELECT v FROM snapmp2.t WHERE id = 100")
      .head().getInt(0) === 80)
  }

  test("MERGE INTO a two-identity-column table: matched update, " +
      "source-routed insert, delete — one atomic commit, untouched " +
      "partitions carried by reference") {
    val wh = mkRoot("whmrg")
    register("snapmp3", wh)
    spark.sql(
      """CREATE TABLE snapmp3.t (id BIGINT, m STRING, region STRING,
        |  price DOUBLE)
        |PARTITIONED BY (m, region)
        |TBLPROPERTIES ('sort_col' = 'id')""".stripMargin)
    val root = s"$wh/t"
    spark.sql("INSERT INTO snapmp3.t VALUES " +
      "(1, '2024-01', 'eu', 10.0), (2, '2024-01', 'us', 20.0), " +
      "(3, '2024-02', 'eu', 30.0)")
    val pre = SnapshotStore.current(root).get
    Seq(
      (2L, "2024-01", "us", 25.0, false), // update in place
      (4L, "2024-02", "us", 40.0, false), // insert into a NEW partition
      (3L, "2024-02", "eu", 0.0, true)    // delete (drains its partition)
    ).toDF("id", "m", "region", "price", "del")
      .createOrReplaceTempView("mp_changes")
    spark.sql(
      """MERGE INTO snapmp3.t AS t USING mp_changes AS s ON t.id = s.id
        |WHEN MATCHED AND s.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET price = s.price
        |WHEN NOT MATCHED AND NOT s.del THEN INSERT
        |  (id, m, region, price) VALUES (s.id, s.m, s.region, s.price)
        |""".stripMargin)
    val got = spark.sql(
      "SELECT id, m, region, price FROM snapmp3.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(
      (1L, "2024-01", "eu", 10.0),
      (2L, "2024-01", "us", 25.0),
      (4L, "2024-02", "us", 40.0)))
    // the untouched (2024-01, eu) partition carried by reference
    val post = SnapshotStore.current(root).get
    val spec = PartitionSpec.parse("m,region")
    val untouchedTok = spec.joinComponents(Seq("2024-01", "eu"))
    assert(post.entries.filter(_.value == untouchedTok).map(_.dir) ===
      pre.entries.filter(_.value == untouchedTok).map(_.dir))
    // the drained (2024-02, eu) partition's entry dropped
    assert(!post.entries.map(_.value)
      .contains(spec.joinComponents(Seq("2024-02", "eu"))))
  }

  test("layout checks: an append restating a DIFFERENT spec refuses; " +
      "spelling variance of the same spec passes (canonical compare)") {
    val root = mkRoot("layout")
    val df = Seq((1L, "2024-01", "eu", 1)).toDF("id", "m", "region", "v")
    SnapshotStore.write(df, root, "m,bucket(4,id)", "id")
    intercept[IllegalArgumentException] {
      SnapshotStore.appendPartitions(df, root, "m,region", "id")
    }
    // same spec, different spelling: passes
    SnapshotStore.appendPartitions(df, root, "m , bucket( 4 , id )", "id")
    assert(SnapshotStore.read(spark, root).count() === 2L)
  }

  test("time + truncate transforms: days(ts) tokens are calendar days " +
      "in time order, truncate(w, s) groups by prefix; type-mismatched " +
      "transforms refuse at the commit boundary") {
    val root = mkRoot("timetr")
    val df = Seq(
      (1L, java.time.LocalDateTime.of(2024, 1, 1, 5, 0), "alpha", 1),
      (2L, java.time.LocalDateTime.of(2024, 1, 1, 23, 59), "alps", 2),
      (3L, java.time.LocalDateTime.of(2024, 1, 2, 0, 0), "beta", 3)
    ).toDF("id", "ts", "name", "v")
    SnapshotStore.write(df, root, "days(ts),truncate(2,name)", "id")
    val m = SnapshotStore.current(root).get
    val spec = PartitionSpec.parse("days(ts),truncate(2,name)")
    val comps = m.entries.map(e => spec.splitToken(e.value).get).toSet
    assert(comps === Set(Seq("2024-01-01", "al"), Seq("2024-01-02", "be")))
    // both 'alpha' and 'alps' landed in the shared 'al' prefix token
    val alTok = spec.joinComponents(Seq("2024-01-01", "al"))
    assert(SnapshotStore.readWhere(spark, root, Set(alTok))
      .count() === 2L)
    // row-level DML over the transform layout stays exact
    val sess = spark
    graft.operators.RowLevelOps.deleteRowsCommit(sess, root,
      col("id") === 2L, "days(ts),truncate(2,name)", "id")
    assert(SnapshotStore.read(spark, root).count() === 2L)
    // type mismatches refuse loudly at commit, not as garbage tokens
    intercept[IllegalArgumentException] {
      SnapshotStore.write(df, mkRoot("bad1"), "days(name)", "id")
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.write(df, mkRoot("bad2"), "truncate(2,id)", "v")
    }
  }

  test("days() over a TZ timestamp is zone-sensitive: a session whose " +
      "zone renders differently is refused for token-addressed DML") {
    val root = mkRoot("tzdays")
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1))
      .toDF("id", "ts", "v")
    SnapshotStore.write(df, root, "days(ts)", "id")
    val m = SnapshotStore.current(root).get
    // same zone passes…
    SnapshotStore.checkTokenRenderZone(spark, m, "days(ts)", "UPDATE")
    // …a differently-rendering zone refuses (the tokens were rendered
    // under UTC; Kolkata shifts calendar days)
    val shifted = org.apache.spark.sql.GraftPlanBridge
      .sessionWithConf(spark, "spark.sql.session.timeZone" -> "Asia/Kolkata")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.checkTokenRenderZone(shifted, m, "days(ts)", "UPDATE")
    }
    assert(e.getMessage.contains("timezone"))
  }

  test("NULL in any partition source column is rejected at commit " +
      "(null bucket components must not silently file under hash(seed))") {
    val root = mkRoot("nulls")
    val df = Seq((Some(1L), "2024-01", 1), (None, "2024-01", 2))
      .toDF("id", "m", "v")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.write(df, root, "m,bucket(4,id)", "v")
    }
    assert(e.getMessage.contains("NULL"))
  }
}
