package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Round-4 battery lanes: grouping sets, range frames, the array-lambda
  * battery, and the end-to-end funnel. */
class BatteryFunnelSpec extends SparkSpec {

  test("grouping sets: exactly the requested sets, flags disambiguate") {
    val rows = RelationalQueries.q36GroupingSets(spark, sf()).collect()
    val byFlags = rows.groupBy(r => (r.getInt(2), r.getInt(3)))
    // (0,1): per-returnflag; (1,0): per-linestatus; (1,1): grand total;
    // the (0,0) pair slice must NOT exist — that's what distinguishes
    // this set list from CUBE
    assert(byFlags.keySet === Set((0, 1), (1, 0), (1, 1)))
    assert(byFlags((1, 1)).length === 1)
    val total = Tables.lineitem(spark, sf()).count()
    assert(byFlags((1, 1)).head.getLong(4) === total)
    assert(byFlags((0, 1)).map(_.getLong(4)).sum === total)
    assert(byFlags((1, 0)).map(_.getLong(4)).sum === total)
  }

  test("range frame: trailing-30-day sum matches a per-row replay") {
    val out = RelationalQueries.q37RangeFrame(spark, sf())
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val base = Tables.orders(spark, sf()).select(
      col("o_orderkey"), col("o_orderpriority"),
      datediff(col("o_orderdate").cast("date"),
        to_date(lit("1992-01-01"))).cast("long").as("day_idx"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // brute-force replay on a sample: all orders of same prio within
    // [day-29, day] — value-defined frame, so intra-day order never
    // matters
    base.take(50).foreach { case (id, prio, day, _) =>
      val peers = base.filter(o =>
        o._2 == prio && o._3 >= day - 29 && o._3 <= day)
      val (_, gotDay, gotSum, gotCnt) = out(id)
      assert(gotDay === day)
      assert(gotSum === peers.map(_._4).sum, s"order $id")
      assert(gotCnt === peers.length.toLong, s"order $id")
    }
  }

  test("array battery equals the explode-based computation") {
    val lane = PipelineQueries.arrayFuncs(spark, sf())
    val toks = Tables.documents(spark, sf())
      .select(col("doc_id"),
        explode(TF.tokens(TF.normalize(col("text")))).as("t"))
    val viaExplode = toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_toks"),
      sum(when(length(col("t")) > 3, 1L).otherwise(0L)).as("n_long"),
      sum(length(col("t")).cast("long")).as("total_chars"),
      max(length(col("t"))).cast("long").as("max_len"),
      max(when(length(col("t")) >= 8, 1).otherwise(0)).as("has_long8"),
      min(col("t")).as("first_sorted"))
    val joined = lane.alias("a").join(viaExplode.alias("b"), "doc_id")
    assert(joined.count() === lane.count())
    val mismatch = joined.filter(
      col("a.n_toks") =!= col("b.n_toks") ||
        col("a.n_long") =!= col("b.n_long") ||
        col("a.total_chars") =!= col("b.total_chars") ||
        col("a.max_len") =!= col("b.max_len") ||
        col("a.has_long8") =!= col("b.has_long8") ||
        col("a.first_sorted") =!= col("b.first_sorted"))
    assert(mismatch.count() === 0)
  }

  test("array battery: pos_weighted on a hand example") {
    // tokens "ab c def" → lens (2,1,3) × pos (1,2,3) → 2+2+9 = 13
    import spark.implicits._
    val one = Seq((1L, "ab c def")).toDF("doc_id", "text")
      .select(col("doc_id"),
        TF.tokens(TF.normalize(col("text"))).as("toks"))
      .select(col("doc_id"),
        aggregate(
          zip_with(
            transform(col("toks"), t => length(t).cast("long")),
            sequence(lit(1L), size(col("toks")).cast("long")),
            (l, i) => l * i),
          lit(0L), (acc, x) => acc + x).as("pos_weighted"))
    assert(one.head().getLong(1) === 13L)
  }

  test("pit join: features come from the regime in force 30 days back") {
    val out = RelationalQueries.q38PitJoin(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val orders = Tables.orders(spark, sf()).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("date").as("odate"),
      col("o_orderpriority").as("prio"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate, r.getString(3)))
    assert(out.size === orders.length)
    // replay per order: regime = priority of the latest run whose first
    // order date <= (odate - 30); runs built per customer in
    // (date, orderkey) order
    val byCust = orders.groupBy(_._2)
    orders.take(80).foreach { case (oid, cust, odate, _) =>
      val hist = byCust(cust).sortBy(o => (o._3.toEpochDay, o._1))
      val runs = hist.foldLeft(Vector.empty[(String, java.time.LocalDate)]) {
        case (acc, (_, _, d0, p)) =>
          if (acc.nonEmpty && acc.last._1 == p) acc
          else acc :+ (p, d0) // run start = first date of the run
      }
      val pit = odate.minusDays(30)
      val want = runs.zipWithIndex
        .filter { case ((_, from), _) => !from.isAfter(pit) }
        .lastOption
      val (gotPrio, gotRun) = out(oid)
      want match {
        case Some(((p, _), i)) =>
          assert(gotPrio === p, s"order $oid")
          assert(gotRun === (i + 1).toLong, s"order $oid run")
        case None =>
          assert(gotPrio === "NONE" && gotRun === -1L, s"order $oid miss")
      }
    }
    // the pre-history miss case must actually occur in the data
    assert(out.values.exists(_._1 == "NONE"))
  }

  test("nested battery equals the flat window/aggregate computation") {
    val nested = RelationalQueries.q39Nested(spark, sf())
    val flat = Tables.orders(spark, sf())
      .select(col("o_custkey").as("custkey"),
        col("o_orderdate").cast("date").as("odate"),
        col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("custkey")
      .agg(count(lit(1)).as("n_orders"),
        min(col("odate")).as("first_date"),
        max(struct(col("odate"), col("okey"), col("cents"))).as("last"),
        sum(col("cents")).as("total_cents"))
      .select(col("custkey"), col("n_orders"), col("first_date"),
        col("last.odate").as("last_date"),
        col("last.cents").as("last_cents"), col("total_cents"))
    assert(nested.count() === flat.count())
    assert(nested.exceptAll(flat).count() === 0)
    assert(flat.exceptAll(nested).count() === 0)
  }

  test("unpivot: melt is pivot's inverse, totals reconcile per measure") {
    val out = RelationalQueries.q40Unpivot(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val li = Tables.lineitem(spark, sf())
    val n = li.count()
    assert(out.keySet === Set("l_quantity", "l_extendedprice",
      "l_discount", "l_tax"))
    assert(out.values.forall(_._1 === n))
    val direct = li.agg(
      round(sum(col("l_quantity").cast("decimal(38,8)")).cast("double"), 4),
      round(sum(col("l_tax").cast("decimal(38,8)")).cast("double"), 4))
      .head()
    assert(out("l_quantity")._2 === direct.getDouble(0))
    assert(out("l_tax")._2 === direct.getDouble(1))
  }

  test("observe lane: flow metrics equal direct aggregates") {
    val r = RelationalQueries.q41Observe(spark, sf()).head()
    val li = Tables.lineitem(spark, sf())
    assert(r.getLong(0) === li.count())
    assert(r.getLong(2) ===
      li.filter(col("l_returnflag") === "A").count())
    val direct = li.agg(round(sum(col("l_quantity")
      .cast("decimal(38,8)")).cast("double"), 4)).head().getDouble(0)
    assert(r.getDouble(1) === direct)
  }

  test("funnel: monotone survival and stage cross-checks") {
    val rows = PipelineQueries.pipelineFunnel(spark, sf())
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sf())
    assert(rows("0_ingest")._1 === docs.count())
    // docs survive monotonically through the filter stages
    val order = Seq("0_ingest", "1_nonempty", "2_langid", "3_quality",
      "4_dedup")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(a)._1 >= rows(b)._1, s"$a -> $b")
      assert(rows(a)._2 >= rows(b)._2, s"$a -> $b tokens")
    }
    // capped stage: same docs as dedup, tokens never above, and never
    // above 256 * docs
    assert(rows("5_capped")._1 === rows("4_dedup")._1)
    assert(rows("5_capped")._2 <= rows("4_dedup")._2)
    assert(rows("5_capped")._2 <= 256L * rows("5_capped")._1)
    // langid stage cross-check: survivors = nonempty docs whose
    // prediction matches the label
    val langKeep = docs
      .filter(length(TF.normalize(col("text"))) > 0)
      .filter(TF.langId(col("text")) === col("lang")).count()
    assert(rows("2_langid")._1 === langKeep)
    // dedup stage: survivors are distinct fingerprints among quality
    // survivors
    val q3 = docs
      .filter(length(TF.normalize(col("text"))) > 0)
      .filter(TF.langId(col("text")) === col("lang"))
      .filter(TF.qualityScore(col("text")) >= 0.5)
    assert(rows("4_dedup")._1 ===
      q3.select(TF.fingerprint(col("text"))).distinct().count())
  }
}
