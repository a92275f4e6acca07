package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-arithmetic PageRank: structural sanity on hand graphs and
  * layout independence of the iterated masses. */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  test("symmetric 2-cycle keeps both nodes at full mass") {
    // a <-> b: each node passes its whole mass each step; with damping
    // r' = 0.15s + 0.85r stays at the fixpoint r = s exactly
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.ranks(e, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("star center out-ranks leaves; total mass is conserved-ish") {
    // hub 0 <-> leaves 1..6 (symmetrized)
    val edges = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L)))
      .toDF("src", "dst")
    val got = PageRank.ranks(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = got(0L)
    assert((1L to 6L).forall(l => got(l) < hub))
    // leaves are symmetric -> identical masses
    assert((1L to 6L).map(got).toSet.size === 1)
    // integer truncation only ever loses mass, never creates it
    val total = got.values.sum
    assert(total <= 7L * 1000000000L)
    assert(total > (7L * 1000000000L * 95L) / 100L)
  }

  test("masses are independent of partition layout") {
    val ord = graft.Tables.orders(spark, sf()).select("o_orderkey", "o_custkey")
    val li = graft.Tables.lineitem(spark, sf()).select("l_orderkey", "l_suppkey")
    val pairs = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = pairs.union(pairs.select(col("b"), col("a")))
    def run(parts: Int) = PageRank.ranks(edges.repartition(parts), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2) === run(11))
  }
}
