package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BFS frontier iteration behind `transitive_reach` on a
  * planted lineitem co-purchase graph where depths are hand-computable.
  * Edges need support ≥ 2 (two distinct orders per pair). */
class TransitiveReachSpec extends SparkSpec {
  import spark.implicits._

  /** Write a lineitem fixture whose support-≥2 co-purchase edges are
    * exactly `edges` (each pair emitted in two distinct orders). */
  private def writeGraph(edges: Seq[(Long, Long)],
      extraParts: Seq[Long] = Nil): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("reach").toString
    var ok = 0L
    val rows = edges.flatMap { case (a, b) =>
      (0 until 2).map { _ =>
        ok += 1
        Seq((ok, a), (ok, b))
      }
    }.flatten ++ extraParts.map { p => ok += 1; (ok, p) }
    rows.zipWithIndex.map { case ((o, p), i) =>
      (o, p, i, 1.0, "A", java.sql.Date.valueOf("2024-01-01"))
    }.toDF("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
      "l_returnflag", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def reach(dir: String): Map[Long, Long] =
    RelationalQueries.q46TransitiveReach(spark, dir).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("depth"))
      .toMap

  /** Like [[writeGraph]] but with a support count per edge (drives the
    * shortest-path weight 11 − min(support, 10)). */
  private def writeWeighted(edges: Seq[(Long, Long, Int)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("sssp").toString
    var ok = 0L
    val rows = edges.flatMap { case (a, b, sup) =>
      (0 until sup).flatMap { _ =>
        ok += 1
        Seq((ok, a), (ok, b))
      }
    }
    rows.zipWithIndex.map { case ((o, p), i) =>
      (o, p, i, 1.0, "A", java.sql.Date.valueOf("2024-01-01"))
    }.toDF("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
      "l_returnflag", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("shortest path: a cheap 2-hop route beats the direct edge") {
    // direct 1-2 support 2 (w=9); 1-3 and 3-2 support 10 (w=1 each):
    // min cost to 2 is 2 via node 3, not 9
    val dir = writeWeighted(Seq((1L, 2L, 2), (1L, 3L, 10), (3L, 2L, 10)))
    val got = RelationalQueries.q47ShortestPath(spark, dir).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("cost")).toMap
    assert(got === Map(1L -> 0L, 3L -> 1L, 2L -> 2L))
  }

  test("shortest path: hop bound caps the relaxation at 4 edges") {
    // chain of 5 cheap edges: node 6 is 5 hops out → absent; node 5
    // (4 hops) costs 4
    val dir = writeWeighted(Seq((1L, 2L, 10), (2L, 3L, 10), (3L, 4L, 10),
      (4L, 5L, 10), (5L, 6L, 10)))
    val got = RelationalQueries.q47ShortestPath(spark, dir).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("cost")).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("chain: depths count hops from the min node, cut at 3") {
    // 1-2-3-4-5: seed 1, node 5 is 4 hops away → excluded
    val dir = writeGraph(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(reach(dir) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("cycle: min depth wins over the longer way round") {
    // square 1-2-3-4-1: node 3 reachable in 2 both ways
    val dir = writeGraph(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(reach(dir) === Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("disconnected component is never reached") {
    val dir = writeGraph(Seq((1L, 2L), (10L, 11L)))
    assert(reach(dir) === Map(1L -> 0L, 2L -> 1L))
  }

  test("early frontier exhaustion terminates before round 3") {
    // single edge: frontier empties after round 1
    val dir = writeGraph(Seq((1L, 2L)))
    assert(reach(dir) === Map(1L -> 0L, 2L -> 1L))
  }
}
