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
