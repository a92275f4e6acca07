package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TriangleCountSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def counts(df: DataFrame): (Long, Long, Long) = {
    val r = TriangleCount.triangles(df).head()
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_triangles"))
  }

  test("K4 has 4 triangles; pendant edge adds none") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    assert(counts(k4) === ((5L, 7L, 4L)))
  }

  test("self-loops, duplicates, and reversed duplicates are cleaned") {
    val messy = edges((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L),
      (2L, 3L), (3L, 1L))
    assert(counts(messy) === ((3L, 3L, 1L)))
  }

  test("triangle-free bipartite graph counts zero") {
    val bip = edges((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L))
    assert(counts(bip) === ((5L, 6L, 0L)))
  }

  test("matches the orientation-free x<y<z join on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: 40 nodes, hash-derived edges
    val pairs = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
      if ((i * 2654435761L + j * 40503L) % 5) == 0
    } yield (i, j)
    val e = pairs.toDF("src", "dst")
    val (_, _, oriented) = counts(e)
    val canon = e.select(least($"src", $"dst").as("a"),
      greatest($"src", $"dst").as("b")).distinct()
    val naive = canon.as("e1")
      .join(canon.as("e2"), $"e2.a" === $"e1.a" && $"e2.b" > $"e1.b")
      .join(canon.as("e3"), $"e3.a" === $"e1.b" && $"e3.b" === $"e2.b")
      .count()
    assert(oriented === naive && naive > 0)
  }

  test("the big side never explodes: hub star with one closing edge") {
    import spark.implicits._
    // star around node 0 (degree 50) + single edge (1,2): exactly one
    // triangle; orientation sends both star edges OUT of the leaves
    // (degree 1 < 50), so node 0 generates zero wedges despite its hub
    // degree — the skew-killing property under test.
    val star = (1L to 50L).map(i => (0L, i))
    val e = (star :+ ((1L, 2L))).toDF("src", "dst")
    assert(counts(e) === ((51L, 51L, 1L)))
  }
}
