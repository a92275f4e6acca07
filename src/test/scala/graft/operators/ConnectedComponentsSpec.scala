package graft.operators

import graft.SparkSpec

/** Connected components (large-star/small-star): hand graphs, a long
  * chain (the diameter case star-contraction exists for), and a
  * randomized comparison against a driver-side union-find. */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  /** smallGraph=0 forces the iterative star-contraction path; the
    * default exercises the single-task union-find fast path. Both are
    * asserted equal on every graph below. */
  private def componentsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val fast = ConnectedComponents.labels(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = ConnectedComponents.labels(df, "a", "b", smallGraph = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === loop, "fast path and star-contraction disagree")
    fast
  }

  /** Driver-side union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("two components with ids not ordered along the structure") {
    val edges = Seq((9L, 4L), (4L, 8L), (8L, 2L), (30L, 20L), (20L, 25L))
    assert(componentsOf(edges) === Map(
      2L -> 2L, 4L -> 2L, 8L -> 2L, 9L -> 2L,
      20L -> 20L, 25L -> 20L, 30L -> 20L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 2L))
    assert(componentsOf(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a 40-node chain converges (far fewer rounds than its diameter)") {
    val edges = (1L until 40L).map(i => (i + 1, i))
    val got = componentsOf(edges)
    assert(got === (1L to 40L).map(_ -> 1L).toMap)
  }

  test("randomized graphs match a union-find oracle") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(60)(
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
      assert(componentsOf(edges) === unionFind(edges))
    }
  }
}
