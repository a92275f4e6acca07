package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree orientation — the classic
  * MapReduce formulation (Suri & Vassilvitskii, WWW'11 "Counting
  * triangles and the curse of the last reducer"). Graph analytics over
  * a co-occurrence graph is a standard curation signal (community
  * spam clusters, template farms); the triangle count / clustering
  * coefficient is its cheapest global statistic.
  *
  * Why orientation matters at scale: the naive wedge join fans every
  * vertex v into deg(v)² wedge candidates — one celebrity hub (deg 10⁶)
  * manufactures 10¹² rows in a single reducer. Orienting every edge
  * from its (degree, id)-smaller endpoint to the larger caps the
  * out-degree of EVERY vertex at O(√m), so the wedge join emits at most
  * m^{3/2} candidates spread evenly — the skew is removed by
  * construction, not by salting after the fact.
  *
  * Every triangle {x,y,z} is counted exactly once: in the orientation's
  * total order the triangle has a unique least vertex, and both of its
  * out-edges from that vertex form the one wedge that closes.
  *
  * Shuffle shape: edges are distinct-ed once ((min,max) canonical
  * form), degrees are one groupBy, the wedge join + closing join are
  * hash equi-joins on vertex / edge keys. Nothing driver-side; the
  * count is a single final aggregate.
  */
object TriangleCount {

  /** @param edges two-column frame (src, dst); treated as an undirected
    *              simple graph — self-loops dropped, multi-edges
    *              deduped via the canonical (min, max) form.
    * @return single row (n_nodes, n_edges, n_triangles) */
  def triangles(edges: DataFrame): DataFrame = {
    // e, deg and oriented each feed several consumers (deg/oriented/
    // nEdges; da/db/nNodes; e1/e2/closing). Unpinned, every consumer
    // re-derives its whole subtree — the edge-building scan and its
    // aggregations ran 36× in the r14-before plan (148 Exchanges).
    // Each frame is edge/vertex-cardinality-sized (≤ m, already
    // support-thresholded by callers), the same bound the wedge join
    // itself relies on, so pinning is scale-safe — the
    // ConnectedComponents/PageRank checkpoint discipline.
    val e = edges.toDF("src", "dst")
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true)

    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)

    // orient each canonical edge from the (deg, id)-smaller endpoint;
    // the degree frame is vertex-cardinality-sized — joined twice on
    // the edge's endpoints (shuffle equi-joins; at dimension scale AQE
    // may broadcast them, at web scale they co-partition).
    val da = deg.select(col("v").as("a"), col("deg").as("deg_a"))
    val db = deg.select(col("v").as("b"), col("deg").as("deg_b"))
    // each oriented edge carries the head's order key (deg, id) so the
    // wedge step can order out-neighbors without touching degrees again
    val oriented = e.join(da, "a").join(db, "b")
      .select(
        when(col("deg_a") < col("deg_b") ||
          (col("deg_a") === col("deg_b") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w"),
            struct(col("deg_b").as("d"), col("b").as("i")).as("ok")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"),
            struct(col("deg_a").as("d"), col("a").as("i")).as("ok")))
          .as("edge"))
      .select(col("edge.u").as("u"), col("edge.w").as("w"),
        col("edge.ok").as("ok"))
      .localCheckpoint(true)

    // wedges from each least vertex: ordered pairs of out-neighbors in
    // the SAME (deg, id) total order the orientation used, so the wedge
    // (w1, w2) closes iff the oriented edge w1 → w2 exists — one wedge
    // per unordered pair, one probe per wedge.
    val e1 = oriented.select(col("u"), col("w").as("w1"),
      col("ok").as("ok1"))
    val e2 = oriented.select(col("u"), col("w").as("w2"),
      col("ok").as("ok2"))
    val wedges = e1.join(e2, "u").filter(col("ok1") < col("ok2"))
      .select(col("w1"), col("w2"))
    val closing = oriented.select(col("u").as("w1"), col("w").as("w2"))
    val nTri = wedges.join(closing, Seq("w1", "w2"))
      .agg(count(lit(1)).as("n_triangles"))

    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }
}
