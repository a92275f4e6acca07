package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the step that
  * turns near-duplicate PAIRS (from [[Dedup]]) into duplicate CLUSTERS
  * so a pipeline can keep one survivor per cluster.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each
  * round is two shuffles on node id, and the edge set provably
  * converges to a forest of stars rooted at each component's minimum
  * id in O(log² n) rounds (O(log n) in practice). Compare naive label
  * propagation, whose round count is the graph DIAMETER — a boilerplate
  * near-dup chain thousands of documents long at 100 TB would take
  * thousands of shuffles; star contraction collapses such chains
  * geometrically.
  *
  * Scale properties: no collect of edges, no driver-side graph; per
  * round the only data movement is two hash shuffles of the (shrinking)
  * edge list. Each round's result is localCheckpoint'd to cut the
  * exponentially-deepening lineage (a standard requirement of iterative
  * DataFrame algorithms). Convergence is detected by a (count,
  * xor-of-edge-hashes) signature — one tiny aggregate per round instead
  * of two `except` jobs; a false positive needs a 64-bit xor collision
  * between consecutive edge sets of equal size, which is negligible.
  */
object ConnectedComponents extends Serializable {

  /** Below this many distinct edges the whole graph fits one task, and
    * the iterative loop's per-round scheduling (2 shuffles + checkpoint
    * + signature job, ×O(log n) rounds) costs more than the graph is
    * worth — a single-partition union-find finishes in ONE job. At real
    * scale the count stays large and the star-contraction loop runs. */
  val smallGraphEdges = 100000L

  /** Star edges (node → component-min) for every non-root node that
    * appears in `edges`. Input orientation/duplication is irrelevant;
    * self-loops are dropped. Key types are preserved (no blind casts).
    * `smallGraph` overrides the fast-path threshold (tests set 0 to
    * force the iterative path). */
  def starEdges(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50, smallGraph: Long = smallGraphEdges): DataFrame = {
    var (e, release) = graft.util.Checkpoints.pin(edges
      .select(col(srcCol).as("eu"), col(dstCol).as("ev"))
      .filter(col("eu") =!= col("ev"))
      .select(greatest(col("eu"), col("ev")).as("u"),
        least(col("eu"), col("ev")).as("v"))
      .distinct())
    var sig = signature(e)
    if (sig._1 <= smallGraph) return unionFindStars(e)
    // adaptive narrowing: near-dup edge sets are usually a sliver of the
    // corpus, so once the (already-known-from-the-signature) edge count
    // is small, collapse to one partition — each remaining round becomes
    // single-task instead of paying full-width shuffle scheduling. At
    // real scale the count stays large and the width stays put.
    def narrowed(df: DataFrame, count: Long): DataFrame =
      if (count <= smallGraphEdges && df.rdd.getNumPartitions > 1)
        df.coalesce(1) else df
    e = narrowed(e, sig._1)
    var round = 0
    while (round < maxRounds) {
      val (next, releaseNext) =
        graft.util.Checkpoints.pin(smallStar(largeStar(e)))
      val nextSig = signature(next)
      // round N is materialized into its own blocks — round N-1's are
      // dead; dropping them keeps steady-state block-manager usage at
      // O(one round) instead of O(rounds) over a long job
      release()
      release = releaseNext
      e = narrowed(next, nextSig._1)
      round += 1
      if (nextSig == sig) return e
      sig = nextSig
    }
    throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds")
  }

  /** Small-graph fast path: the canonicalized edge list fits one task,
    * so compute exact components with a per-partition union-find (path
    * compression + min-as-root) — one Spark job instead of O(log n)
    * rounds of (2 shuffles + checkpoint + count). Output contract is
    * identical to the loop's fixed point: (u=node, v=component-min) for
    * every non-root node. */
  private def unionFindStars(e: DataFrame): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(e.schema)
    e.coalesce(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def lt(a: Any, b: Any): Boolean =
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      @annotation.tailrec
      def find(x: Any): Any = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val g = parent(p); parent(x) = g; find(g) }
      }
      it.foreach { r =>
        val (ra, rb) = (find(r.get(0)), find(r.get(1)))
        if (ra != rb) {
          if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      // snapshot keys: find() path-compresses (writes) during iteration
      parent.keys.toArray.iterator
        .map(k => (k, find(k)))
        .collect { case (k, root) if k != root =>
          org.apache.spark.sql.Row(k, root)
        }
    }
  }

  /** (id, cluster_id) for every node present in `edges`; cluster_id is
    * the component's minimum id. `smallGraph` as in [[starEdges]]. */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
      smallGraph: Long = smallGraphEdges): DataFrame = {
    val stars = starEdges(edges, srcCol, dstCol, smallGraph = smallGraph)
    // non-roots point at their root; roots label themselves
    val nonRoot = stars.select(col("u").as("id"), col("v").as("cluster_id"))
    val roots = stars.select(col("v").as("id"), col("v").as("cluster_id"))
      .distinct()
    nonRoot.union(roots).distinct()
  }

  private def signature(e: DataFrame): (Long, Long) = {
    // bit_xor fold: order-independent, overflow-free under ANSI mode
    val r = e.agg(count(lit(1)),
      expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Large-star: every node connects its LARGER neighbors to the
    * minimum of its neighborhood (including itself). Keeps the
    * canonical u > v orientation: the emitted (v, m) has v > u ≥ m. */
  private def largeStar(e: DataFrame): DataFrame = {
    val bid = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = bid.groupBy("u")
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    bid.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node connects its SMALLER neighbors (and itself)
    * to the minimum of those neighbors. Input and output both keep the
    * u > v orientation. */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min(col("v")).as("m"))
    val nbr = e.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    nbr.union(self).distinct()
  }
}
