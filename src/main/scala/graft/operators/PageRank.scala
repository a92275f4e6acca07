package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration — the Pregel-style iterative graph
  * shape (beside [[ConnectedComponents]]'s star contraction):
  * per iteration, each node splits its rank over its out-edges (join
  * on src), contributions aggregate on dst, damping applies.
  *
  * Determinism / oracle contract: all rank mass is EXACT INTEGER
  * arithmetic — ranks start at `scale` units per node, contributions
  * are `rank div outdeg` (truncating division, identical in the JVM
  * and any SQL engine for non-negative operands), damping is
  * `base + (85 · Σ) div 100`. No float sums anywhere, so iteration
  * results are independent of partition layout and replay exactly in
  * DuckDB as an unrolled CTE chain.
  *
  * Scale shape: one join (edges ⋈ ranks on src) + one aggregate
  * (contributions on dst) per iteration — the textbook two shuffles;
  * edges, out-degrees and the node set are localCheckpoint'd once,
  * and each iteration's ranks are checkpointed to cut lineage
  * (the [[ConnectedComponents]] policy). Rank mass stays ≤ nodes ×
  * scale, so the 85× multiply fits a long for corpora up to ~10^8
  * nodes at the default scale.
  */
object PageRank {

  /** `iters` power iterations over directed `edges`; returns
    * (node, pr_mass) — integer rank units, Σ ≈ nodes × scale.
    * Nodes with no inbound edges settle at the base mass; dangling
    * nodes are absent by construction when the edge set is
    * symmetrized (as the driver lane does). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import graft.util.Checkpoints.pin
    val (e, releaseE) = pin(edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")))
    val (out, releaseOut) = pin(e.groupBy("src")
      .agg(count(lit(1)).as("outdeg")))
    val (nodes, releaseNodes) = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val base = 15L * scale / 100L
    var r = nodes.withColumn("pr_mass", lit(scale))
    // release handle for the previous iteration's rank blocks — once
    // iteration N is checkpointed, N-1's blocks are dead weight
    var releaseR: () => Unit = () => ()
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(out, "src")
        .join(r.select(col("node").as("src"), col("pr_mass")), "src")
        .select(col("dst").as("node"),
          expr("pr_mass div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val (next, releaseNext) = pin(nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100"))
            .as("pr_mass")))
      releaseR()
      r = next
      releaseR = releaseNext
    }
    // the final ranks are materialized into their own blocks — the
    // graph-shape frames are no longer needed by the returned plan
    releaseE(); releaseOut(); releaseNodes()
    r
  }
}
