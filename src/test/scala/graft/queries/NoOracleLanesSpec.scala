package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Pins the VALUES of the production-hash lanes that have no DuckDB
  * oracle (xxhash64 / KMeans / sketch internals have no cross-engine
  * twin — since r5 these live in `SparkEntry.benchOnly`, out of the
  * driver's oracle sweep, each shadowed by a portable `_oracle` twin).
  * All inputs are deterministic, so these summaries are exact
  * constants at sf0.001: any drift in the MinHash/SimHash/LSH/IVF
  * implementations fails this suite — the check a rows-only lane
  * can't provide. Pins were re-derived in r5 when both hash families
  * moved to hash-once (one string hash per shingle/token, permutations
  * over the fixed-width 64-bit value). Every lane also asserts the
  * semantic floor that makes the number meaningful, not just stable.
  */
class NoOracleLanesSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.allQueries(name)(spark, sf())

  test("dedup_minhash: candidate/pair counts and max jaccard pinned") {
    val r = q("dedup_minhash").head()
    assert(r.getAs[Long]("n_candidates") === 28L)
    assert(r.getAs[Long]("n_pairs") === 28L) // all candidates ≥ 0.6
    assert(r.getAs[Double]("max_jaccard") === 0.9894) // planted near-dup
    assert(r.getAs[Double]("max_jaccard") >= 0.9) // semantic floor
  }

  test("dedup_simhash: hash cardinality and hamming≤3 pairs pinned") {
    val r = q("dedup_simhash").head()
    assert(r.getAs[Long]("n_docs") === 500L)
    assert(r.getAs[Long]("n_distinct_hashes") === 496L)
    assert(r.getAs[Long]("n_pairs_ham3") === 27L)
  }

  test("ann_lsh: recall@5 pinned and above floor") {
    val r = q("ann_lsh").head()
    assert(r.getAs[Long]("n_probes") === 5L)
    assert(r.getAs[Long]("n_lsh_results") === 25L) // full top-5 per probe
    assert(r.getAs[Long]("n_hits") === 18L)
    assert(r.getAs[Double]("recall_at_5") === 0.72)
    assert(r.getAs[Double]("recall_at_5") >= 0.6) // semantic floor
  }

  test("ann_ivf: recall@5 pinned and above floor") {
    val r = q("ann_ivf").head()
    assert(r.getAs[Long]("n_probes") === 5L)
    assert(r.getAs[Long]("n_ivf_results") === 25L)
    assert(r.getAs[Long]("n_hits") === 13L)
    assert(r.getAs[Double]("recall_at_5") === 0.52)
    assert(r.getAs[Double]("recall_at_5") >= 0.5) // nProbe=4/16 scans 25% of cells
  }

  test("q20_approx_distinct: built-in HLL within relative-error bound") {
    val rows = q("q20_approx_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) =
        (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      // default rsd 0.05 → 3σ bound 15%; deterministic inputs make the
      // realized estimates exact constants, so any drift fails here
      assert(math.abs(approx - exact).toDouble / exact < 0.15,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("q26_approx_percentiles: sketch tracks exact within rank error") {
    q("q26_approx_percentiles").collect().foreach { r =>
      // accuracy 10000 ⇒ rank error ≤ 1/10000; at sf0.001 group sizes
      // the sketch is effectively exact — pin a tight relative bound
      assert(math.abs(r.getAs[Double]("ap50") - r.getAs[Double]("p50"))
        <= 0.01 * r.getAs[Double]("p50"))
      assert(math.abs(r.getAs[Double]("ap95") - r.getAs[Double]("p95"))
        <= 0.01 * r.getAs[Double]("p95"))
    }
  }

  test("multimodal_frames: per-doc frame sampling totals pinned") {
    val agg = q("multimodal_frames")
      .agg(count(lit(1)).as("docs"), sum("n_sampled").as("frames"),
        sum("sampled_bytes").as("bytes"), sum("hash_sum").as("hashes"))
      .head()
    assert(agg.getAs[Long]("docs") === 500L)
    assert(agg.getAs[Long]("frames") === 538L)
    assert(agg.getAs[Long]("bytes") === 108754L)
    assert(agg.getAs[Long]("hashes") === 259038096840L)
  }
}
