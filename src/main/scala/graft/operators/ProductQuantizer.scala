package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compressed-index ANN tier beside the
  * exact ([[SimilaritySearch.bruteForceTopK]]), hashed
  * ([[SimilaritySearch.lshTopK]]), partitioned ([[IvfIndex]]) and
  * scalar-quantized ([[SimilaritySearch.quantizedTopK]]) paths: split
  * each D-dim vector into M subspaces of D/M dims, learn a K-entry
  * codebook per subspace, store each vector as M small codes (here
  * 64 floats → 4 codes: 64× smaller), and answer queries with
  * asymmetric distance computation (ADC) — the query precomputes its
  * distance to every codebook entry (an M×K table) and a candidate's
  * approximate distance is M table lookups, no float math per
  * candidate.
  *
  * At 100 TB the shapes are: codebook training is O(N·D·K) join
  * fan-out against a BROADCAST codebook (M·K·(D/M) rows — ~1k here —
  * constant-size at any corpus); the encoded index is N·M small ints
  * (the thing that fits in memory when raw vectors don't); ADC search
  * joins candidate codes against a broadcast per-probe distance table
  * and reduces with one (probe, cand) aggregation. Compose with
  * [[IvfIndex]] cells for IVF-PQ: the cell prunes candidates, the PQ
  * codes price them.
  *
  * Exact cross-engine replay: components are micro-unit integers
  * (floor(v·10⁶)), every distance is an exact integer sum of squares
  * (≤ 4·10¹²·D — inside int64), codebook means use floor division, and
  * Lloyd's iterations are a FIXED unrolled budget from a portable
  * md5-bucket initialization — so training, encoding and ADC search
  * all hash-replay in DuckDB as a plain (non-recursive) CTE chain.
  */
object ProductQuantizer {

  /** Floor division for long columns — both engines' integer division
    * truncates toward zero (Spark `DIV`, DuckDB `//`), so BOTH sides
    * spell out the floor ([[HistogramQuantile.floorDivSql]] with a
    * column divisor; the oracle uses the matching CASE). The double
    * divide is exact: the subtraction makes the dividend an exact
    * multiple of b, and both operands stay far below 2^53. */
  private def floorDiv(a: Column, b: Column): Column = {
    val fm = ((a % b) + b) % b
    ((a - fm) / b).cast("long")
  }

  /** (id, m, j, v) micro-unit subvector components: dim = m·(D/M)+j. */
  private def subComponents(vecs: DataFrame, idCol: String,
      vecCol: String, subDim: Int): DataFrame =
    vecs.select(col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("id"),
        (col("dim") / subDim).cast("int").as("m"),
        (col("dim") % subDim).cast("int").as("j"),
        floor(col("v").cast("double") * 1000000L).cast("long")
          .as("vm"))

  /** (id, m, sv: array<long>) micro-unit subVECTORS — the row shape the
    * K-way assignment fan-out joins on, so the fan-out is N·M·K rows,
    * not N·D·K: the subDim distance terms stay INSIDE one codegen'd
    * projection (a static expression tree per j — a transform() lambda
    * here would run interpreted, the HOF cost the round-5 sweep
    * removed everywhere else). */
  private def subVectors(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    vecs.select(col(idCol).as("id"), col(vecCol).as("_v"),
      explode(array((0 until m).map(i => lit(i)): _*)).as("m"))
      .select(col("id"), col("m"),
        array((0 until subDim).map { j =>
          floor(element_at(col("_v"), col("m") * subDim + j + 1)
            .cast("double") * 1000000L).cast("long")
        }: _*).as("sv"))

  /** Codebook reshaped to (m, g, cv: array<long>) for the array-form
    * distance — tiny table, the sort-by-j collect is negligible. */
  private def codebookVectors(cb: DataFrame): DataFrame =
    cb.groupBy(col("m"), col("g"))
      .agg(transform(
        array_sort(collect_list(struct(col("j"), col("cm")))),
        x => x.getField("cm")).as("cv"))

  /** Exact integer squared distance between two micro-unit arrays as a
    * static codegen'd term sum. */
  private def sqDist(a: Column, b: Column, subDim: Int): Column =
    (0 until subDim).map { j =>
      (element_at(a, j + 1) - element_at(b, j + 1)) *
        (element_at(a, j + 1) - element_at(b, j + 1))
    }.reduce(_ + _)

  /** Nearest-code assignment (id, m, g) under the array-form codebook:
    * exact integer squared distance in one codegen'd projection, ties
    * to the lowest code via the (dist, g) struct min. The codebook is
    * constant-size — always broadcast; the fan-out is N·M·K rows.
    * `carrySv` additionally threads the micro subvector through the
    * aggregate (every row of an (id, m) group carries the same sv, so
    * `first` is deterministic in value) — the Lloyd rebuild then reads
    * components straight off the assignment row instead of re-joining
    * the N·D component table per iteration. */
  private def assignTo(subArr: DataFrame, cbArr: DataFrame,
      subDim: Int, carrySv: Boolean = false): DataFrame = {
    val fanout = subArr.join(broadcast(cbArr), Seq("m"))
    val scored =
      if (carrySv)
        fanout.select(col("id"), col("m"), col("g"),
          sqDist(col("sv"), col("cv"), subDim).as("dist"), col("sv"))
      else
        fanout.select(col("id"), col("m"), col("g"),
          sqDist(col("sv"), col("cv"), subDim).as("dist"))
    val aggs =
      if (carrySv)
        Seq(min(struct(col("dist"), col("g"))).as("best"),
          first(col("sv")).as("sv"))
      else Seq(min(struct(col("dist"), col("g"))).as("best"))
    val agg = scored.groupBy(col("id"), col("m"))
      .agg(aggs.head, aggs.tail: _*)
    if (carrySv)
      agg.select(col("id"), col("m"), col("best.g").as("g"), col("sv"))
    else agg.select(col("id"), col("m"), col("best.g").as("g"))
  }

  /** Per-(m, code) micro-unit codebook means from an sv-carrying
    * assignment: posexplode the subvector (j is its 0-based position —
    * exactly [[subComponents]]' dim % subDim), one map-side-combinable
    * (m, g, j) aggregate. The old shape re-joined the N·D component
    * table against the assignment on (id, m) EVERY Lloyd round — a
    * corpus-sized shuffle join per iteration for rows the assignment
    * already held (guide §2.4: remove shuffles outright). Empty codes
    * simply emit no rows. */
  private def codebookOfSv(assigned: DataFrame): DataFrame =
    assigned
      .select(col("m"), col("g"), posexplode(col("sv")).as(Seq("j", "vm")))
      .groupBy(col("m"), col("g"), col("j"))
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      .select(col("m"), col("g").cast("int").as("g"),
        col("j").cast("int").as("j"), floorDiv(col("s"), col("n")).as("cm"))

  /** Train per-subspace codebooks: portable md5-bucket init, then a
    * fixed unrolled budget of Lloyd iterations. Returns (m, g, j, cm).
    */
  def trainCodebooks(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, subDim: Int, lloydIters: Int = 2,
      salt: String = "pq"): DataFrame = {
    require(m > 0 && k > 1 && subDim > 0 && lloydIters >= 0)
    val subArr = subVectors(vecs, idCol, vecCol, m, subDim)
    // init bucket is a function of id alone (identical across m), so
    // it rides the component row as an inline expression — the old
    // distinct-then-join materialization of (id, m, g) cost an extra
    // aggregate exchange plus an N·D-row join for a value computable
    // in the projection (guide §2.4)
    val initG = (conv(substring(md5(concat(col("id").cast("string"),
      lit(s":$salt"))), 1, 15), 16, 10).cast("long") % k).cast("int")
    val init = subComponents(vecs, idCol, vecCol, subDim)
      .withColumn("g", initG)
      .groupBy(col("m"), col("g"), col("j"))
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      .select(col("m"), col("g"), col("j"),
        floorDiv(col("s"), col("n")).as("cm"))
    // Only the FINAL codebook is pinned: within training each round's
    // codebook has exactly ONE consumer (the next round's broadcast),
    // so the unpinned chain executes once per action anyway — the old
    // per-round localCheckpoint paid one extra driver job per Lloyd
    // round purely to cut lineage that nothing re-read (guide §1.2:
    // per-job overhead dominates constant-size reductions). The final
    // pin is what protects the RETURNED frame's multiple consumers
    // (encode + ADC + size joins) from replaying the whole trajectory.
    var cb = init
    for (_ <- 1 to lloydIters)
      cb = codebookOfSv(assignTo(subArr, codebookVectors(cb), subDim,
        carrySv = true))
    graft.util.Checkpoints.pin(cb)._1
  }

  /** Encode every vector as its M nearest codes under the trained
    * codebooks: (id, m, code). */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, m: Int, subDim: Int): DataFrame =
    assignTo(subVectors(vecs, idCol, vecCol, m, subDim),
      codebookVectors(cb), subDim)
      .select(col("id").as(idCol), col("m"),
        col("g").cast("long").as("code"))

  /** IVF-PQ: the composition the two indexes exist for — the IVF cell
    * PRUNES (only candidates in the probe's nProbe nearest cells are
    * considered; at scale that is a partition-pruned read of the
    * cell-partitioned code table), the PQ codes PRICE (ADC table
    * lookups, no float math per candidate). `cells` is (idCol, cell)
    * from [[IvfIndex.build]]'s assignment; everything else as
    * [[adcTopK]]. Fewer candidates than k in the probed cells simply
    * yield fewer rows — the standard IVF recall/probe trade. */
  def searchIvfPq(codes: DataFrame, cb: DataFrame, cells: DataFrame,
      centroids: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, subDim: Int, k: Int, nProbe: Int): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val wCell = Window.partitionBy(col("probe_id"))
      .orderBy(col("cdist").asc, col("cell").asc)
    val probeCells = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", VF.l2DistanceSq(col("pvec"), col("centroid")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= nProbe)
      .select(col("probe_id"), col("cell"))
    val pruned = codes.join(
      cells.select(col(idCol), col("cell")), Seq(idCol))
      .join(broadcast(probeCells), Seq("cell"))
    // price only the surviving (probe, cand) pairs
    adcTopKOn(pruned.select(col("probe_id"), col(idCol), col("m"),
      col("code")), cb, probes, idCol, vecCol, subDim, k)
  }

  /** ADC top-k: per probe, precompute the M×K integer distance table
    * to the codebooks (broadcast — probes × M × K rows), then price
    * every encoded candidate with one (m, code) join + one
    * (probe, cand) sum. Ties (equal approximate distance) break to the
    * lower candidate id. */
  def adcTopK(codes: DataFrame, cb: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, subDim: Int, k: Int): DataFrame = {
    val dt = distanceTable(cb, probes, idCol, vecCol, subDim)
    priceAndRank(
      codes.select(col(idCol).as("cand_id"), col("m"),
        col("code").cast("int").as("g"))
        .join(broadcast(dt), Seq("m", "g")), k)
  }

  /** ADC over candidates already scoped per probe (the IVF-pruned
    * path): same pricing, but the distance-table join also carries the
    * probe key so only surviving (probe, cand) pairs are priced. */
  private def adcTopKOn(cand: DataFrame, cb: DataFrame,
      probes: DataFrame, idCol: String, vecCol: String, subDim: Int,
      k: Int): DataFrame = {
    val dt = distanceTable(cb, probes, idCol, vecCol, subDim)
    priceAndRank(
      cand.select(col("probe_id"), col(idCol).as("cand_id"), col("m"),
        col("code").cast("int").as("g"))
        .join(broadcast(dt), Seq("probe_id", "m", "g")), k)
  }

  /** (probe_id, m, g, d): each probe's exact integer distance to every
    * codebook entry — M·K rows per probe, always broadcast. */
  private def distanceTable(cb: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, subDim: Int): DataFrame =
    subComponents(probes, idCol, vecCol, subDim)
      .withColumnRenamed("id", "probe_id")
      .join(broadcast(cb), Seq("m", "j"))
      .groupBy(col("probe_id"), col("m"), col("g"))
      .agg(sum((col("vm") - col("cm")) * (col("vm") - col("cm")))
        .as("d"))

  private def priceAndRank(priced: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("cand_id").asc)
    priced
      .filter(col("cand_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("cand_id"))
      .agg(sum(col("d")).as("adist"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("adist"))
  }
}
