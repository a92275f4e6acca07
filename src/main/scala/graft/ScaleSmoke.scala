package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-evidence harness: runs the four reference benchmark
  * aggregations against the base fact table and against a K×-enlarged
  * copy (the base unioned K times, rewritten as parquet), and reports
  * the time ratio. A plan that "would survive a 100× scale-up" should
  * grow ≲ linearly in rows here (the partial-aggregate → tiny-shuffle
  * → final shape has no superlinear stage and its shuffle volume is the
  * group count, not the row count).
  *
  *   sbt "runMain graft.ScaleSmoke /root/testdata/sf0.1 16"
  *
  * Prints one line per query: base median, K× median, ratio, plus a
  * JSON summary line (also written to $SPARK_GRAFT_SCALE_OUT, default
  * scale_result.json — the committed SCALE_r{N}.json artifact). Ratios
  * well under K mean the fixed per-job overhead still dominates at
  * this size; ratios near K mean scan-bound linear scaling — both are
  * healthy. A ratio ≫ K would flag a superlinear stage (the thing
  * this harness exists to catch).
  *
  * Measurement discipline matches [[Bench]]: 1 warmup + 5 measured
  * runs per (query, size), median over the healthy samples (within 3×
  * of the minimum — the host has documented intermittent stalls), and
  * ALL pinned checkpoint blocks released after every sample so lanes
  * can't contaminate each other across the sweep.
  */
object ScaleSmoke {

  private val queries = Seq("q1_count_by_flag", "q2_avg_by_status",
    "q3_count_by_flag_year", "q4_count_3key_sorted",
    // document-pipeline lanes (scale on the enlarged documents table):
    // packing = shuffle + partition fold, boilerplate = explode +
    // dictionary join, exact dedup = one 16-byte-key shuffle
    "pack_nextfit", "boilerplate_clean", "dedup_exact",
    // round-3 second wave: LM scoring = vocabulary-keyed shuffle joins
    // (counts AND scored docs both grow with the corpus), sliding
    // chunks = pure map stage
    "text_lm_score", "pack_sliding",
    // round-4: bounded-top-k index build (one token shuffle, O(k)
    // buffers), CDC chunking (per-position map hash + doc-keyed lag),
    // BPE training (corpus word-count pass scales; merge iterations run
    // over the DISTINCT vocabulary, which K identical copies leave
    // unchanged — iterations should be ~flat), and PageRank (the
    // distinct-edge pass scales; the iteration cost is edge-set-bound
    // and K copies of the same pairs leave the edge set unchanged)
    "inverted_index", "cdc_chunks", "bpe_train", "pagerank",
    // round-4 second wave: histogram quantile (fact shuffle carries
    // (group,bin) partials — K× rows, SAME bin-table size downstream)
    // and the one-scan funnel (map flags + one fingerprint shuffle;
    // survivors stay constant while the scan grows K×). The portable
    // minhash lane is deliberately NOT here: its OUTPUT is dup pairs,
    // and K disjoint-id copies manufacture K(K−1)/2 pairs per original
    // fingerprint group — a quadratic output the harness would misread
    // as a superlinear stage.
    "quantile_hist", "pipeline_e2e",
    // round-4 third wave: DPP (K× fact rows behind the SAME 84 month
    // partitions — the pruned scan should grow with rows-per-partition,
    // i.e. ~linearly) and the Bloom-pruned join (K× probe against the
    // 1× orders build side — prune + join stay linear in the probe).
    // merge_upsert / incr_agg are NOT here: they read only orders,
    // which the enlargement deliberately keeps 1× (see above).
    "dpp_join", "q42_bloom_join",
    // round-5: the heaviest remaining bench lanes, all linear-output
    // under the disjoint-id enlargement. q7 = the 5-table denorm join
    // (K× lineitem probes 1× orders/customer/supplier/nation — the
    // same probe-side policy as the Bloom lane); span_dedup emits
    // DISTINCT spans (counts grow K×, the span set doesn't); text_pmi
    // emits distinct pairs over a fixed vocabulary; text_bm25 scores
    // each doc once (K× docs → K× rows, query-pruned df stays tiny);
    // cross-doc minhash/cluster pair lanes stay excluded per the note
    // above.
    "q7_denorm_join", "span_dedup", "text_pmi", "text_bm25",
    // round-6: GD training (iters+2 aggregation jobs — the scan grows
    // K×, driver state stays O(#features)), PQ ADC search (every stage
    // linear in the corpus: K× assignment fan-out against the same
    // constant-size broadcast codebook, K× pricing rows, constant
    // top-k), and DSIR resampling (K identical copies leave the
    // vocabulary fixed; bigram counts and scoring rows grow K×,
    // selection stays top-100)
    "lr_train", "ann_pq", "importance_resample",
    // round-6 second wave: the Gopher battery (pure map — regex
    // throughput should scale exactly with rows) and whole-vector
    // KMeans (K× assignment fan-out per iteration against a
    // constant-size codebook, like ann_pq's train stage).
    // sparse_cosine_pairs stays EXCLUDED like the other pair-emitting
    // dedup lanes: disjoint-id copies multiply every under-cap rare
    // term's df by K, manufacturing K²/2 pairs per planted-dup group —
    // a quadratic OUTPUT the harness would misread. (Its scale bound —
    // common terms crossing the ABSOLUTE cap as the corpus grows — is
    // exactly what the enlargement does show: the 0.8·N fractional
    // form measured 560M join rows at sf0.1, the absolute form 1.04 s.)
    "gopher_rules", "kmeans_train",
    // round-6 third wave: per-row zlib in the scan stage — pure map,
    // cost strictly per-document, should scale exactly with rows
    "quality_compress",
    // round-6 fifth wave: the global row index at K× lineitem — range
    // shuffle + in-partition sort + bounded offset collect; both real
    // stages grow linearly, the offset table stays nRanges rows
    "global_index_big",
    // round-6 sixth wave: funnel + sequence count scale on the K×
    // events table (disjoint user copies → K× users, per-user work
    // unchanged — one user shuffle each); char_entropy is a pure map
    // over K× documents; dq_constraints is one aggregate pass over K×
    // lineitem + the FK anti-join against 1× orders; triangle_count's
    // K× identical lineitem copies leave baskets, edges and triangles
    // UNCHANGED (collect_set dedups) — only the scan grows, so its
    // ratio should sit well under K (the downstream is constant-size)
    "funnel_conversion", "sequence_count", "char_entropy",
    "dq_constraints", "triangle_count",
    // round-6 seventh wave: haversine is a pure map over K× lineitem
    // (scan-bound linear); the grid lane's shuffle is bounded by the
    // 2000-cell grid whatever K is — rows grow, groups don't; the OD
    // matrix shuffles on grid² pairs (bounded groups again, bigger
    // constant) and ranks inside ≤|cells| origin groups; zone
    // assignment is a pure predicate map
    "geo_distance", "geo_gridcells", "geo_od_flows",
    "geo_zone_assign",
    // round-8: the reference-schema headline ITSELF at K× — the
    // closest analogue of the reference's actual benchmark (1.1 B
    // taxi rows, README.md:606-687). prepare() (CSV → staging →
    // transform → MergeTree) runs once per dir during warmup — the
    // reference's own load-once protocol — so measured runs time the
    // four benchmark aggregations against the materialized 51-column
    // analytic table; scan work grows K×, group counts stay fixed
    "taxi_e2e_q1", "taxi_e2e_q2", "taxi_e2e_q3", "taxi_e2e_q4",
    // round-9: the snapshot tier at K× — these lanes read ORDERS, which
    // the main enlargement deliberately keeps 1× (the pagerank k² note
    // above), so they run against a separate K×-orders dir with
    // disjoint keys (copy i at +i·1e10: residues mod 20/100 are
    // preserved, so each copy merges exactly like the original, and
    // the +2e9 insert keys stay inside their copy's band). Warmup pays
    // the one-time snapshot build + MERGE/INSERT commit; measured runs
    // price the read of the committed multi-commit manifest — the scan
    // grows K× while the manifest/pointer cost stays O(entries)
    "snapshot_merge", "snapshot_sql", "snapshot_sql_insert",
    // round-10: the statement-form write surface at K× — native MERGE
    // INTO and dynamic INSERT OVERWRITE commit in warmup, measured
    // runs price the committed-manifest read exactly like the rest
    "snapshot_sql_merge_stmt", "snapshot_sql_overwrite",
    // round-11: row-level copy-on-write DML at K× — the UPDATE/DELETE
    // discovery scan and partition restatement grow with the touched
    // data; the measured read prices the committed manifest
    "snapshot_sql_update", "snapshot_sql_delete_rows",
    // round-12: the two de-windowed lanes the r11 verdict marked weak
    // BECAUSE no scale sweep covered them — vocab_build's token-count
    // shuffle grows K× while the surviving vocabulary (and the
    // GlobalIndex offset table) stays FIXED under identical copies;
    // model_auc's corpus-side score pass grows K× while the
    // distinct-score set (and the PrefixSum range count) stays fixed.
    // semantic_dedup: K× assignment fan-out against the same
    // constant-size centroid broadcast + a cluster-keyed count shuffle
    "vocab_build", "model_auc", "semantic_dedup",
    // stream_hourly_stats: a real AvailableNow drain of the K× events
    // table — batches grow K×, state stays O(hours); prices the
    // micro-batch machinery end-to-end at scale
    "stream_hourly_stats",
    // round-12: the row-exact CDC lanes — DML commits in warmup,
    // measured runs price the per-commit sidecar replay (sidecar size
    // grows with the CHANGED rows, K×; manifest walking stays
    // O(commits)) and the general-clause MERGE read
    "snapshot_cdf_rowlevel", "snapshot_sql_merge_cond",
    // round-12: the multipart (two-identity-column) layout at K× —
    // partition count grows with (months × priorities), fixed under
    // identical copies; the DELETE/UPDATE/MERGE discovery and the
    // measured read both grow K× in data while the composite-token
    // manifest work stays O(entries)
    "snapshot_multipart", "snapshot_bucket",
    // round-12: the column-ID rename at K× — the renames are ~KB
    // metadata commits regardless of K; the measured read prices the
    // mapped (physical-schema) scan + logical projection over K× data
    "snapshot_sql_rename",
    // round-13: by-source MERGE (full-sync discovery scans every
    // stats-surviving partition — the honest full-table pass — and
    // the measured read prices the restated result at K×);
    // spec evolution (mixed-vintage DML in warmup, the measured read
    // unions old- and new-layout entries over K× data); the
    // storage-partitioned join (the co-bucketed fact-to-fact join
    // itself is the measured body — K× rows through ZERO join
    // exchanges, the lane's reason to exist); DROP+re-ADD (metadata
    // commits, the measured read prices the mapped scan at K×)
    "snapshot_sql_merge_bysource", "snapshot_spec_evolve",
    "snapshot_spj", "snapshot_sql_drop",
    // round-14: merge-on-read DML (the DV commits land in warmup; the
    // measured read prices the broadcast anti-join over K× data — the
    // vector stays O(deleted positions) whatever K is); the
    // cross-vintage overwrite (warmup pays the bucket→month migration,
    // the read unions the migrated layout at K×); WAP (branch staging
    // + fast-forward in warmup, the read prices the published chain
    // head); the months(date) storage-partitioned join (K× rows
    // through ZERO join exchanges, like snapshot_spj); nested
    // evolution (the measured read prices the struct-rebuild
    // logicalize projection over K× data)
    "snapshot_dv_delete", "snapshot_dv_update",
    "snapshot_evolve_overwrite", "snapshot_branch_wap",
    "snapshot_spj_time", "snapshot_nested_evolve",
    // round-14 metadata economics: the stats-fold aggregate should be
    // ≈CONSTANT in K (it reads the manifest, not the data — the ratio
    // is the strongest sublinearity claim in the sweep), and the
    // stats-skipped range probe should scale with the SELECTED months'
    // rows (K× those), not the table
    "snapshot_agg_stats", "snapshot_stats_prune", "snapshot_agg_group",
    "snapshot_agg_filtered",
    // round-14: targeted maintenance at K× — warmup pays the
    // fold + vector-fold + binpack rewrite of the dirty (pre-1997)
    // months only; the measured read prices the maintained layout
    // over K× data. The rewrite itself is O(dirty data) whatever the
    // table size — the carried ≥1997 dirs are never read or written
    "snapshot_rewrite_files",
    // round-14: file-grain skipping at K× — the month's slice count
    // grows with K (fixed byte target), the 7-day probe's planned
    // slice count grows with the PROBED rows only: the measured scan
    // is O(overlapping slices), the sweep's finest-skipping claim
    "snapshot_file_prune")

  /** Lanes redirected to the K×-orders enlargement (see above). */
  private val snapshotLanes: Set[String] =
    Set("snapshot_merge", "snapshot_sql", "snapshot_sql_insert",
      "snapshot_sql_merge_stmt", "snapshot_sql_overwrite",
      "snapshot_sql_update", "snapshot_sql_delete_rows",
      "snapshot_cdf_rowlevel", "snapshot_sql_merge_cond",
      "snapshot_multipart", "snapshot_bucket", "snapshot_sql_rename",
      "snapshot_sql_merge_bysource", "snapshot_spec_evolve",
      "snapshot_spj", "snapshot_sql_drop",
      "snapshot_dv_delete", "snapshot_dv_update",
      "snapshot_evolve_overwrite", "snapshot_branch_wap",
      "snapshot_spj_time", "snapshot_nested_evolve",
      "snapshot_agg_stats", "snapshot_stats_prune",
      "snapshot_agg_group", "snapshot_agg_filtered",
      "snapshot_rewrite_files", "snapshot_file_prune")

  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.3f", v)

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** 5 samples, untimed block sweep after each, median of the samples
    * within 3× of the minimum (the Bench healthy-sample policy). */
  private def measure(spark: SparkSession, f: => Unit): Double = {
    val times = (1 to 5).map { _ =>
      val t = time(f)
      graft.util.Checkpoints.releaseAllAndGc(spark)
      t
    }
    median(times.filter(_ <= math.max(times.min, 1e-9) * 3.0))
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // local-dev override: smoke only the named lanes (e.g. the headline
    // four at a K too large to rebuild every corpus-bound lane for)
    val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = s"${sys.props("java.io.tmpdir")}/graft_scale_${k}x_${base.hashCode.toHexString}"
    if (!new java.io.File(s"$big/lineitem.parquet").exists()) {
      val li = Tables.lineitem(spark, base)
      (1 to k).map(_ => li).reduce(_ unionAll _)
        .repartition(cpus.toInt * 2)
        .write.mode("overwrite").parquet(s"$big/lineitem.parquet")
    }
    if (!new java.io.File(s"$big/documents.parquet").exists()) {
      // K copies with disjoint, deterministic doc_ids so dedup/packing
      // keys stay unique (the copies differ only in id, which is what
      // these operators key on)
      val docs = Tables.documents(spark, base)
      (0 until k).map(i => docs.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 100000000L)))
        .reduce(_ unionAll _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
    }
    if (!new java.io.File(s"$big/embeddings.parquet").exists()) {
      // disjoint vec_ids, same policy as documents: ann/PQ lanes key on
      // the id; probes (vec_id < 5) stay the base five
      val embs = Tables.embeddings(spark, base)
      (0 until k).map(i => embs.withColumn("vec_id",
          col("vec_id") + lit(i.toLong * 100000000L)))
        .reduce(_ unionAll _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    }
    if (!new java.io.File(s"$big/orders.parquet").exists()) {
      // pagerank reads orders⋈lineitem. Orders is written ONCE (not
      // ×k): duplicating BOTH join sides would blow the pre-DISTINCT
      // pair intermediate up k²-fold — an artifact of the enlargement,
      // not of the operator — while k× lineitem against 1× orders
      // scales the join linearly as intended.
      Tables.orders(spark, base)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$big/orders.parquet")
    }
    if (!new java.io.File(s"$big/events.parquet").exists()) {
      // K copies with disjoint user_ids AND event_ids: per-user
      // histories replicate exactly, so user-keyed lanes (funnel,
      // sequence count) produce K× identical-per-copy outputs — the
      // honest linear-scaling shape for per-entity operators
      val ev = Tables.events(spark, base)
      (0 until k).map(i => ev
          .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000000L))
          .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionAll _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$big/events.parquet")
    }
    // q7's dimension tables ride along at 1× (the fact side is what
    // the harness enlarges; dims join un-hinted and AQE handles them
    // the same at either size).
    for (t <- Seq("customer", "supplier", "nation")) {
      if (!new java.io.File(s"$big/$t.parquet").exists()) {
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$big/$t.parquet")
      }
    }
    // the snapshot lanes' own enlargement: K× orders, disjoint keys —
    // built only when a snapshot lane is actually selected
    val bigSnap = s"${sys.props("java.io.tmpdir")}/graft_scale_snap_${k}x_${base.hashCode.toHexString}"
    val snapshotLaneSelected =
      queries.exists(q => snapshotLanes(q) && only.forall(_.contains(q)))
    if (snapshotLaneSelected &&
        !new java.io.File(s"$bigSnap/orders.parquet").exists()) {
      val o = Tables.orders(spark, base)
      (0 until k).map(i => o.withColumn("o_orderkey",
          col("o_orderkey") + lit(i.toLong * 10000000000L)))
        .reduce(_ unionAll _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$bigSnap/orders.parquet")
    }
    val nBase = Tables.lineitem(spark, base).count()
    val nBig = Tables.lineitem(spark, big).count()
    val dBase = Tables.documents(spark, base).count()
    val dBig = Tables.documents(spark, big).count()
    System.err.println(s"[scale] lineitem base=$nBase rows, ${k}x=$nBig; " +
      s"documents base=$dBase, ${k}x=$dBig")

    def run(q: String, dir: String): Double = {
      val f = () => SparkEntry.allQueries(q)(spark, dir)
        .queryExecution.toRdd.foreach(_ => ())
      f() // warmup
      graft.util.Checkpoints.releaseAllAndGc(spark)
      measure(spark, f())
    }
    val rows = queries.filter(q => only.forall(_.contains(q))).map { q =>
      val (b, g) = (run(q, base),
        run(q, if (snapshotLanes(q)) bigSnap else big))
      System.err.println(
        s"[scale] $q base=${fmt(b)}s ${k}x=${fmt(g)}s ratio=${fmt(g / b)}")
      (q, b, g)
    }
    val js = rows.map { case (q, b, g) =>
      s""""$q":{"base":${fmt(b)},"k":${fmt(g)},"ratio":${fmt(g / b)}}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"scale_smoke","k":$k,"base_dir":"$base","rows_lineitem_k":$nBig,"queries":$js}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "scale_result.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes("UTF-8"))
      System.err.println(s"[scale] json written to $outPath")
    } catch {
      case e: Throwable =>
        System.err.println(s"[scale] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
