package graft.operators

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the point of these shapes at 100 TB):
  *   - Exact dedup is one hash-shuffle on a 16-byte fingerprint, never on
  *     the raw text.
  *   - MinHash/LSH turns the O(n²) all-pairs problem into a shuffle on
  *     (band, bandHash) keys: only documents that collide in some band
  *     ever meet, and the expensive exact-Jaccard verify runs on that
  *     candidate set alone.
  *   - SimHash aggregates per-token sign votes with a single map-side
  *     combinable groupBy (64 partial sums), then blocks candidates on
  *     16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal).
  *   - Skewed buckets (boilerplate shingles) are the classic hazard; the
  *     band hash includes the band index, and verify-side AQE skew-join
  *     handles residual hot keys.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on the md5 fingerprint of normalized text: one
    * representative (min id) per distinct content, with the duplicate
    * count. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TF.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  // -------------------------------------------------------------- minhash

  /** Distinct word-shingle sets per document via the imperative
    * [[graft.functions.DistinctShingles]] expression: one tight-loop
    * eval per row. (History: nesting tokenize inside shingle inside
    * hash as lambdas re-evaluated upstream stages per element —
    * measured 100×+ slowdown; then stage-by-stage lambda projection;
    * now no per-element interpretation at all.) */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), TF.tokens(col(textCol)).as("toks"))
      .select(col("id"), graft.functions.ShingleFunctions
        .distinctShingles(col("toks"), shingleLen).as("sh"))

  /** k-permutation MinHash signature from a materialized shingle-array
    * column. Hash family = hash-of-hash: the shingle string is hashed
    * ONCE (`xxhash64(s)`), then each permutation hashes the (i, h)
    * pair — an 8-byte input instead of re-hashing a ~20-char string k
    * times, same independence (xxhash64 of a 64-bit value mixes fully).
    * NOTE: array-lambda form — useful for expression-level
    * composition, but interpreted; the hot path uses
    * [[minhashSignatures]] (explode + codegen'd min aggregates)
    * which benchmarked ~10× faster. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, xxhash64(s)))))

  /** Signatures via one `xxhash64(shingle)` projection → k codegen'd
    * `min(xxhash64(i, h))` aggregates → reassembled array. Two shapes
    * matter at scale: (1) higher-order array lambdas are interpreted
    * in Spark, so a flat projection + HashAggregate keeps the whole
    * computation inside whole-stage codegen with map-side partial
    * mins; (2) the k permutation hashes run over the FIXED-WIDTH
    * 64-bit shingle hash, not the shingle string — hashing the string
    * once cuts the dominant per-row cost from k string hashes to one
    * string hash + k long hashes (measured: the dedup_minhash lane
    * 1.73 s → see bench for the committed number). Docs with no
    * shingles drop out (they cannot pair anyway). */
  def minhashSignatures(sets: DataFrame, k: Int): DataFrame = {
    val exploded = sets.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("hs"))
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("hs"))).as(s"h$i"))
    exploded.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Banded LSH candidate pairs from shingle sets: signature split into
    * `bands` bands of k/bands rows; a pair is a candidate iff some band
    * hashes equal. Returns (id_a, id_b) distinct with id_a < id_b. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingleLen: Int = 3): DataFrame =
    lshCandidatesFromSets(
      shingleSets(docs, idCol, textCol, shingleLen), k, bands)
      .select(col("id_a"), col("id_b"))

  private def lshCandidatesFromSets(sets: DataFrame, k: Int,
      bands: Int): DataFrame = {
    val r = k / bands
    val sig = minhashSignatures(sets, k)
    // band hash covers (band index, the r signature slots)
    val banded = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r))))))
      .toDF("id", "band", "bh")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** LSH candidate pairs scored with their exact shingle-set Jaccard
    * (unfiltered — callers threshold). One shingle/signature computation
    * feeds both candidate generation and verification. */
  def minhashPairsScored(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingleLen: Int = 3): DataFrame = {
    // shingle sets feed signature generation AND two verify joins —
    // materialize the (small) per-doc set table once instead of
    // recomputing the tokenize→shingle→distinct chain three times.
    // localCheckpoint, NOT persist(): persist registers the plan in the
    // session CacheManager with no release point in a lazily-returned
    // result (every Verify/Bench invocation leaked an entry); checkpoint
    // blocks are reclaimed by the ContextCleaner once the returned plan
    // is unreachable. (Production caveat: localCheckpoint trades
    // executor-loss recovery for speed; a persistent pipeline would
    // checkpoint to the reliable checkpoint dir instead.)
    val sets = shingleSets(docs, idCol, textCol, shingleLen)
      .localCheckpoint(true)
    val cands = lshCandidatesFromSets(sets, k, bands)
    cands
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash near-dup pipeline: LSH candidates verified with exact
    * Jaccard over distinct word shingles; keeps pairs ≥ `threshold`. */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 64, bands: Int = 16,
      shingleLen: Int = 3): DataFrame =
    minhashPairsScored(docs, idCol, textCol, k, bands, shingleLen)
      .filter(col("jaccard") >= threshold)

  // ------------------------------------- portable minhash (mod-arith)

  /** MinHash+LSH with an ENGINE-PORTABLE hash family, putting the LSH
    * pipeline itself under the cross-engine oracle gate (the xxhash64
    * family above has no DuckDB twin, so its lane is rows-only).
    *
    * Base shingle hash: the 60-bit md5 prefix (the same replay trick
    * the HLL sketch uses) reduced mod p = 2^31−1; permutation family
    * h_i(x) = (a_i·x + b_i) mod p with a_i = (i+1)·2654435761 mod p,
    * b_i = (i+1)·2245399549 mod p — a_i, x < 2^31 keeps every product
    * under 2^62, so plain BIGINT arithmetic is exact in both engines.
    * Same explode + codegen'd-min-aggregate shape as
    * [[minhashSignatures]]; band keys are the comma-joined slot values
    * (portable — no second-level hash needed, the slots ARE the key).
    * md5-per-shingle costs ~2× xxhash64 — the price of replayability;
    * the xxhash64 path remains the production default. */
  def minhashPairsPortable(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 32, bands: Int = 8,
      shingleLen: Int = 3): DataFrame = {
    require(bands > 0 && k % bands == 0,
      s"bands must divide k: k=$k bands=$bands")
    val P = 2147483647L // 2^31 − 1 (Mersenne prime)
    val r = k / bands
    val sets = shingleSets(docs, idCol, textCol, shingleLen)
      .localCheckpoint(true)
    val exploded = sets.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"),
        (conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long") % P)
          .as("h"))
    val mins = (0 until k).map { i =>
      val a = ((i + 1).toLong * 2654435761L) % P
      val b = ((i + 1).toLong * 2245399549L) % P
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$i")
    }
    val sig = exploded.groupBy("id").agg(mins.head, mins.tail: _*)
    val bandKeys = (0 until bands).map { b =>
      concat_ws(",", (0 until r).map(j => col(s"m${b * r + j}")): _*)
    }
    val banded = sig.select(col("id"), posexplode(array(bandKeys: _*)))
      .toDF("id", "band", "bkey")
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Portable per-shingle base hashes (60-bit md5 prefix mod
    * p = 2^31−1) as a ROW-LOCAL array column — the same family as
    * [[minhashPairsPortable]] but computed without any aggregation: a
    * document's signature is a pure function of its own shingle set.
    * That row-locality is what lets the LSH index probe run on a
    * STREAM projection (no groupBy, no state) — see
    * [[graft.streaming.DocsStream.streamingNearDupGate]]. */
  def portableShingleHashes(shingles: Column): Column =
    transform(shingles, s =>
      (conv(substring(md5(s), 1, 15), 16, 10).cast("long") %
        lit(2147483647L)))

  /** Row-local portable LSH band keys from [[portableShingleHashes]]
    * output: k permutation minima (h_i(x) = (a_i·x + b_i) mod p,
    * exact in int64), grouped into `bands` comma-joined keys —
    * value-identical to the groupBy-min form in
    * [[minhashPairsPortable]], replayed by the same DuckDB CTE.
    * Callers must filter empty shingle sets first (array_min over an
    * empty array is null → degenerate "" keys would cross-match every
    * tokenless doc). */
  def portableBandKeysFromHashes(h0: Column, k: Int = 32,
      bands: Int = 8): Column = {
    require(bands > 0 && k % bands == 0,
      s"bands must divide k: k=$k bands=$bands")
    val P = 2147483647L
    val r = k / bands
    val slots = (0 until k).map { i =>
      val a = ((i + 1).toLong * 2654435761L) % P
      val b = ((i + 1).toLong * 2245399549L) % P
      array_min(transform(h0, h => (lit(a) * h + lit(b)) % P))
    }
    array((0 until bands).map { b =>
      concat_ws(",", slots.slice(b * r, (b + 1) * r): _*)
    }: _*)
  }

  // --------------------------------------------------- incremental dedup

  /** Incremental dedup: which documents of a NEW batch survive against
    * an already-built corpus — the daily-increment step of a continuous
    * corpus build. A batch doc is dropped when
    *   (a) its exact fingerprint (md5 of normalized text) exists in the
    *       corpus,
    *   (b) a corpus doc in the same block has word-`n`-gram Jaccard ≥
    *       `threshold`, or
    *   (c) an earlier batch doc (smaller id) has the same fingerprint.
    * Returns the kept batch rows (id + block columns).
    *
    * Scale shape: the exact stage is one hash shuffle on a 16-byte key
    * with the corpus side reduced to distinct fingerprints; the near
    * stage is a corpus×batch (not corpus×corpus) join bounded by the
    * block key, so per-block cost is |corpus block|·|batch block| — the
    * batch factor is a day's increment, not the accumulated corpus. For
    * unblocked 100 TB inputs compose the MinHash path instead
    * ([[lshCandidatePairs]] over the union, filtered to cross-side
    * pairs). Tokenless docs cannot pair and skip the near stage. */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.6,
      blockCols: Seq[String] = Seq.empty): DataFrame = {
    val corpusFps = corpus
      .select(TF.fingerprint(col(textCol)).as("fp")).distinct()
    val batchFps = batch.select(
      (col(idCol) +: blockCols.map(col)) :+
        TF.fingerprint(col(textCol)).as("fp"): _*)
    // (c) min-id representative per fingerprint within the batch
    val batchReps = batchFps
      .withColumn("_keep_id", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col(idCol) === col("_keep_id"))
      .drop("_keep_id")
    def shingled(df: DataFrame): DataFrame = df
      .select((col(idCol).as("id") +: blockCols.map(col)) :+
        TF.tokens(col(textCol)).as("toks"): _*)
      .filter(size(col("toks")) > 0)
      .select((col("id") +: blockCols.map(col)) :+
        graft.functions.ShingleFunctions.distinctShingles(col("toks"), n).as("ng"): _*)
    val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(lit(true))(_ && _)
    // (b) batch ids with a near-dup partner anywhere in the corpus
    val nearDropped = shingled(batch).as("a")
      .join(shingled(corpus).as("b"), joinCond)
      .filter(
        size(array_intersect(col("a.ng"), col("b.ng"))).cast("double") /
          size(array_union(col("a.ng"), col("b.ng"))).cast("double")
          >= threshold)
      .select(col("a.id").as(idCol)).distinct()
    batchReps
      .join(corpusFps, Seq("fp"), "left_anti")     // (a)
      .join(nearDropped, Seq(idCol), "left_anti")  // (b)
      .select(col(idCol) +: blockCols.map(col): _*)
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash per document. Bit j is the sign of the sum over
    * tokens of ±1 votes derived from xxhash64(token, j). Computed as
    * explode → one groupBy with 64 partial-aggregable sums → constant
    * shifts assemble the long; a single shuffle at any scale.
    * Tokenless documents get simhash 0. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one string hash per token; the 64 bits of that hash ARE the 64
    // per-plane votes (the same one-hash move the portable path makes
    // with its md5 prefix — and the same hash-once economics as
    // minhashSignatures: k bit extractions of a fixed-width long
    // instead of k string hashes)
    val toks = docs.select(col(idCol),
      explode(TF.tokens(col(textCol))).as("tok"))
      .select(col(idCol), xxhash64(col("tok")).as("h"))
    val votes = (0 until 64).map { j =>
      sum(shiftrightunsigned(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"v$j")
    }
    val agg = toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val hash = (0 until 64)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    docs.select(col(idCol)).distinct()
      .join(agg.select(col(idCol), hash.as("simhash")), Seq(idCol), "left")
      .na.fill(0L, Seq("simhash"))
  }

  /** SimHash with an ENGINE-PORTABLE bit source (same oracle-gate move
    * as [[minhashPairsPortable]]): all 60 vote bits come from ONE
    * 60-bit md5 prefix per token — cheaper than the xxhash64 path's
    * per-bit hash call, and every vote, bit and signature replays in
    * DuckDB (`(h >> j) & 1` is engine-identical integer math). Tokens
    * vote with multiplicity, like [[simhash]]; empty docs sign 0. */
  def simhashPortable(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TF.tokens(col(textCol))).as("tok"))
      .select(col(idCol),
        conv(substring(md5(col("tok")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val votes = (0 until 60).map { j =>
      sum(shiftrightunsigned(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"v$j")
    }
    val agg = toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val hash = (0 until 60)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    docs.select(col(idCol)).distinct()
      .join(agg.select(col(idCol), hash.as("simhash")), Seq(idCol), "left")
      .na.fill(0L, Seq("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (< 16):
    * pigeonhole-block on the four 16-bit chunks, then exact
    * bit_count(xor) filter. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val chunked = sh.select(col("id"), col("simhash"), posexplode(
      array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), 16 * c)
          .bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "simhash", "chunk", "cv")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------ n-gram jaccard

  /** All-pairs word n-gram Jaccard within blocks (`blockCols`).
    * Blocking keeps the quadratic pair-join bounded per block — at scale
    * the block key is the shuffle key and block sizes must be capped
    * upstream (use minhashDedup when no natural block exists). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, blockCols: Seq[String]): DataFrame = {
    val sets = docs
      .select((col(idCol).as("id") +: blockCols.map(col)) :+
        TF.tokens(col(textCol)).as("toks"): _*)
      .select((col("id") +: blockCols.map(col)) :+
        graft.functions.ShingleFunctions.distinctShingles(col("toks"), n).as("ng"): _*)
    val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    sets.as("a").join(sets.as("b"), joinCond)
      .withColumn("jaccard", round(
        size(array_intersect(col("a.ng"), col("b.ng"))).cast("double") /
          size(array_union(col("a.ng"), col("b.ng"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }

  // ------------------------------------------------------ repeated spans

  /** Cross-document repeated token SPANS — substring-level exact dedup
    * (the "dedup the span, not the document" pass of training-data
    * pipelines, after Lee et al. 2022's repeated-sequence findings):
    * every n-token window (stride 1) of every document is fingerprinted,
    * and spans occurring in ≥ `minDocs` distinct documents surface with
    * their occurrence counts. Document-level dedup misses these —
    * boilerplate paragraphs embedded in otherwise-unique pages.
    *
    * Scale shape: window generation is map-side (one transform over the
    * tokens array inside the scan stage — ~|tokens| rows per doc, same
    * cost class as the MinHash shingle explode). Aggregation is
    * two-level with the SPAN TEXT as the grouping key: (span, doc) →
    * per-doc occurrence counts, then (span) → doc/occurrence totals.
    * Grouping by the text instead of aggregating `min(span)` into a
    * string buffer keeps BOTH levels codegen'd HashAggregates with
    * all-long buffers (a string-valued aggregate buffer forces the
    * whole chain onto sort-based aggregation: at sf0.1 the same lane
    * planned Generate → Sort → SortAggregate ×4 over every span
    * occurrence), map-side combine dedups per-doc repeats before the
    * shuffle, and the md5 runs once per DISTINCT span after
    * aggregation, not once per occurrence. Wall-clock at sf0.1 is
    * explode-bound and unchanged; the sort removal is what matters
    * when the exploded rows no longer fit a sort buffer. No self-join,
    * no all-pairs anything. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long): DataFrame = {
    require(n >= 2, s"span length must be >= 2 tokens, got $n")
    docs
      .select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      // explode the POSITIONS, build each span string in the codegen'd
      // projection after — building them inside a transform() lambda is
      // interpreted (CodegenFallback), the same HOF cost the minhash
      // signature path avoids the same way
      .select(col("doc_id"), col("toks"), explode(
        sequence(lit(1), size(col("toks")) - (n - 1))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("i"), lit(n))).as("span"))
      .groupBy("span", "doc_id")
      .agg(count(lit(1)).as("occ"))
      .groupBy("span")
      .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .select(md5(col("span")).as("span_fp"), col("span"),
        col("n_docs"), col("n_occ"), col("first_doc"))
  }

  // --------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicates within blocks: pairs with cosine ≥
    * threshold. This is the VERIFY path: brute force within block is
    * O(block²) and a single hot block (one dominant label) goes
    * quadratic — `maxBlockRows` fails loudly before that happens
    * instead of silently burning a cluster. The production scale path
    * is [[SimilaritySearch.hyperplaneBucketsPortable]] (hyperplane-LSH
    * bucketing, corpus-size-independent bucket width) — route
    * near-dup candidate generation through it at any real corpus size
    * and keep this form for block-scoped verification.
    *
    * @param maxBlockRows guard: largest block the quadratic form may
    *        process (default 10k rows ⇒ ≤ ~50M comparisons per block) */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blockCols: Seq[String],
      maxBlockRows: Long = 10000L): DataFrame = {
    val v = emb.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+
        col(vecCol).as("vec"): _*)
    // one cheap aggregate over the ids (map-side combinable) before the
    // quadratic join is allowed to exist
    val hot = v.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBlockRows)
      .limit(1).collect()
    require(hot.isEmpty, {
      val b = hot.head
      s"embeddingNearDup: block (${blockCols.mkString(",")}) = " +
        s"(${blockCols.indices.map(b.get).mkString(",")}) has " +
        s"${b.getAs[Long]("n")} rows > maxBlockRows=$maxBlockRows — the " +
        "within-block join is quadratic; use " +
        "SimilaritySearch.hyperplaneBucketsPortable (LSH) at this scale"
    })
    val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    v.as("a").join(v.as("b"), joinCond)
      .withColumn("cos",
        round(VF.cosineSimilarity(col("a.vec"), col("b.vec")), 4))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (cluster the embedding
    * space, compare only within a cluster, keep one item per
    * near-duplicate set — the semantic-dedup recipe of Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): every vector is assigned to its NEAREST
    * prototype centroid (centroids trained per `protoCol` group —
    * deterministic integer-micro sums, [[EmbeddingStats.centroids]]),
    * near-dup pairs are found only within an assigned cluster, and
    * each connected near-dup component keeps its minimum id. The
    * learned assignment — not the labeled group — is the blocking
    * key, which is what lets the pass catch cross-label duplicates
    * that label-blocked [[embeddingNearDup]] by construction cannot.
    *
    * Scale shape: the centroid table is groups × dims (tiny at any
    * corpus size) → broadcast, so assignment is map-only; component
    * labeling is the bounded star-contraction of
    * [[ConnectedComponents]]. Within-cluster pair generation is
    * TIERED by cluster size:
    *   - clusters ≤ `maxClusterRows` take the exact quadratic
    *     [[embeddingNearDup]] path (the published SemDeDup recipe,
    *     byte-for-byte the oracle-pinned form);
    *   - an over-limit ("hot") cluster — real corpora have them by
    *     construction; a crawl's boilerplate cluster can be a double-
    *     digit percentage of the corpus — degrades to a scale-safe
    *     approximation instead of refusing: (1) bit-identical
    *     quantized vectors (×10⁴, the portable quantization) collapse
    *     into exact-duplicate groups linked by LINEAR star pairs to
    *     their min-id representative (still cosine-thresholded on the
    *     ORIGINAL vectors — a star edge below threshold is dropped);
    *     (2) the DISTINCT representatives sub-bucket under
    *     hyperplane LSH ([[SimilaritySearch.hyperplaneBucketsPortable]],
    *     `lshPlanes` ±1 hyperplanes) and pair quadratically only
    *     within (cluster, lsh-bucket). Exact duplication — the way
    *     hot clusters actually get hot — costs O(n); only the
    *     distinct-vector residue pays the bucketed quadratic, and a
    *     residue bucket larger than `maxClusterRows` still fails
    *     loudly (raise `lshPlanes` — each plane halves the expected
    *     bucket). The hot path trades recall (an LSH bucket boundary
    *     can split a near-dup pair) for a linear-in-duplicates cost,
    *     exactly the LSH trade the MinHash tier makes for text.
    *
    * Returns one row per input id: (id, cluster, dup_root, keep) —
    * `dup_root` the component's min id (itself if unpaired), `keep`
    * true exactly for the survivor of each component. */
  /** `hotClusterApprox` (default true) is the tier switch: false
    * restores the strict pre-r13 contract — an over-limit cluster
    * REFUSES loudly instead of degrading to the star+LSH
    * approximation, for callers whose recall requirements forbid a
    * silent downgrade (the approximation preserves precision — every
    * emitted pair is cosine-thresholded on the original vectors — but
    * can MISS pairs an LSH bucket boundary splits). When the
    * approximate tier does engage, a WARN names the hot clusters so
    * the downgrade is never silent. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      protoCol: String, threshold: Double,
      maxClusterRows: Long = 10000L, lshPlanes: Int = 8,
      hotClusterApprox: Boolean = true): DataFrame = {
    val cents = EmbeddingStats.centroids(emb, protoCol, vecCol)
    val base = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    // The centroid table is groups × dims — bounded metadata at any
    // corpus size (the same bound that justified broadcasting it), so
    // collect it and fold the argmax into ONE codegen'd projection:
    // assignment becomes genuinely map-only — the old
    // crossJoin(broadcast) → groupBy(id) → join(base) chain cost an
    // N-row aggregation exchange plus an N⋈N join for what is a pure
    // per-row function of `vec` (guide §2.4: remove shuffles outright).
    // Ties still break to the highest group id: `greatest` over
    // (cos, grp) structs is the same lexicographic max as the old
    // max(struct) aggregate (replayed in the oracle as ORDER BY
    // cos DESC, grp DESC); the collected doubles are the exact values
    // the broadcast column carried, so every cosine is bit-identical.
    val centRows = cents.collect()
      .map(r => (r.get(0), r.getSeq[Double](1)))
    val clusterExpr =
      if (centRows.isEmpty) lit(null).cast("long") // empty corpus
      else {
        val scored = centRows.map { case (grp, c) =>
          struct(
            VF.cosineSimilarity(col("vec"),
              typedlit(c.toSeq)).as("cos"),
            lit(grp).as("grp"))
        }
        (if (scored.size == 1) scored.head else greatest(scored: _*))
          .getField("grp").cast("long")
      }
    val withCluster = base.withColumn("cluster", clusterExpr)
    // hot-cluster census: one corpus pass into a cluster-keyed
    // aggregate bounded by the centroid-group count — the collect is
    // bounded metadata
    val hotIds: Seq[Long] = withCluster.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxClusterRows)
      .select(col("cluster")).collect().map(_.getLong(0)).toSeq
    val pairs =
      if (hotIds.isEmpty)
        // no hot cluster: EXACTLY the published recipe's plan (the
        // oracle-pinned form — no extra operators on this path)
        embeddingNearDup(withCluster, "id", "vec", threshold,
          blockCols = Seq("cluster"), maxBlockRows = maxClusterRows)
      else {
        require(hotClusterApprox,
          s"semanticDedup: cluster(s) ${hotIds.sorted.mkString(", ")} " +
            s"exceed maxClusterRows=$maxClusterRows and " +
            "hotClusterApprox=false forbids the approximate star+LSH " +
            "tier — raise maxClusterRows, refine the prototypes, or " +
            "allow the approximation (it preserves precision but can " +
            "miss pairs split across LSH buckets)")
        // the downgrade is deliberate but must never be silent:
        // exactness-dependent callers can see it engage and opt out
        System.err.println(
          s"[semanticDedup] WARN: cluster(s) ${hotIds.sorted.mkString(", ")} " +
            s"exceed maxClusterRows=$maxClusterRows — taking the " +
            "approximate star+LSH tier for them (precision preserved, " +
            "recall may drop at LSH bucket boundaries); pass " +
            "hotClusterApprox=false to refuse instead")
        val cold = withCluster.filter(!col("cluster").isin(hotIds: _*))
        val hot = withCluster.filter(col("cluster").isin(hotIds: _*))
        val coldPairs = embeddingNearDup(cold, "id", "vec", threshold,
          blockCols = Seq("cluster"), maxBlockRows = maxClusterRows)
        // (1) exact-duplicate collapse: the portable ×10⁴ quantization
        // fingerprints each vector; groups shuffle on (cluster, fp) —
        // duplicates distribute by CONTENT, so one hot cluster of n
        // copies is one group, not one hot task per comparison
        val hq = hot.withColumn("__q",
          transform(col("vec"), x => round(x * 10000).cast("long")))
          .withColumn("__fp",
            md5(concat_ws(",", transform(col("__q"), _.cast("string")))))
        val repOf = hq.groupBy(col("cluster"), col("__fp"))
          .agg(min(col("id")).as("__rep"))
        val withRep = hq.join(repOf, Seq("cluster", "__fp"))
        val repRows = withRep.filter(col("id") === col("__rep"))
          .select(col("cluster"), col("__fp"),
            col("id").as("__rid"), col("vec").as("__rvec"))
        // star edges rep→member, still thresholded on the ORIGINAL
        // vectors (quantized-identical ⇒ cosine ≈ 1, but the filter
        // keeps the contract exact rather than assumed)
        val starPairs = withRep.filter(col("id") =!= col("__rep"))
          .join(repRows, Seq("cluster", "__fp"))
          .withColumn("cos",
            round(VF.cosineSimilarity(col("vec"), col("__rvec")), 4))
          .filter(col("cos") >= threshold)
          .select(col("__rid").as("id_a"), col("id").as("id_b"),
            col("cos"))
        // (2) distinct representatives: LSH sub-bucket, quadratic only
        // within (cluster, bucket); the residue guard still applies
        val dim = repRows.select(size(col("__rvec")).as("d"))
          .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(0)
        val planes = SimilaritySearch.portablePlanes(lshPlanes, dim)
        // zero planes (or dim unknown) = one bucket — the inner join
        // against an empty bucket frame would silently DROP every rep
        val reps =
          if (planes.isEmpty)
            repRows.select(col("__rid").as("id"), col("__rvec").as("vec"),
              col("cluster"), lit(0L).as("bucket"))
          else {
            val buckets = SimilaritySearch.hyperplaneBucketsPortable(
              repRows.select(col("__rid"), col("__rvec")), "__rid",
              "__rvec", planes)
            repRows.join(buckets, Seq("__rid"))
              .select(col("__rid").as("id"), col("__rvec").as("vec"),
                col("cluster"), col("bucket"))
          }
        val repPairs = embeddingNearDup(reps, "id", "vec", threshold,
          blockCols = Seq("cluster", "bucket"),
          maxBlockRows = maxClusterRows)
        coldPairs.unionByName(starPairs).unionByName(repPairs)
      }
    val comp = ConnectedComponents.labels(pairs, "id_a", "id_b")
    withCluster.select(col("id"), col("cluster"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("cluster_id"), col("id")).as("dup_root"))
      .withColumn("keep", col("dup_root") === col("id"))
  }
}
