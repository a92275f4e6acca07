package graft

import graft.etl.{CsvExport, RawCsvSource, TripsSchemas, TripsTransform}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage (SURVEY.md §5): invariants that must hold for
  * arbitrary inputs, not just the hand-picked fixtures.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic ScalaCheck sampling (no scalatest bridge in the
    * offline cache): one seeded draw of n cases per property. */
  private def samples[A](g: Gen[A], n: Int = 25, seed: Long = 42L): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  test("payment canon maps every in-domain spelling; everything else UNK") {
    val domain = TripsSchemas.paymentCanon.flatMap { case (c, ss) =>
      ss.map(_ -> c)
    }
    val genIn = Gen.oneOf(domain.keys.toSeq)
    val genOut = Gen.alphaNumStr.suchThat(s => !domain.contains(s))
    samples(genIn).foreach { s =>
      val got = Seq(s).toDF("p")
        .select(TripsTransform.canonPaymentType(col("p"))).head().getString(0)
      assert(got === domain(s))
    }
    samples(genOut).foreach { s =>
      val got = Seq(s).toDF("p")
        .select(TripsTransform.canonPaymentType(col("p"))).head().getString(0)
      assert(got === "UNK")
    }
  }

  test("CSV sink→source round-trip preserves values and nulls") {
    val genRow = for {
      id <- Gen.choose(0L, Long.MaxValue / 2)
      s <- Gen.option(Gen.alphaNumStr.map(_.take(20)))
      q <- Gen.option(Gen.choose(-1e6, 1e6))
    } yield (id, s.orNull, q.map(Double.box).orNull)
    samples(Gen.listOfN(20, genRow), n = 5).foreach { rows =>
      if (rows.nonEmpty) {
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map {
            case (a, b, c) => org.apache.spark.sql.Row(a, b, c)
          }),
          StructType(Seq(
            StructField("id", LongType, nullable = false),
            StructField("s", StringType),
            StructField("q", DoubleType))))
        val dir = java.nio.file.Files
          .createTempDirectory("prop_csv").toString
        CsvExport.write(df, dir, shards = 2)
        val back = RawCsvSource.read(spark, dir, df.schema)
        val got = back.collect()
          .map(r => (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) null else r.getDouble(2))).toSet
        val want = rows.map { case (a, b, c) =>
          // the sink writes empty string for "" and \N for null; both
          // read back as null — the reference's trans.py semantics
          (a, if (b != null && b.isEmpty) null else b, c)
        }.toSet
        assert(got === want)
      }
    }
  }

  test("transform preserves row count for arbitrary null patterns") {
    val genFlag = Gen.oneOf("Y", "N", "1", "2", "")
    val genPay = Gen.oneOf("CSH", "Cash", "2", "junk", "")
    samples(Gen.listOfN(10, Gen.zip(genFlag, genPay)), n = 5).foreach { rows =>
      if (rows.nonEmpty) {
        val csv = rows.zipWithIndex.map { case ((f, p), i) =>
          val cols = Array.fill(51)("")
          cols(0) = i.toString; cols(1) = "CMT"
          cols(2) = "2015-01-05 10:00:00"; cols(4) = f; cols(20) = p
          cols.mkString(",")
        }
        val dir = java.nio.file.Files
          .createTempDirectory("prop_raw").toString
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, "t.csv"),
          csv.mkString("\n").getBytes)
        val out = TripsTransform(RawCsvSource.read(spark, dir))
        assert(out.count() === rows.size.toLong)
        // every payment lands in the 5-value canon domain
        val canon = out.select("payment_type_").distinct()
          .as[String].collect().toSet
        assert(canon.subsetOf(Set("CSH", "CRE", "NOC", "DIS", "UNK")))
      }
    }
  }

  test("rollingHash stays within the modulus for arbitrary text") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val h = Seq(s).toDF("t")
        .select(TextFunctions.rollingHash(col("t"))).head().getLong(0)
      assert(h >= 0L && h < 1000000007L)
    }
  }

  test("sample nesting holds for arbitrary fraction pairs and keys") {
    import graft.operators.Sampling
    val keys = (1L to 400L).toDF("k")
    samples(Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)), n = 8)
      .foreach { case (f1, f2) =>
        val (lo, hi) = (math.min(f1, f2), math.max(f1, f2))
        val a = Sampling.deterministicSample(keys, "k", lo)
          .collect().map(_.getLong(0)).toSet
        val b = Sampling.deterministicSample(keys, "k", hi)
          .collect().map(_.getLong(0)).toSet
        assert(a.subsetOf(b), s"nesting violated for ($lo, $hi)")
      }
  }

  test("split assignment is total and consistent with the split weights") {
    import graft.operators.Sampling
    val keys = (1L to 300L).toDF("k")
    samples(Gen.choose(0.05, 0.95), n = 6).foreach { w =>
      val out = Sampling.split(keys, "k", Seq("a" -> w, "b" -> (1.0 - w)))
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.values.sum === 300L)
      assert(out.keySet.subsetOf(Set("a", "b")))
    }
  }

  test("jaccard is symmetric and bounded for arbitrary token lists") {
    val genDoc = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e"))
      .map(_.mkString(" "))
    samples(Gen.zip(genDoc, genDoc), n = 10).foreach { case (t1, t2) =>
      val df = Seq((1L, "g", t1), (2L, "g", t2)).toDF("id", "grp", "text")
      val out = graft.operators.Dedup.ngramJaccardPairs(
        df, "id", "text", n = 2, threshold = 0.0, blockCols = Seq("grp"))
        .collect()
      assert(out.length === 1)
      val j = out.head.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      if (t1 == t2) assert(j === 1.0)
    }
  }

  test("packing invariants hold for arbitrary token-count corpora") {
    import graft.operators.Packing
    val genDocs = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0L, 150L)))
      .map(_.distinctBy(_._1))
    samples(genDocs, n = 5).foreach { docs =>
      val df = docs.toDF("id", "tok")
      val budget = 100L
      // chunk placement tiles each shard without gaps or overlaps
      val chunk = Packing.chunkPack(df, "id", "tok", budget, shards = 4)
        .collect()
      chunk.groupBy(_.getLong(1)).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getLong(2))
        sorted.foldLeft(0L) { (expectStart, r) =>
          assert(r.getLong(2) === expectStart)
          expectStart + docs.find(_._1 == r.getLong(0)).get._2
        }
      }
      // next-fit never overflows a multi-doc sequence; every doc
      // appears exactly once; seq ids are dense from 0 per shard
      val packed = Packing.nextFitPack(df, "id", "tok", budget, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(packed.map(_._1).sorted.toSeq ===
        docs.map(_._1).sorted.toSeq)
      val toks = docs.toMap
      packed.groupBy(p => (p._2, p._3)).foreach { case (_, members) =>
        val fill = members.map(m => toks(m._1)).sum
        // an over-budget sequence is only ever one oversized document
        // (possibly sharing with zero-token docs that add nothing)
        assert(fill <= budget ||
          members.count(m => toks(m._1) > 0) === 1)
      }
      packed.groupBy(_._2).foreach { case (_, rows) =>
        val seqs = rows.map(_._3).distinct.sorted
        assert(seqs.toSeq === (0L until seqs.size).toSeq)
      }
    }
  }

  test("CDC chunks tile arbitrary documents exactly") {
    import graft.operators.ContentChunker
    val genDoc = for {
      n <- Gen.choose(1, 300)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ ' ' :+ '0'))
    } yield cs.mkString
    val docs = samples(genDoc, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = ContentChunker.chunks(docs.toDF("doc_id", "text"),
      "doc_id", "text", window = 8, divisor = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).groupBy(_._1)
    docs.foreach { case (id, t) =>
      val ch = got(id).sortBy(_._2)
      assert(ch.head._3 === 1L, s"doc $id first chunk start")
      assert(ch.map(_._4).sum === t.length.toLong, s"doc $id tiling")
      ch.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) => assert(s2 === s1 + l1)
        case _ =>
      }
    }
  }

  test("bounded top-k aggregate equals sort-take for arbitrary inputs") {
    import graft.functions.BoundedTopKAgg
    val genVals = Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))
    samples(genVals, 15).zipWithIndex.foreach { case (vs, i) =>
      val k = (i % 5) + 1
      val row = vs.toDF("v")
        .agg(BoundedTopKAgg.boundedTopK(col("v"), k).as("tk"))
        .select(col("tk.cnt"), col("tk.ids")).head()
      assert(row.getLong(0) === vs.length.toLong)
      assert(row.getSeq[Long](1) === vs.sorted.take(k))
    }
  }

  test("BPE merges are invariant to document order and layout") {
    import graft.operators.BpeTrainer
    val corpus = Seq("the cat sat", "the hat", "a cat a hat", "sat the cat")
    def mergesOf(rows: Seq[String], parts: Int) =
      BpeTrainer.trainMerges(
        rows.toDF("text").repartition(parts), "text", nMerges = 4)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val base = mergesOf(corpus, 1)
    assert(mergesOf(corpus.reverse, 3) === base)
    assert(mergesOf(corpus, 7) === base)
    assert(base.length === 4)
  }

  test("histogram quantile brackets the true rank for arbitrary data") {
    import graft.operators.HistogramQuantile
    val genVals = Gen.nonEmptyListOf(Gen.choose(0L, 5000L))
    samples(genVals, 10).foreach { vs =>
      val binW = 100L
      val out = HistogramQuantile.quantiles(
        vs.map(("g", _)).toDF("g", "c"), "g", col("c"),
        binWidth = binW, perUnit = 1L,
        qs = Seq(("p50", 1, 2), ("p90", 9, 10)))
        .collect().map(r => r.getString(1) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val sorted = vs.sorted
      Seq(("p50", 1, 2), ("p90", 9, 10)).foreach { case (lbl, qn, qd) =>
        val target = (vs.length.toLong * qn + qd - 1) / qd
        val (gotRank, est) = out(lbl)
        assert(gotRank === target, s"$lbl rank on $vs")
        // the estimate lives inside the bin that holds the target rank
        val trueVal = sorted((target - 1).toInt)
        assert(math.abs(est - trueVal) <= binW.toDouble,
          s"$lbl est=$est true=$trueVal")
      }
    }
  }

  test("portable minhash jaccard is bounded and pairs are ordered") {
    import graft.operators.Dedup
    val genDoc = for {
      n <- Gen.choose(4, 40)
      ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta",
        "epsilon", "zeta", "eta", "theta"))
    } yield ws.mkString(" ")
    val docs = samples(genDoc, 20).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val pairs = Dedup.minhashPairsPortable(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.foreach { case (a, b, j) =>
      assert(a < b, s"pair order ($a,$b)")
      assert(j >= 0.0 && j <= 1.0, s"jaccard $j")
    }
    // identical docs must collide in every band → jaccard 1.0
    val twins = (docs :+ (100L, docs.head._2)).toDF("doc_id", "text")
    val hit = Dedup.minhashPairsPortable(twins, "doc_id", "text",
      k = 16, bands = 4)
      .filter(col("id_a") === docs.head._1 && col("id_b") === 100L)
      .collect()
    assert(hit.length === 1 && hit.head.getDouble(2) === 1.0)
  }

  test("MergeInto equals the set-algebra reference for arbitrary changesets") {
    import graft.operators.MergeInto
    // base keys 0..19; changeset draws disjoint action sets over 0..29
    // (keys >= 20 exercise insert and orphan-delete paths)
    val genActions = for {
      upd <- Gen.someOf(0L to 29L)
      del <- Gen.someOf((0L to 29L).filterNot(upd.contains))
    } yield (upd.toSet, del.toSet)
    samples(genActions, n = 8).foreach { case (upd, del) =>
      val base = (0L until 20L).map(k => (k, s"v$k")).toDF("k", "v")
      val changes =
        (upd.toSeq.sorted.map(k => (k, s"U$k", false)) ++
          del.toSeq.sorted.map(k => (k, "", true)))
          .toDF("k", "v", "_delete")
      val got = MergeInto.merge(base, changes, "k", "_delete")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // reference: survivors keep or take update; live inserts appear
      val want =
        (0L until 20L).filterNot(del.contains)
          .map(k => k -> (if (upd.contains(k)) s"U$k" else s"v$k")).toSet ++
          upd.filter(_ >= 20L).map(k => k -> s"U$k")
      assert(got === want, s"upd=$upd del=$del")
    }
  }

  test("GradientTrainer: distributed trajectory == exact replay on random frames") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import graft.operators.GradientTrainer
    val genRow = for {
      a <- Gen.choose(-40L, 40L)
      b <- Gen.choose(0L, 60L)
      y <- Gen.oneOf(0.0, 1.0)
    } yield (a, b, y)
    samples(Gen.listOfN(8, genRow), n = 3, seed = 7L).foreach { rows =>
      val df = rows.toDF("a", "b", "y")
      val feats = Seq[(String, org.apache.spark.sql.Column)](
        ("a", col("a")), ("b", col("b")))
      val got = GradientTrainer.train(df, feats, col("y"),
        lrNum = 1L, lrDen = 2L, iters = 2).head()
      def r12(d: Double): Double =
        new JBD(d).setScale(12, RoundingMode.HALF_UP).doubleValue
      val n = rows.length
      val stats = (0 until 2).map { j =>
        val vs = rows.map(r => if (j == 0) r._1 else r._2)
        val m = r12(vs.sum.toDouble / n)
        val v = r12(vs.map(x => x * x).sum.toDouble / n - m * m)
        (m, if (v > 0) r12(math.sqrt(v)) else 1.0)
      }
      val xs = rows.map { r =>
        (Array(r12((r._1 - stats(0)._1) / stats(0)._2),
          r12((r._2 - stats(1)._1) / stats(1)._2)), r._3)
      }
      val bigB = BigInt(2) * n * 1000000L
      var w = Array.fill(3)(0L)
      for (_ <- 1 to 2) {
        val sums = Array.fill(3)(BigInt(0))
        for ((x, y) <- xs) {
          val wd = w.map(_.toDouble / 1000000.0)
          val res = wd(0) + wd(1) * x(0) + wd(2) * x(1) - y
          for (j <- 0 to 2) {
            val c = if (j == 0) res else res * x(j - 1)
            sums(j) += BigInt(new JBD(c).setScale(12,
              RoundingMode.HALF_UP).movePointRight(12).toBigIntegerExact)
          }
        }
        w = w.indices.map { j =>
          val a = sums(j)
          w(j) - (a.signum * ((a.abs * 2 + bigB) / (bigB * 2))).toLong
        }.toArray
      }
      assert(got.getAs[Long]("w_intercept_micro") == w(0) &&
        got.getAs[Long]("w_a_micro") == w(1) &&
        got.getAs[Long]("w_b_micro") == w(2),
        s"trajectory diverged on $rows")
    }
  }

  test("ProductQuantizer: ADC price == reconstruction on random vectors") {
    import graft.operators.ProductQuantizer
    val genVec = Gen.listOfN(8, Gen.choose(-2.0f, 2.0f))
    samples(Gen.listOfN(12, genVec), n = 3, seed = 11L).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val cb = ProductQuantizer.trainCodebooks(df, "vec_id", "embedding",
        m = 2, k = 4, subDim = 4, lloydIters = 1)
      val codes = ProductQuantizer.encode(df, "vec_id", "embedding",
        cb, m = 2, subDim = 4)
      val probes = df.filter(col("vec_id") < 2)
      val got = ProductQuantizer.adcTopK(codes, cb, probes,
        "vec_id", "embedding", subDim = 4, k = 5)
      val psub = probes.select(col("vec_id").as("probe_id"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("probe_id"), (col("dim") / 4).cast("int").as("m"),
          (col("dim") % 4).cast("int").as("j"),
          floor(col("v").cast("double") * 1000000L).cast("long").as("pm"))
      val candCb = codes.select(col("vec_id").as("cand_id"), col("m"),
        col("code").cast("int").as("g")).join(cb, Seq("m", "g"))
      val direct = psub.join(candCb, Seq("m", "j"))
        .filter(col("cand_id") =!= col("probe_id"))
        .groupBy("probe_id", "cand_id")
        .agg(sum((col("pm") - col("cm")) * (col("pm") - col("cm")))
          .as("ddist"))
      val joined = got.join(direct, Seq("probe_id", "cand_id"))
      assert(joined.count() == got.count())
      assert(joined.filter(col("adist") =!= col("ddist")).count() == 0L)
    }
  }

  test("sparse cosine pairs == brute-force cosine for arbitrary corpora") {
    import graft.operators.RelevanceScoring
    val genDoc = Gen.listOfN(6,
      Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx")).map(_.mkString(" "))
    samples(Gen.listOfN(8, genDoc), n = 3, seed = 7L).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = RelevanceScoring.sparseCosinePairs(
        df, "doc_id", "text", maxDf = 100L, minCos = 0.0)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          r.getAs[Double]("cos")).toMap
      // Scala-side brute force over the same 4-dp tf-idf weights
      val n = texts.length
      val tf = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split("\\s+").groupBy(identity)
          .map { case (w, g) => w -> g.length }
      }.toMap
      val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
        .map { case (w, g) => w -> g.size }
      def w(tfv: Int, dfv: Int): Double = {
        val raw = (1.0 + math.log(tfv)) *
          math.log((n + 1.0) / (dfv + 1.0))
        BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
      val vecs = tf.map { case (id, m) =>
        id -> m.map { case (t, c) => t -> w(c, dfreq(t)) }
      }
      for (a <- 0L until n.toLong; b <- a + 1 until n.toLong) {
        val (va, vb) = (vecs(a), vecs(b))
        val shared = va.keySet & vb.keySet
        val dot = shared.toSeq.map(t => va(t) * vb(t)).sorted.sum
        val expected =
          if (shared.isEmpty) None
          else {
            val na = math.sqrt(va.values.map(x => x * x).sum)
            val nb = math.sqrt(vb.values.map(x => x * x).sum)
            Some(BigDecimal(dot / (na * nb))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        (got.get((a, b)), expected) match {
          case (Some(g), Some(e)) =>
            assert(math.abs(g - e) <= 1e-4, s"pair ($a,$b): $g vs $e")
          case (None, None) => ()
          case other => fail(s"pair ($a,$b) presence mismatch: $other")
        }
      }
    }
  }

  test("whole-vector KMeans assignment is the true argmin for random input") {
    import graft.operators.ProductQuantizer
    val genVec = Gen.listOfN(4, Gen.choose(-3.0f, 3.0f))
    samples(Gen.listOfN(10, genVec), n = 3, seed = 13L).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val cb = ProductQuantizer.trainCodebooks(df, "vec_id", "embedding",
        m = 1, k = 3, subDim = 4, lloydIters = 2, salt = "km")
      val cents = cb.collect()
        .groupBy(_.getAs[Int]("g"))
        .map { case (g, rows) =>
          g -> rows.sortBy(_.getAs[Int]("j")).map(_.getAs[Long]("cm"))
        }
      val assign = ProductQuantizer.encode(df, "vec_id", "embedding",
        cb, m = 1, subDim = 4).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("code")).toMap
      vs.zipWithIndex.foreach { case (v, i) =>
        val micro = v.map(x => math.floor(x.toDouble * 1e6).toLong)
        val best = cents.toSeq.map { case (g, c) =>
          (micro.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, g)
        }.min // (dist, g) — ties to lowest cluster id
        assert(assign(i.toLong) === best._2.toLong, s"vec $i")
      }
    }
  }
}
