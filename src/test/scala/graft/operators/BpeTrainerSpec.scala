package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training on hand corpora: merge order and counts computed by
  * hand, consecutive-repeat greedy semantics, and the encode
  * round-trip. */
class BpeTrainerSpec extends SparkSpec {

  import spark.implicits._

  test("learns hand-computed merges in frequency order") {
    // word frequencies: "aab" x3, "ab" x2 -> pair counts:
    //   (a,a)=3, (a,b)=5, ... merge 1 = (a,b) c=5
    // after: aab -> a ab, ab -> ab; pairs: (a,ab)=3 -> merge 2
    val df = Seq("aab ab aab", "ab aab").toDF("text")
    val got = BpeTrainer.trainMerges(df, "text", nMerges = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a", "b", 5L), (2, "a", "ab", 3L)))
  }

  test("consecutive repeats merge greedily left-to-right (aaaa -> aa aa)") {
    val df = Seq("aaaa").toDF("text")
    val m = BpeTrainer.trainMerges(df, "text", nMerges = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // pairs of 'a a a a': 3 adjacent (a,a) -> merge 1 = (a,a) c=3
    assert(m(0) === (("a", "a", 3L)))
    // spelling is now 'aa aa' (greedy non-overlapping), so merge 2
    // must be (aa, aa) with count 1 — NOT (aa, a)
    assert(m(1) === (("aa", "aa", 1L)))
  }

  test("batched training ≡ sequential on a multi-word corpus") {
    // distinct letter regions make several disjoint merges available
    // per batch; conflicting pairs must end the prefix, not be skipped
    val df = Seq("aab ab xy xy xyz", "ab aab xy qq qq qqr").toDF("text")
    def run(b: Int) = BpeTrainer.trainMerges(df, "text",
      nMerges = 6, batchSize = b).orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    val seqOrder = run(1)
    assert(run(3) === seqOrder)
    assert(run(6) === seqOrder)
  }

  test("batched self-pair argmax doesn't stall (aaaa, batchSize 4)") {
    val df = Seq("aaaa").toDF("text")
    val m = BpeTrainer.trainMerges(df, "text", nMerges = 2, batchSize = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // (a,a) is the argmax AND overlaps itself: batch accepts exactly it,
    // recounts, then learns (aa,aa) — identical to sequential
    assert(m.toSeq === Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("stops early when the vocabulary runs out of pairs") {
    val df = Seq("ab ab").toDF("text")
    val m = BpeTrainer.trainMerges(df, "text", nMerges = 10).collect()
    // merge 1 = (a,b); after that every word is one symbol — no pairs
    assert(m.length === 1)
  }

  test("encode applies merges in rank order; counts match segmentation") {
    val corpus = Seq("aab ab aab", "ab aab").toDF("text")
    val merges = BpeTrainer.trainMerges(corpus, "text", 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = BpeTrainer.encode(Seq(("x", "aab ab c")).toDF("id", "text"),
      "text", merges).select("bpe_tokens", "n_bpe_tokens").collect().head
    // aab: merge1 makes 'a ab', merge2 fuses to 'aab'; ab -> 'ab'; c -> 'c'
    assert(enc.getString(0) === "aab ab c")
    assert(enc.getLong(1) === 3L)
  }
}
