package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {
  import EntropyFunctions.charEntropy

  private def ent(s: String): Double = {
    import spark.implicits._
    Seq(s).toDF("t").select(charEntropy(col("t"))).head().getDouble(0)
  }

  test("closed-form values: uniform and degenerate distributions") {
    assert(ent("") === 0.0)
    assert(ent("aaaa") === 0.0)
    assert(math.abs(ent("ab") - 1.0) < 1e-12)
    assert(math.abs(ent("abcd") - 2.0) < 1e-12)
    assert(math.abs(ent("abcdefgh") - 3.0) < 1e-12)
    // 3/4–1/4 split: H = 2 - 0.75·log2(3) exactly
    val h = 2.0 - 0.75 * (math.log(3.0) / math.log(2.0))
    assert(math.abs(ent("aaab") - h) < 1e-12)
  }

  test("interpreted eval matches codegen (and a direct Scala replay)") {
    import spark.implicits._
    val docs = Seq("the quick brown fox", "aAbB  cC!!", "zzzz zzzz z",
      "0123456789abcdef" * 4, "éée☃")
    val df = docs.toDF("t")
    val viaCodegen = df.select(charEntropy(col("t")).as("e"))
      .collect().map(_.getDouble(0))
    // wholeStage off → interpreted/non-fused path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val viaEval =
      try df.select(charEntropy(col("t")).as("e")).collect()
        .map(_.getDouble(0))
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    def replay(s: String): Double = {
      if (s.isEmpty) return 0.0
      val g = s.groupBy(identity).map(_._2.length)
      val n = s.length.toDouble
      val log2 = (x: Double) => math.log(x) / math.log(2.0)
      log2(n) - g.map(c => c * log2(c.toDouble)).sum / n
    }
    docs.zip(viaCodegen).zip(viaEval).foreach { case ((d, cg), ev) =>
      assert(math.abs(cg - ev) < 1e-12, s"codegen vs eval on '$d'")
      assert(math.abs(cg - replay(d)) < 1e-12, s"replay on '$d'")
    }
  }

  test("ordering property: degenerate < prose < near-uniform random") {
    val flood = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    val prose = "It was the best of times, it was the worst of times."
    val hex = "4f8a1c6e2b9d7035e1a6c8f04b2d9371"
    assert(ent(flood) < ent(prose) && ent(prose) < 5.0)
    assert(ent(hex) > 3.5) // 16 symbols near-uniform → close to 4
  }

  test("supplementary-plane text counts UTF-16 code units (documented)") {
    // U+1D11E (musical G clef) is the surrogate pair D834 DD1E. "𝄞𝄞"
    // is 4 code units over 2 distinct symbols → H = 1.0 exactly. A
    // per-CHARACTER count (DuckDB's string_split) would see one char
    // repeated → 0.0. This pins the expression's documented unit —
    // the oracle fixture is ASCII, where the two definitions coincide.
    val clef = "𝄞"
    assert(math.abs(ent(clef + clef) - 1.0) < 1e-12)
    assert(math.abs(ent(clef) - 1.0) < 1e-12) // 2 units, each once
  }

  test("null row stays null") {
    import spark.implicits._
    val r = Seq(Some("ab"), None).toDF("t")
      .select(charEntropy(col("t")).as("e")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
