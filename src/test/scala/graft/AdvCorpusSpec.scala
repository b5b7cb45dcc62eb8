package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[ScaleUp.advDocs]] — the adversarial corpus behind the
  * BASELINE §15 A/B. The generator is a measurement instrument, so its
  * load-bearing properties are pinned: the shape properties that make it
  * adversarial (heavy tail, corpus-global boilerplate) and the one that
  * keeps it a filter STRESS test instead of an output blowup (bounded
  * boilerplate-only overlap), plus filter losslessness on the shape (the
  * prefix tier's pair set ≡ the exact formulation's).
  */
class AdvCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sbt test pins the fast factor-1 shape at sf0.001; the round-close
  // adversarial gate (tools/run_adv_gate.sh) re-runs this suite at
  // sf0.01-equivalent via the override — the CORRECTNESS-style
  // losslessness check that would catch a filter regression per-round
  private val dir =
    sys.env.getOrElse("GRAFT_ADV_SPEC_DIR", "/root/testdata/sf0.001")

  private lazy val adv = {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    ScaleUp.advDocs(
      spark.read.parquet(s"$dir/documents.parquet"), k = 0).cache()
  }
  private def toks = split(col("text"), " ")

  test("adv: every body has at least the 64-token floor") {
    val mn = adv.agg(min(size(toks))).head.getInt(0)
    assert(mn >= 64, s"min token count $mn < 64 — boilerplate-only " +
      "overlap is no longer bounded below the pair thresholds (§15a)")
  }

  test("adv: lengths are heavy-tailed (p99 well above median)") {
    val r = adv.agg(
      expr("percentile(size(split(text, ' ')), 0.5)").as("med"),
      expr("percentile(size(split(text, ' ')), 0.99)").as("p99")).head
    val (med, p99) = (r.getDouble(0), r.getDouble(1))
    assert(p99 > 3 * med,
      s"p99 $p99 vs median $med — tail collapsed; the length filter " +
        "has nothing to prune on a uniform corpus")
  }

  test("adv: boilerplate families are verbatim and corpus-global") {
    // ~40% of docs end in a family block; the block text is identical
    // across member docs (no replica/doc suffix)
    val fam = adv.filter(col("text").rlike("bp\\d+w23$"))
    val n = adv.count()
    val nf = fam.count()
    assert(nf > n / 4 && nf < n * 11 / 20, s"family share $nf/$n not ~40%")
    val distinctBlocks = fam
      .select(regexp_extract(col("text"), "(bp\\d+w0( |$).*)$", 1).as("b"))
      .distinct().count()
    assert(distinctBlocks <= 20,
      s"$distinctBlocks distinct block texts — blocks must be verbatim " +
        "family-shared (suffixing them un-shares the stop-shingles)")
  }

  test("adv: prefix-filtered tier stays lossless on the adversarial shape") {
    import graft.operators.Dedup
    val exact = Dedup.ngramJaccardPairs(adv, col("doc_id"), col("text"),
      n = 3, minJaccard = 0.5).select("doc_a", "doc_b")
    val pref = Dedup.prefixJaccardPairs(adv, col("doc_id"), col("text"),
      n = 3, minJaccardPpm = 500000L).select("doc_a", "doc_b")
    assert(exact.exceptAll(pref).isEmpty && pref.exceptAll(exact).isEmpty,
      "prefix/length/positional-filtered pair set diverged from the " +
        "exact formulation on the adversarial corpus")
  }
}
