package graft.queries

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

/** ANSI-mode overflow audit: the suite's documented long-arithmetic
  * contracts (a10's price-cents second moments, DSIR micro-nats, the
  * curriculum/epoch fixed-point consume keys, KMV/minhash modular
  * arithmetic) are bounds the scaladoc asserts but a non-ANSI run cannot
  * check — a long overflow silently wraps and the oracle compare is the
  * only tripwire. This suite re-executes the representative queries with
  * `spark.sql.ansi.enabled=true`, where every overflowing add, multiply,
  * or sum THROWS:
  * a green run here is machine-checked evidence the contracts hold at the
  * test scale, and the same session would fail loudly on a 100 TB corpus
  * that violated one (the deployment recommendation is exactly that —
  * run ANSI in production so a contract breach is an error, not a wrong
  * number).
  *
  * Uses `newSession()` — same SparkContext, isolated SQLConf — so the
  * shared test session stays non-ANSI for every other suite.
  */
class AnsiOverflowSpec extends AnyFunSuite {
  private lazy val ansi = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("the ANSI session really is ANSI: a long overflow throws") {
    import org.apache.spark.sql.functions._
    val boom = intercept[Exception] {
      ansi.range(1).select(lit(Long.MaxValue) + lit(1L)).collect()
    }
    assert(boom.getMessage.toLowerCase.contains("overflow"),
      s"expected an arithmetic overflow error, got: ${boom.getMessage.take(200)}")
  }

  test("the DEFAULT session is ANSI too: Spark 4 enforces the contracts suite-wide") {
    // Spark 4.0 flipped spark.sql.ansi.enabled's default to true and this
    // repo never overrides it, so Verify, Bench, and every other suite
    // already execute with overflow-raises-error semantics — the integer
    // contracts are enforced on EVERY run, not just in this audit. If a
    // future config change turns ANSI off, this assertion is the tripwire
    // that the audit below became the only enforcement left.
    assert(TestSpark.spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  // every query whose scaladoc carries an integer-bound contract, run
  // under ANSI: an overflow, bad cast, or div-by-zero anywhere in the
  // pipeline is now an exception, not a wrapped value
  private val audited = Seq(
    "a10_corr_moments",   // pc·pc ≤ ~1.1e14 per row; Σ in DECIMAL(38,0)
    "a7_join_card_est",   // n_a·n_b cardinality product
    "c15_dsir_scores",    // DSIR micro-nats log-space fixed point
    "c16_dsir_resample",  // Gumbel keys over micro-nats
    "c19_curriculum_order", // tier·2³² + idHash mod 2³² consume key
    "c7_epoch_order",     // epoch-stride fixed-point permutation
    "c4_token_packing",   // token-budget running sums
    "d3_minhash_lsh",     // polyHash/minhash modular arithmetic
    "e6_kmv_distinct",    // KMV sketch threshold arithmetic
    "t1_token_stats",     // per-doc token count aggregation
    "t4_fingerprint",     // rolling-hash fingerprint
    "w2_running_sum",     // window running decimal sum
    "g2_pagerank_weighted") // rank·weight fixed-point products

  for (name <- audited)
    test(s"$name holds its integer contracts under ANSI") {
      assume(new java.io.File(dir).isDirectory)
      val df = graft.SparkEntry.queries(name)(ansi, dir)
      // noop write forces every output column through the ANSI engine
      df.write.mode("overwrite").format("noop").save()
      graft.operators.Dedup.unpersistIntermediates()
      graft.operators.Corpus.unpersistIntermediates()
      graft.operators.Graph.unpersistIntermediates()
    }
}
