package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[ScaleUp.advEmbeddings]] — the adversarial embeddings
  * corpus behind the BASELINE §16c recall re-measurement. Like
  * [[AdvCorpusSpec]] for advDocs, the generator is a measurement
  * instrument, so the properties that make its measurements meaningful
  * are pinned: determinism, the clustered structure (high same-cluster
  * cosine mass that near-uniform data lacks), skewed cluster masses
  * (imbalanced IVF lists), and varying norms (the cosine-vs-L2 stressor).
  */
class AdvEmbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private lazy val adv = {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    ScaleUp.advEmbeddings(
      spark.read.parquet(s"$dir/embeddings.parquet"), spark).cache()
  }

  test("advemb: deterministic in vec_id (two generations are identical)") {
    val again = ScaleUp.advEmbeddings(
      spark.read.parquet(s"$dir/embeddings.parquet"), spark)
    val diff = adv.select(col("vec_id"), col("embedding").as("a"))
      .join(again.select(col("vec_id"), col("embedding").as("b")), "vec_id")
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0, s"$diff vectors differ between two generations")
  }

  test("advemb: norms vary (lognormal spread, not the uniform corpus's flat norms)") {
    val norms = adv.select(sqrt(aggregate(col("embedding"), lit(0.0d),
      (a, x) => a + x * x)).as("n"))
    val r = norms.agg(
      expr("percentile(n, 0.1)").as("p10"),
      expr("percentile(n, 0.9)").as("p90")).head
    val (p10, p90) = (r.getDouble(0), r.getDouble(1))
    assert(p90 > 1.5 * p10,
      s"norm spread collapsed (p10=$p10 p90=$p90) — the cosine-contract " +
        "stressor (§16c: raw-L2 ADC vs cosine) is gone")
  }

  test("advemb: clustered with skewed masses — a large high-cosine family exists") {
    // same-cluster members share the component center direction, so the
    // corpus must carry a heavy mass of high-cosine pairs that uniform
    // vectors (expected cos ≈ 0 in 64-dim) cannot produce; Zipf masses
    // make the largest family a ~quarter of the corpus. Observable pin:
    // the share of ordered pairs with cos > 0.5 — ≥ Σp²-ish mass — and
    // the biggest single family found by a greedy cos>0.8 neighborhood.
    val u = adv.select(col("vec_id"), transform(col("embedding"),
      x => x / sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, y) => a + y * y))).as("uv"))
    val pairs = u.as("a").join(u.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(aggregate(zip_with(col("a.uv"), col("b.uv"), _ * _),
        lit(0.0d), _ + _).as("cos"))
    val n = adv.count(); val np = n * (n - 1) / 2
    val hi = pairs.filter(col("cos") > 0.5).count()
    // Zipf over 32: Σ p_c² ≈ 0.094 of pairs share a cluster
    assert(hi.toDouble / np > 0.04,
      s"high-cosine pair share ${hi.toDouble / np} — clustering collapsed")
    assert(hi.toDouble / np < 0.5,
      s"high-cosine pair share ${hi.toDouble / np} — degenerate single blob")
  }
}
