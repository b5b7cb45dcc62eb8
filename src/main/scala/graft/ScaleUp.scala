package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: materialize an N×-scaled copy of a driver testdata dir so
  * the WHOLE query suite can run at 10× (the SURVEY §8 full-suite scaling
  * gate, vs [[DryRun]]'s per-operator spot checks).
  *
  * Scaling model = TPC-H's: fact tables replicate with disjoint keys,
  * fixed dimensions (region/nation) stay fixed. Each replica k offsets
  * every entity key by k·10⁷, so intra-replica referential integrity is
  * exact (orders.o_custkey still hits customer.c_custkey, lineitem still
  * folds onto its orders) and cross-replica keys never collide. Content
  * columns are perturbed replica-locally where identical copies would
  * distort an operator's combinatorics instead of scaling them:
  *  - documents.text gets a per-replica suffix on EVERY word, so each
  *    replica keeps the base corpus's shingle/dup density with no
  *    cross-replica near-dups (10 identical corpora would grow the pair
  *    graph ~replicas², which is a different workload, not a scale-up);
  *  - embeddings get a per-replica sign-flip pattern (replicas don't rank
  *    identically but norms/distributions are preserved);
  *  - events keep their timestamps (per-user session density constant,
  *    user cardinality ×N — how a real event stream scales).
  *
  * Usage: runMain graft.ScaleUp [inDir] [outDir] [factor] [tables]
  * `tables` (comma-separated, default all) writes only the named tables —
  * a per-tier scale gate (e.g. the vector-store decades) doesn't pay for
  * a factor-1000 lineitem it never reads.
  */
object ScaleUp {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "tmp/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")

    /** Replicate with key columns offset per replica; other columns mapped. */
    def replicate(df: DataFrame, keyCols: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { k =>
        val shifted = keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(k * Off)))
        perReplica(shifted, k)
      }.reduce(_ unionByName _)

    // thunked: a filtered run must not pay plan construction (1000-way
    // unionByName analyses) for tables it never writes
    val plans: Seq[(String, () => DataFrame)] = Seq(
      "region" -> (() => read("region")),
      "nation" -> (() => read("nation")),
      // c_name gets the same per-replica suffix treatment as documents.text:
      // identical names across replicas would grow the fuzzy-join pair
      // graph ~replicas² (every replica of "Customer#42" matches every
      // other), which is a different workload, not a scale-up. The replica
      // digit is doubled ("r00" vs "r11") so any two replicas differ by ≥2
      // edits — a single-digit suffix left cross-replica copies at edit
      // distance 1, still inside the fuzzy join's neighborhood
      "customer" -> (() => replicate(read("customer"), Seq("c_custkey"), (d, k) =>
        d.withColumn("c_name", concat(col("c_name"), lit(s"r$k$k"))))),
      "supplier" -> (() => replicate(read("supplier"), Seq("s_suppkey"))),
      "part" -> (() => replicate(read("part"), Seq("p_partkey"))),
      "orders" -> (() => replicate(read("orders"), Seq("o_orderkey", "o_custkey"))),
      "lineitem" -> (() => replicate(read("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))),
      "events" -> (() => replicate(read("events"), Seq("event_id", "user_id"))),
      "documents" -> (() => replicate(read("documents"), Seq("doc_id"), (d, k) =>
        d.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1r$k"))
          .withColumn("n_chars", length(col("text"))))),
      "embeddings" -> (() => replicate(read("embeddings"), Seq("vec_id"), (d, k) =>
        d.withColumn("embedding", transform(col("embedding"),
          (x, i) => when(i % 10 === k % 10, -x).otherwise(x))))))

    val unknown = only -- plans.map(_._1).toSet
    require(unknown.isEmpty, s"unknown tables: ${unknown.mkString(", ")}")
    plans.filter(p => only.isEmpty || only(p._1)).foreach { case (t, mk) =>
      val t0 = System.nanoTime()
      mk().repartition(if (t == "region" || t == "nation") 1 else 8)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(f"$t: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
