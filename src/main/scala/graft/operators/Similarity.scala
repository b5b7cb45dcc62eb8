package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), three tiers:
  *
  *  1. [[bruteForceTopK]] — exact cosine top-k, the correctness baseline.
  *     One broadcast of the (small) query set, zero shuffles of the base
  *     table beyond the final per-query top-k aggregation.
  *  2. [[lshTopK]] — random-hyperplane LSH: base vectors land in sign
  *     buckets across several hash tables; a query only scores vectors
  *     sharing a bucket. Cost per query drops from O(N) to O(N / 2^bits ×
  *     tables); recall is tunable with tables/bits.
  *  3. [[ivfTopK]] — IVF-style coarse quantization: partition the base
  *     table by nearest centroid, probe only the closest `nProbe` lists —
  *     the layout that maps to partitioned parquet at 100 TB (partition
  *     pruning skips the other lists entirely).
  *
  * All dot products are `zip_with` + `aggregate` folds in double precision
  * — pure Catalyst expressions inside whole-stage codegen (no UDF). The
  * hyperplanes and centroids are deterministic so results are stable and
  * oracle-checkable.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    val (ad, bd) = (d(a), d(b))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Exact top-k by cosine for each query vector. Queries are broadcast
    * (they're small by construction); rank is deterministic: cosine is
    * rounded to 6 digits before ordering and ties break on ascending base
    * id, so Spark and the oracle agree bit-for-bit.
    */
  def bruteForceTopK(
      base: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = base.select(id.as("vec_id"), vec.as("v"))
    val q = queries.select(id.as("q_id"), vec.as("qv"))
    val scored = b.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (table t, bit h,
    * dim d): an integer in [-32768, 32767] from a multiplicative hash —
    * reproducible anywhere, no RNG state.
    */
  private def planeWeight(t: Int, h: Int, d: Column): Column =
    ((lit(t * 7919 + h * 104729 + 1) * (d + 1) * 2654435761L) % 65536L) - 32768L

  /** Sign-bucket id of a vector under `bits` hyperplanes of table `t`. */
  private def bucketId(v: Column, t: Int, bits: Int): Column =
    (0 until bits).map { h =>
      val dotP = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x.cast("double") * planeWeight(t, h, d)),
        lit(0.0), _ + _)
      when(dotP > 0, lit(1L << h)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH ANN: `tables` independent hash tables of `bits` hyperplanes each.
    * Candidates = base vectors sharing a bucket with the query in ANY
    * table; exact cosine re-ranks the candidates. Approximate — recall
    * rises with `tables`, per-query cost falls with `bits`.
    */
  def lshTopK(
      base: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int = 10,
      tables: Int = 4,
      bits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = base.select(id.as("vec_id"), vec.as("v"))
    val q = queries.select(id.as("q_id"), vec.as("qv"))
    def withBuckets(df: DataFrame, v: String) = (0 until tables).map { t =>
      df.select(df.columns.map(col): _*)
        .withColumn("tbl", lit(t))
        .withColumn("bucket", bucketId(col(v), t, bits))
    }.reduce(_ unionByName _)
    val candidates = withBuckets(b, "v").as("a")
      .join(withBuckets(q, "qv").hint("broadcast").as("qq"),
        col("a.tbl") === col("qq.tbl") && col("a.bucket") === col("qq.bucket") &&
          col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("qv"), col("v"))
      .distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    candidates
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** IVF ANN: coarse centroids are the base vectors whose id ≡ 0 (mod
    * `centroidStride`) — deterministic, no k-means dependency; production
    * would train real centroids but the *plan shape* is identical. Every
    * base vector is assigned to its nearest centroid (the "inverted list");
    * a query probes the `nProbe` nearest lists only. At scale the lists
    * become partition keys of the stored table and probing = partition
    * pruning.
    */
  def ivfTopK(
      base: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int = 10,
      centroidStride: Int = 50,
      nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = base.select(id.as("vec_id"), vec.as("v"))
    val cents = b.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    def assign(df: DataFrame, v: String, idc: String, keep: Int) = {
      val w = Window.partitionBy(col(idc))
        .orderBy(col("c_cos").desc, col("c_id").asc)
      df.join(broadcast(cents), col("c_id") =!= lit(-1))
        .select(df.columns.map(col) :+ col("c_id") :+
          round(cosine(col(v), col("cv")), 6).as("c_cos"): _*)
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= keep)
        .drop("c_cos", "crn")
    }
    val listed = assign(b, "v", "vec_id", 1)
    val probed = assign(queries.select(id.as("q_id"), vec.as("qv")), "qv", "q_id", nProbe)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    listed.join(probed, Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
