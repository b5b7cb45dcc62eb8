package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — per-column row/null/distinct counts and min/max in
  * ONE aggregation pass over the data (the ANALYZE/data-quality staple a
  * curation pipeline runs before trusting a new 100 TB drop).
  *
  * All requested columns' statistics are computed in a single `agg` (one
  * scan; Catalyst plans the multi-distinct via one Expand + partial
  * aggregation), then the flat single row is exploded into one row per
  * column. Min/max keep their values in typed slots — numerics (and
  * timestamps, as epoch micros) in doubles, strings in strings — rather
  * than a rendered string, because cross-engine float/timestamp
  * FORMATTING differs even when the values are identical and the oracle
  * gate hashes values.
  *
  * Scale note: k exact distincts make Expand replicate the scan k-fold
  * before the partial agg — the honest exact shape. At 100 TB with many
  * columns, swap `countDistinct` for `approx_count_distinct` (one pass,
  * no Expand, HLL-mergeable) — kept exact here so the DuckDB oracle can
  * replay the result bit-for-bit.
  *
  * Extension operator — the reference reads `system_schema.columns` for
  * schema (reference: hash_join.py:184-196) but has no data statistics
  * of any kind.
  */
object Profile {

  /** @param df   input table
    * @param cols columns to profile (numeric, string, boolean, or
    *             timestamp type)
    * @return one row per profiled column:
    *         (col_name, n, n_null, n_distinct, min_num, max_num,
    *          min_str, max_str) — the num slots null for string columns
    *         and vice versa
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // typed min/max slots: _num for numerics/timestamps/booleans, _str
    // for strings — one pair of null lits keeps the struct shape uniform
    def slots(name: String): (Column, Column, Column, Column) = {
      val c = col(name)
      df.schema(name).dataType match {
        case StringType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(c), max(c))
        case TimestampType | TimestampNTZType =>
          // NTZ routes through TimestampType first; with the engine-wide
          // UTC session timezone the wall-clock reading IS the instant,
          // matching the oracle's epoch_us on the naive value
          val m = unix_micros(c.cast(TimestampType))
          (min(m).cast("double"), max(m).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: NumericType | BooleanType =>
          (min(c).cast("double"), max(c).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case other =>
          throw new IllegalArgumentException(
            s"profile: unsupported type $other for column $name")
      }
    }
    val aggs = cols.flatMap { name =>
      val c = col(name)
      val (mn, mx, ms, xs) = slots(name)
      Seq(
        count(c).as(s"_nn_$name"), // non-null count; n comes from count(*)
        countDistinct(c).as(s"_nd_$name"),
        mn.as(s"_mn_$name"), mx.as(s"_mx_$name"),
        ms.as(s"_ms_$name"), xs.as(s"_xs_$name"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val structs = cols.map { name =>
      struct(
        lit(name).as("col_name"),
        col("_n").as("n"),
        (col("_n") - col(s"_nn_$name")).as("n_null"),
        col(s"_nd_$name").as("n_distinct"),
        col(s"_mn_$name").as("min_num"), col(s"_mx_$name").as("max_num"),
        col(s"_ms_$name").as("min_str"), col(s"_xs_$name").as("max_str"))
    }
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Sketch-tier profile — [[profile]]'s scale companion: per-column
    * row/null counts plus a KMV **approximate** distinct count, in one
    * aggregation pass with NO Expand (exact multi-distinct replicates the
    * scan k-fold for k columns; the sketch keeps `k` longs of mergeable
    * state per column instead). This is the shape a 100 TB pre-ingest
    * sweep wants: cost is one linear scan regardless of column count, and
    * the deterministic KMV estimator (unlike HLL) replays bit-for-bit in
    * the oracle.
    *
    * Column keys: integral/boolean columns hash their value, string
    * columns hash their [[graft.functions.TextFunctions.polyHash]] — both
    * deterministic cross-engine. `kth_hash` (the sketch threshold) is
    * NULL for an all-null column; `est_distinct` is exact below `k`
    * distinct values.
    */
  def profileSketch(df: DataFrame, cols: Seq[String], k: Int = 32): DataFrame = {
    require(cols.nonEmpty, "profileSketch needs at least one column")
    import graft.functions.{KmvSketch, KmvSketchNullable}
    val kmv = udaf(new KmvSketchNullable(k),
      org.apache.spark.sql.Encoders.LONG)
    def key(name: String): Column = df.schema(name).dataType match {
      case StringType => graft.functions.TextFunctions.polyHash(col(name))
      case LongType | IntegerType | ShortType | ByteType | BooleanType =>
        col(name).cast("long")
      case other =>
        throw new IllegalArgumentException(
          s"profileSketch: unsupported type $other for column $name " +
            "(hash a derived integer/string column instead)")
    }
    val aggs = cols.flatMap { name =>
      Seq(
        count(col(name)).as(s"_nn_$name"),
        kmv(KmvSketch.hash(key(name))).as(s"_sk_$name"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val structs = cols.map { name =>
      val sk = col(s"_sk_$name")
      struct(
        lit(name).as("col_name"),
        col("_n").as("n"),
        (col("_n") - col(s"_nn_$name")).as("n_null"),
        when(size(sk) === 0, lit(null).cast("long"))
          .otherwise(KmvSketch.kthValue(sk)).as("kth_hash"),
        KmvSketch.estimate(sk, k).as("est_distinct"))
    }
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Equi-width histogram of a numeric column over `[lo, hi]`: one
    * grouped count on the bucket id (map-side partial, `buckets` groups —
    * never a shuffle of the data itself), left-joined onto the full
    * bucket range so EMPTY buckets appear with n = 0. Values outside
    * `[lo, hi]` are dropped (profile() supplies the bounds); `hi` itself
    * clamps into the last bucket, closing the top edge.
    *
    * All bucket arithmetic is IEEE double (`floor((x-lo)/width)`), which
    * DuckDB reproduces bit-for-bit — the oracle gate hash-compares.
    *
    * @return (bucket, bucket_lo, n) — `buckets` rows, bucket_lo =
    *         lo + bucket × width
    */
  def histogram(
      df: DataFrame,
      c: Column,
      lo: Double,
      hi: Double,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"need at least one bucket, got $buckets")
    require(hi > lo, s"empty range [$lo, $hi]")
    val width = (hi - lo) / buckets
    val counts = df
      .filter(c.isNotNull && c >= lo && c <= hi)
      .groupBy(least(lit(buckets - 1L),
        floor((c.cast("double") - lo) / width).cast("long")).as("bucket"))
      .agg(count(lit(1)).as("_cnt"))
    df.sparkSession.range(buckets).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (lit(lo) + col("bucket") * width).as("bucket_lo"),
        coalesce(col("_cnt"), lit(0L)).as("n"))
  }

  /** Pre-flight equi-join cardinality estimate — the System R formula
    * `|A ⋈ B| ≈ n_a · n_b / max(d_a, d_b)` (uniform-frequency
    * assumption) from one tiny aggregation per side: row count + exact
    * distinct key count. The "should this join broadcast / how many
    * reducers does its output need" answer BEFORE paying for the join —
    * what an optimizer reads from catalog statistics, as a library
    * operator over tables that have none.
    *
    * Exactness contract: the product runs in DECIMAL(38,0) (no overflow
    * up to ~10^19 rows per side) and the divide is integral, so the
    * estimate replays bit-for-bit. Nulls never join, so keys are counted
    * null-excluded (`countDistinct` semantics on both engines). For a
    * sketch-tier input swap the exact distincts for
    * [[graft.functions.KmvSketch]] estimates upstream.
    */
  def joinCardinalityEstimate(a: DataFrame, ka: Column, b: DataFrame, kb: Column): DataFrame = {
    val sa = a.agg(count(ka).as("n_a"), countDistinct(ka).as("d_a"))
    val sb = b.agg(count(kb).as("n_b"), countDistinct(kb).as("d_b"))
    sa.crossJoin(sb) // both sides are single rows — a 1×1 "cross" join
      .select(col("n_a"), col("d_a"), col("n_b"), col("d_b"),
        // an empty (or all-null-key) side joins to nothing — guard the
        // divide rather than ANSI-error on d = 0
        expr("""CASE WHEN greatest(d_a, d_b) = 0 THEN 0L
                ELSE CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
                     div greatest(d_a, d_b) END""")
          .as("est_rows"))
  }

  /** [[joinCardinalityEstimate]]'s 100 TB tier: the same System-R
    * `n_a·n_b / max(nd_a, nd_b)` formula with the per-side distinct key
    * counts coming from a k-minimum-values sketch instead of
    * `count(DISTINCT …)` — bounded mergeable state (k longs per side)
    * where the exact distinct pays a full key shuffle, which is the cost
    * that matters when both join sides are fact tables. Deterministic:
    * the KMV bottom-k and its integer estimator replay exactly (cf. e6),
    * so even this *estimate* is oracle-hash-checkable. Estimates are
    * exact below k distinct keys.
    */
  def joinCardinalitySketch(
      a: DataFrame, ka: Column, b: DataFrame, kb: Column,
      k: Int = 64): DataFrame = {
    import graft.functions.KmvSketch
    def side(df: DataFrame, key: Column, n: String, nd: String) = {
      val kmv = org.apache.spark.sql.functions.udaf(
        new KmvSketch(k), org.apache.spark.sql.Encoders.scalaLong)
      df.select(key.cast("long").as("key")).filter(col("key").isNotNull)
        .select(col("key"), KmvSketch.hash(col("key")).as("h"))
        .agg(count(col("key")).as(n), kmv(col("h")).as("sk"))
        .select(col(n), KmvSketch.estimate(col("sk"), k).as(nd))
    }
    side(a, ka, "n_a", "nd_a").crossJoin(side(b, kb, "n_b", "nd_b"))
      .select(col("n_a"), col("nd_a"), col("n_b"), col("nd_b"),
        expr("""CASE WHEN greatest(nd_a, nd_b) = 0 THEN 0L
                ELSE CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
                     div greatest(nd_a, nd_b) END""")
          .as("est_rows"))
  }
}
