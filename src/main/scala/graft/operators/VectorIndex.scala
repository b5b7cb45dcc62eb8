package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED form of the IVF / IVF×PQ index — the missing piece
  * between [[Similarity]]'s in-flight ANN tiers and a 100 TB deployment.
  *
  * Every in-flight tier (s3/s14/s19/s20) re-derives the full listed
  * assignment over the base corpus per query — fine for a one-shot
  * pipeline, wrong for a serving index: a deployment writes the inverted
  * lists ONCE and each probe must read ONLY the probed lists. This module
  * is that composition, built from parts that already exist:
  *
  *  - the lists are written `partitionBy("c_id")` — the layout
  *    [[Similarity.ivfAssign]]'s scaladoc promises ("probing becomes
  *    partition pruning"), now actually materialized. A probe collects
  *    its `≤ |queries|·nProbe` probed list ids (a config-sized driver
  *    collect — the model-artifact pattern, same as the PQ codebook) and
  *    reads the store through a literal `c_id IN (...)` filter, which
  *    static partition pruning turns into "touch only those directories":
  *    probe IO tracks `nProbe/lists × corpus`, not the corpus
  *    (plan-pinned in `VectorIndexSpec`, partition-count-pinned at runtime).
  *  - the store side of the probe join never shuffles: the probed query
  *    assignment is broadcast, so the only exchange in the whole probe is
  *    the final `k·|queries|`-bounded top-k window — the vector analog of
  *    the banded dedup store ([[Dedup.writeBandStore]]) and of the
  *    reference's partition-restricted DSE direct join
  *    (reference: hash_join.py:811-818 gates on partition-key coverage;
  *    here the coarse quantizer IS the partition key).
  *  - the index is SELF-DESCRIBING: `centroids/` (the coarse quantizer),
  *    `meta/` (assignment mode + PQ config), and for PQ stores
  *    `codebook/` ride beside `lists/`, so a probe needs nothing but the
  *    store path — the same artifact discipline as
  *    [[BloomJoin.sketchBytes]].
  *  - [[appendToIvfIndex]] is continuous ingestion: an increment is
  *    assigned against the STORED centroids (the model stays fixed —
  *    stored rows must be probe- and batch-independent) and appended as
  *    new files inside the existing `c_id=` directories; per-batch cost
  *    tracks the increment, never the store (the d13/incrementalDedup
  *    contract, applied to vectors).
  *
  * Everything is deterministic (stride centroids, exact integer
  * unit-micros dots for every list-membership decision —
  * [[Similarity.unitMicros]] — ties on ascending id), so a probe of a
  * written store replays bit-for-bit in the DuckDB oracle — the
  * persisted path shares s19/s20's oracles.
  */
object VectorIndex {

  /** Bump when the ASSIGNMENT SEMANTICS change (centroid pick, tie-break,
    * super-geometry, PQ encode) in a way that makes previously-written
    * lists disagree with what the same config would write today — cached
    * store paths embed it, so a semantics change can never silently probe
    * a stale store built by older code (`meta/` holds the config, but
    * only the version names the code generation).
    *
    * This includes EXPRESSION-semantics changes that affect assignment
    * (e.g. [[graft.functions.UnitMicros]]'s quantization or NaN
    * handling), not just operator-level geometry: if the same stored
    * vector could file under a different list today, bump.
    *
    * v2: assignment-deciding comparisons moved from `round(cosine, 6)`
    * doubles to exact integer unit-micros dots
    * ([[Similarity.unitMicros]]) — list membership for a handful of
    * near-boundary vectors differs from v1 stores. Defined as: stamped
    * meta + NaN/Infinity-guarded UnitMicros (corrupt vectors → NULL,
    * never silently zero-filed).
    *
    * v3: the unit-micros quantization itself went all-integer —
    * `sign(m)·((|m|·10⁶) div isqrt(nsq))` replaces the
    * `floor(m/√nsq·10⁶+0.5)` float chain (whose legal op
    * contraction/reorder let another engine's replay flip near-boundary
    * argmaxes) — per-component values shift by ≤ 1 micro-unit, so list
    * membership for near-tied vectors differs from v2 stores.
    *
    * v4: the PQ encode moved to the same micros grid
    * ([[graft.functions.PqEncode]]: exact integer squared-L2 instead of
    * the double fold) — stored CODES for near-tied vectors differ from
    * v3 stores, so PQ stores must rebuild; plain stores share the bump
    * for one code generation rather than a per-mode version matrix.
    *
    * v5: the grid scale moved from `10⁶` to the power of two `2²⁰`
    * ([[graft.functions.UnitMicros.GridScale]]) so the grid-entry
    * multiply is an exact exponent shift — ZERO rounded float
    * multiplies anywhere, closing the last FMA-contraction freedom.
    * Every stored unit vector, list assignment, and PQ code quantizes
    * on the new grid, so all stores rebuild.
    */
  val FormatVersion = 5

  /** Marker written LAST: a store is only probeable once fully written
    * (a killed build leaves no marker and the probe fails loudly).
    *
    * All marker operations go through the Hadoop FileSystem API — like
    * [[listManifest]] — so completeness works unchanged when the store
    * path is `hdfs://`/`s3a://` (the module's design point). A
    * `java.nio.file` marker would live on the DRIVER'S local disk for
    * any non-local store: every probe on another node would reject a
    * good store, and the compaction marker-drop protocol would protect
    * nothing.
    */
  private val OkMarker = "_GRAFT_IVF_STORE_OK"

  /** Internal routing columns, named in ONE place so the write path
    * ([[routeToLists]]'s `_f`) and compaction ([[compactIvfIndex]]'s
    * `_bin`) can never drift from the payload-name validation: a payload
    * column shadowing either would be silently replaced-and-dropped by
    * the corresponding `withColumn(...).drop(...)` rewrite, removing it
    * from every rewritten row.
    */
  private val BuildRouteCol = "_f"
  private val CompactRouteCol = "_bin"

  /** Every column name the store or its probe plans introduce — a payload
    * column colliding with any of these must be rejected at BUILD time
    * (a payload named `q_id` would make every probe die on an ambiguous
    * column; `_f`/`_bin` would be clobbered by write/compaction routing;
    * `_vu`/`_qu`/`_ud` by the probe's unit-micros rank columns).
    */
  private val ReservedNames = Set("vec_id", "v", "c_id", "codes",
    BuildRouteCol, CompactRouteCol,
    "q_id", "qv", "cos", "cos_ud", "rn", "lut", "est", "ern",
    "_vu", "_qu", "_ud")

  private def hadoopConf() =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, OkMarker)

  /** True iff `path` holds a completely written store. */
  def isComplete(path: String): Boolean = {
    val m = markerPath(path)
    m.getFileSystem(hadoopConf()).exists(m)
  }

  /** Drop the completeness marker — the FIRST statement of any store
    * mutation, so a concurrent probe can never read a half-rewritten
    * artifact as complete.
    */
  private def dropMarker(path: String): Unit = {
    val m = markerPath(path)
    m.getFileSystem(hadoopConf()).delete(m, false)
  }

  /** (Re)create the completeness marker — written LAST. */
  private def putMarker(path: String): Unit = {
    val m = markerPath(path)
    m.getFileSystem(hadoopConf()).create(m, true).close()
  }

  /** Index configuration, persisted in `meta/` beside the lists so a
    * probe re-derives the exact assignment geometry from the store alone.
    * `payload` names the metadata columns stored inline with each vector
    * (empty = none) — recorded so [[appendToIvfIndex]] selects the same
    * columns from every increment and a schema drift fails loudly at
    * append time, not silently at probe time. `version` is the
    * [[FormatVersion]] the store was BUILT under — persisted so a probe
    * by a newer code generation rejects the store loudly instead of
    * assigning queries with semantics the stored lists were never filed
    * under (the path convention in the query layer embeds the version
    * too, but the STORE must carry its own: caller-supplied paths don't).
    */
  private case class Meta(
      hierarchical: Boolean, superStride: Int, sProbe: Int,
      pq: Boolean, numSubspaces: Int, numCodes: Int,
      payload: Seq[String], version: Int, pqResidual: Boolean = false)

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    import spark.implicits._
    Seq((m.hierarchical, m.superStride, m.sProbe, m.pq, m.numSubspaces,
      m.numCodes, m.payload.mkString(","), m.version, m.pqResidual))
      .toDF("hierarchical", "super_stride", "s_probe", "pq", "num_subspaces",
        "num_codes", "payload", "format_version", "pq_residual")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def readMeta(spark: SparkSession, path: String,
      requireCurrent: Boolean = true): Meta = {
    val df = spark.read.parquet(s"$path/meta")
    val fields = df.schema.fieldNames.toSet
    val r = df.collect().head
    val meta = Meta(r.getAs[Boolean]("hierarchical"), r.getAs[Int]("super_stride"),
      r.getAs[Int]("s_probe"), r.getAs[Boolean]("pq"),
      r.getAs[Int]("num_subspaces"), r.getAs[Int]("num_codes"),
      if (fields("payload"))
        r.getAs[String]("payload").split(",").toSeq.filter(_.nonEmpty)
      else Nil,
      // a meta without the field predates version-stamping — its lists
      // were filed under an earlier assignment-semantics generation
      if (fields("format_version")) r.getAs[Int]("format_version") else 1,
      // pre-r18 PQ stores hold RAW-space codes (the field didn't exist)
      if (fields("pq_residual")) r.getAs[Boolean]("pq_residual") else false)
    if (requireCurrent) require(meta.version == FormatVersion,
      s"store at $path was built under assignment-semantics generation " +
        s"${meta.version}, this code is generation $FormatVersion — its " +
        "list membership would disagree with the probe's query " +
        "assignment; rebuild with writeIvfIndex")
    meta
  }

  /** True iff `path` holds a completely written store of THIS code's
    * assignment-semantics generation — the build-if-needed gate
    * ([[ensureIvfIndex]] and callers managing their own build): a
    * complete store of an older generation must be REBUILT, where a
    * probe/append of one must FAIL (they do — loudly, on the meta's
    * recorded generation). A marker-complete store whose `meta/` is
    * MISSING or doesn't parse as a table (damaged by hand — the marker
    * protocol can't have produced it) is NOT servable rather than an
    * error: the gate's callers want "rebuild", not a crash pointing
    * away from the cause. Only that expected-corruption class is
    * absorbed — an unexpected failure reading an intact-looking meta
    * (a transient filesystem/IO error, say) PROPAGATES, because
    * silently answering "not servable" to it would trigger a full
    * index rebuild over a hiccup.
    *
    * `payload`: when given, the store must ALSO have been built with
    * exactly these inline payload column names — a servable-looking
    * store missing a requested payload column would make the caller's
    * filtered probe die on an unresolved column far from the cause
    * (meta records the names precisely so this drift is detectable
    * here, at ensure time).
    */
  def isServable(spark: SparkSession, path: String,
      payload: Seq[String] = Nil,
      pqResidual: Option[Boolean] = None): Boolean =
    isComplete(path) && {
      val meta =
        try Some(readMeta(spark, path, requireCurrent = false))
        catch {
          // the expected corruption class only: meta/ missing or not
          // readable AS A TABLE → rebuild; other failures propagate
          case _: org.apache.spark.sql.AnalysisException => None
        }
      // pqResidual, when the caller states a requirement, must MATCH: a
      // raw-codes store served to a residual-expecting ensure (or vice
      // versa) would probe self-consistently — meta drives the LUT — but
      // in the wrong encoding space from the caller's standpoint
      meta.exists(m => m.version == FormatVersion &&
        (payload.isEmpty || m.payload == payload) &&
        pqResidual.forall(_ == m.pqResidual))
    }

  /** Write the IVF index of `base` at `path`: inverted lists partitioned
    * by `c_id` (+ PQ codes when `pq`), the centroid model, and the config.
    * One pass over the corpus; the per-list files inherit the upstream
    * partitioning's parallelism within each list directory.
    *
    * `hierarchical = true` (default) builds the lists with the two-level
    * assignment ([[Similarity.ivfAssignHierarchical]] — rows ×
    * (√k·… ) instead of rows × k cosines, the s19 trade measured at 2.65×
    * on the sf10 copy); `false` is the exact flat argmax (s3 semantics).
    * Probes replay whichever mode built the store (recorded in `meta/`),
    * so store and probe assignment can never disagree.
    *
    * `pq = true` additionally stores the `numSubspaces` PQ codes per
    * vector ([[graft.functions.PqEncode]], codebook from the FULL corpus
    * — stored codes must be probe-independent) plus the codebook itself,
    * enabling [[probeIvfPqIndex]]'s codes-only candidate scan.
    *
    * `centroids` overrides the default stride-picked coarse quantizer
    * with a caller-trained `(c_id, cv)` model (the faiss deployment
    * shape: k-means trains on a sample, the index is built with the
    * trained centroids — [[Similarity.kmeansCentroids]] output plugs in
    * directly). The model is persisted beside the lists either way, so
    * probes and appends replay the caller's geometry from the store
    * alone.
    *
    * `payload` stores extra metadata columns of `base` INLINE with each
    * vector (named/aliased `Column`s — e.g. `col("label")`,
    * `col("lang")`) — the filtered-vector-search layout: a probe's
    * `where` predicate on a payload column is evaluated inside the
    * pruned list scan (parquet data filter on only the probed
    * partitions), never as a post-hoc join against a corpus-sized
    * attribute table. Unfiltered probes don't pay for it: the payload
    * columns are column-pruned out of their scans. Costs one co-keyed
    * join on `vec_id` at build time; the column NAMES are recorded in
    * `meta/` so appends select the same columns from every increment.
    * PRECONDITION: `id` must be unique in `base` — the payload join is
    * an inner join of two projections of `base` on `vec_id`, so a
    * duplicated id that would merely duplicate list rows without payload
    * SQUARES its stored rows with payload (dup × dup join fan-out).
    *
    * `filesPerList` bounds the file count per `c_id=` directory: rows
    * are routed by a deterministic `xxhash64(vec_id) % filesPerList`
    * split co-partitioned with `c_id` before the write (the
    * [[compactIvfIndex]] bin trick applied AT BUILD TIME). Without it a
    * partitionBy write fans every upstream task across every list —
    * `tasks × lists` drizzle files (81,920 at the 100× gate: ~20 s of
    * file-open tax on the build's own read-back, and per-file open cost
    * on every probe thereafter). One extra corpus exchange buys
    * `≤ lists × filesPerList` right-sized files; writer parallelism =
    * `lists × filesPerList` tasks.
    *
    * The DEFAULT (`filesPerList = 0`) AUTO-SIZES from the data, PER
    * LIST (r18): each list routes to `ceil(itsBytes / targetFileBytes)`
    * splits, with per-list bytes estimated from a deterministic
    * 1/[[RouteSampleStride]] hash slice of the assignment scaled by the
    * input size (Catalyst's file-index estimate) — so a file ≈ one HDFS
    * block / row-group at ANY corpus size AND any skew. The r17 rule
    * divided the input by the GLOBAL list count, which on a Zipf-mass
    * corpus (§15a: heaviest cluster 24% of rows) sized the heavy list's
    * files at `0.24 × lists ×` the target and made its one writer task
    * the build's straggler. A fixed 1 was the 100 TB failure mode in
    * the other direction from drizzle: ~400 GB single files per list
    * and writer parallelism collapsed to ≤ `lists` tasks. Sources
    * without a real size estimate (estimate ≥ the session's
    * `defaultSizeInBytes` sentinel) fall back to 1, and per-list counts
    * are clamped to [1, 4096] (4096 ≈ a 512 GB list at the 128 MB
    * default target — past that, raise `targetFileBytes` deliberately).
    */
  def writeIvfIndex(
      base: DataFrame,
      id: Column,
      vec: Column,
      path: String,
      centroidStride: Int = 50,
      maxCentroids: Int = 256,
      hierarchical: Boolean = true,
      superStride: Int = 16,
      sProbe: Int = 2,
      pq: Boolean = false,
      numSubspaces: Int = 8,
      numCodes: Int = 16,
      codeStride: Int = 16,
      centroids: Option[DataFrame] = None,
      payload: Seq[Column] = Nil,
      filesPerList: Int = 0,
      targetFileBytes: Long = 128L << 20,
      pqResidual: Boolean = false,
      statsCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = base.sparkSession
    require(!pqResidual || pq,
      "pqResidual is a PQ-codes encoding mode — set pq = true with it")
    // payload validation FIRST: a name collision must fail before any
    // artifact (marker, codebook) of an existing store is touched.
    // Reserved names cover the store's own columns, the routing split,
    // AND every name the probe plans introduce (a payload named q_id
    // would build a store whose every probe dies on an ambiguous
    // column); commas would mis-split meta's recorded name list.
    val pay = base.select((id.as("vec_id") +: payload): _*)
    val payNames = pay.columns.toSeq.drop(1)
    val reserved = ReservedNames
    val bad = payNames.filter(n => reserved(n) || n.contains(","))
    require(bad.isEmpty,
      s"payload column names reserved by the store or its probes (or " +
        s"containing ','): ${bad.mkString(", ")}")
    // stats columns must be stored inline (the filtered probe's scan
    // predicate runs on the payload column of only the probed
    // partitions) — a stats request for an un-stored column would
    // persist counts no probe could ever apply
    val badStats = statsCols.filterNot(payNames.contains)
    require(badStats.isEmpty,
      s"statsCols must name payload columns (add them to `payload`): " +
        badStats.mkString(", "))
    require(filesPerList >= 0,
      s"filesPerList must be positive (or 0 = auto), got $filesPerList")
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    // invalidate BEFORE any artifact is touched: a rebuild of an existing
    // complete store overwrites the codebook eagerly below, and a
    // concurrent probe in that window must fail loudly on the missing
    // marker rather than read the NEW codebook against the OLD lists
    dropMarker(path)
    val b = base.select(id.as("vec_id"), vec.as("v"))
    val cents = centroids.map(_.select(col("c_id"), col("cv")))
      .getOrElse(Similarity.ivfCentroids(b, centroidStride, maxCentroids))
    // one config-sized count job, and only when a split could happen
    // (explicit filesPerList = 1 never forces it)
    lazy val nLists = cents.count()
    val listed =
      if (hierarchical)
        Similarity.ivfAssignHierarchical(base, id, vec, cents, superStride, sProbe)
      else Similarity.ivfAssignTo(cents, b, "v", "vec_id", 1)
    val rows =
      if (!pq) listed
      else {
        // pqResidual (r18 — Jégou's IVFADC as the STORED layout, §16c):
        // codes and codebook live in residual space (v − centroid(list)),
        // so the cells resolve within-list variation instead of
        // re-separating lists the coarse quantizer already separated.
        // Derivation mirrors Similarity.ivfPqTopK(residual = true)
        // exactly — the shared-oracle identity behind s35.
        val centsV = cents.select(col("c_id"), col("cv"))
        def resOf(vc: Column) =
          zip_with(vc.cast("array<double>"), col("cv"), (a, bb) => a - bb)
        lazy val listedR = listed.join(broadcast(centsV), Seq("c_id"))
          .withColumn("_rv", resOf(col("v")))
        val cb =
          if (pqResidual) Similarity.pqCodebook(listedR, col("vec_id"),
            col("_rv"), numSubspaces, numCodes, codeStride)
          else Similarity.pqCodebook(base, id, vec, numSubspaces, numCodes,
            codeStride)
        def enc(c: Column) = ColumnBridge.column(graft.functions.PqEncode(
          ColumnBridge.expression(c.cast("array<double>")), cb))
        // persist the codebook as exploded scalars (s, j, pos, val) — the
        // config-sized model artifact, array-format-free like kmeansTrain's
        import spark.implicits._
        cb.zipWithIndex.flatMap { case (codes, s) =>
          codes.zipWithIndex.flatMap { case (cvec, j) =>
            cvec.zipWithIndex.map { case (v, p) => (s, j.toLong, p + 1, v) }
          }
        }.toSeq.toDF("s", "j", "pos", "val")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
        if (pqResidual)
          listedR.withColumn("codes", enc(col("_rv"))).drop("_rv", "cv")
        else listed.withColumn("codes", enc(col("v")))
      }
    val stored = if (payload.isEmpty) rows else rows.join(pay, Seq("vec_id"))
    val routed =
      if (filesPerList > 0)
        routeToLists(stored, filesPerList,
          if (filesPerList > 1) nLists else 1L)
      else autoListFileCounts(base, listed, targetFileBytes) match {
        case Some(m) => routeToListsWeighted(stored, m, nLists)
        case None => routeToLists(stored, 1, 1L)
      }
    routed
      .write.mode("overwrite").partitionBy("c_id").parquet(s"$path/lists")
    cents.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    writeSizes(spark, path)
    statsCols.foreach(writeListStats(spark, path, _))
    writeMeta(spark, path, Meta(hierarchical, superStride, sProbe, pq,
      numSubspaces, numCodes, payNames, FormatVersion, pqResidual))
    putMarker(path)
  }

  /** Persist `sizes/` — one `(c_id, n_list)` row per inverted list,
    * counted from the lists ACTUALLY WRITTEN (read-back, the s23
    * honesty rule; the scan touches only the partition column, so it
    * resolves from file metadata, never the vectors). The adaptive
    * probe's mass budget reads this config-sized artifact instead of
    * paying a corpus pass per probe — at deployment scale the list
    * lengths are index metadata, exactly like the centroids.
    */
  private def writeSizes(spark: SparkSession, path: String): Unit =
    spark.read.parquet(s"$path/lists")
      .groupBy(col("c_id").cast("long").as("c_id"))
      .agg(count(lit(1)).as("n_list"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/sizes")

  /** Persist `stats/<col>/` — per-list VALUE histogram `(c_id, sval,
    * n_list)` of one inline payload column, counted from the lists
    * actually written (read-back, like [[writeSizes]] — the scan reads
    * the partition column plus ONE payload column). This is the
    * zone-map-style metadata behind [[probeIvfIndexFiltered]]: under a
    * payload predicate the mass budget must run over MATCHING counts,
    * and the per-(list, value) histogram is the config-sized artifact
    * that answers "how many matching rows does each list hold" without
    * a corpus pass at probe time (cardinality: lists × distinct values
    * — low-cardinality metadata columns like label/lang/source by
    * construction; a high-cardinality column would be the wrong
    * filter-stats key at any engine).
    */
  private def writeListStats(spark: SparkSession, path: String,
      statsCol: String): Unit =
    spark.read.parquet(s"$path/lists")
      .groupBy(col("c_id").cast("long").as("c_id"),
        col(statsCol).as("sval"))
      .agg(count(lit(1)).as("n_list"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats/$statsCol")

  /** The persisted stats directories present at `path` (the store may
    * carry histograms for any subset of its payload columns).
    */
  private def statsDirs(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** The per-(list, value) histogram of one payload column — the
    * persisted `stats/<col>/` artifact when present ([[writeIvfIndex]]'s
    * `statsCols`), else recounted from the lists' `(c_id, <col>)`
    * columns (a two-column pruned scan — the documented fallback for
    * stores built without the artifact, mirroring [[listSizes]]'s; the
    * persisted artifact is what makes the filtered probe corpus-pass-
    * free at steady state).
    */
  def listStats(spark: SparkSession, path: String,
      statsCol: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/stats/$statsCol")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(s"$path/stats/$statsCol")
    else spark.read.parquet(s"$path/lists")
      .groupBy(col("c_id").cast("long").as("c_id"),
        col(statsCol).as("sval"))
      .agg(count(lit(1)).as("n_list"))
  }

  /** 1-in-N deterministic hash slice for the auto route's per-list mass
    * estimate — the cost knob: the estimating pass assigns only
    * `corpus / RouteSampleStride` rows (the filter on `xxhash64(vec_id)`
    * pushes through the assignment's windows — they partition on
    * `vec_id` — down to the scan).
    */
  private val RouteSampleStride = 64L

  /** PER-LIST file counts for the auto route (r18): the r17 global-mean
    * rule (`ceil((inputBytes / lists) / targetFileBytes)`, one count for
    * every list) sized files for the UNIFORM corpus — on a Zipf-mass
    * corpus (§15a: heaviest cluster 24% of rows) the heavy list's share
    * divided by the global count gave files at `0.24 × lists ×` the
    * target, and the single task writing each of them was the build's
    * straggler. Here each list gets `ceil(listBytes / targetFileBytes)`
    * files with `listBytes` estimated as `inputBytes × (sampled list
    * rows / sampled total)` from a deterministic
    * 1/[[RouteSampleStride]] hash slice of the SAME assignment that
    * files the rows — never a second full assignment pass. Lists absent
    * from the sample route to 1 file (the floor); estimates are a
    * LAYOUT knob only — row content and probe results are invariant to
    * which file a row lands in.
    *
    * `None` when the plan-stats estimate is the session's
    * `defaultSizeInBytes` sentinel (in-memory test frames with no real
    * size) — callers fall back to the 1-file route rather than trusting
    * an 8 EB placeholder. Per-list counts clamped to [1, 4096].
    */
  private def autoListFileCounts(
      base: DataFrame, listed: DataFrame,
      targetFileBytes: Long): Option[Map[Long, Int]] = {
    val stats = base.queryExecution.optimizedPlan.stats.sizeInBytes
    val unknown = BigInt(
      base.sparkSession.sessionState.conf.defaultSizeInBytes)
    if (stats >= unknown || stats <= 0) None
    else {
      val sampled = listed
        .filter(pmod(xxhash64(col("vec_id")), lit(RouteSampleStride)) === 0)
        .groupBy(col("c_id").cast("long").as("c_id"))
        .agg(count(lit(1)).as("_n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val total = math.max(sampled.map(_._2).sum, 1L)
      Some(sampled.map { case (cid, nSampled) =>
        val bytes = stats * nSampled / total
        val files = (bytes + targetFileBytes - 1) / targetFileBytes
        cid -> files.max(1).min(4096).toInt
      }.toMap)
    }
  }

  /** Co-partition rows with their target list (plus a deterministic
    * `xxhash64(vec_id) % filesPerList` sub-split), so the partitionBy
    * writer emits `≤ filesPerList` files per `c_id=` directory instead
    * of one per upstream task per list. Row content is untouched —
    * routing only decides WHICH file a row lands in.
    *
    * At `filesPerList = 1` the exchange keys on `c_id` alone (each list
    * lands wholly in one task — exactly one file, under any AQE
    * coalescing). At > 1 the partition COUNT is pinned to
    * `lists × filesPerList` (the intended writer parallelism): an
    * adaptive exchange would COALESCE the small sub-splits back into
    * shared tasks — same-list splits in one task merge into one file —
    * and silently undo the sizing (measured: a 76-way split wrote 1 file
    * per list under AQE before the pin). Capped at 65536 tasks; past
    * that a task holds several sub-splits and files grow past
    * `targetFileBytes` proportionally — still bounded, never drizzle.
    */
  private def routeToLists(
      rows: DataFrame, filesPerList: Int, nLists: Long): DataFrame =
    if (filesPerList <= 1) rows.repartition(col("c_id"))
    else {
      val parts = math.min(math.max(nLists, 1L) * filesPerList, 65536L).toInt
      rows.withColumn(BuildRouteCol,
          pmod(xxhash64(col("vec_id")), lit(filesPerList.toLong)))
        .repartition(parts, col("c_id"), col(BuildRouteCol))
        .drop(BuildRouteCol)
    }

  /** [[routeToLists]] with a PER-LIST split width (the auto route's
    * mass-proportional counts from [[autoListFileCounts]]): each row's
    * sub-split is `xxhash64(vec_id) % files(c_id)`, so a Zipf-heavy
    * list fans across `ceil(itsBytes / target)` writer tasks while
    * light lists stay at one file — the build's wall stops being bound
    * by the single task that used to serialize the heaviest list, and
    * no file is sized by a GLOBAL mean the skew makes fictional. Lists
    * missing from the (sampled) map default to 1. The partition count
    * is pinned (Σ files + one slack slot per list for the defaults) for
    * the same AQE-coalescing reason as [[routeToLists]]; all-1 maps
    * collapse to the plain `c_id` exchange.
    */
  private def routeToListsWeighted(
      rows: DataFrame, listFiles: Map[Long, Int], nLists: Long): DataFrame =
    if (listFiles.values.forall(_ <= 1)) rows.repartition(col("c_id"))
    else {
      val parts = math.min(
        listFiles.values.map(_.toLong).sum + math.max(nLists, 1L),
        65536L).toInt
      val filesOf = typedLit(listFiles)
      rows.withColumn(BuildRouteCol,
          pmod(xxhash64(col("vec_id")),
            coalesce(element_at(filesOf, col("c_id").cast("long")), lit(1))
              .cast("long")))
        .repartition(parts, col("c_id"), col(BuildRouteCol))
        .drop(BuildRouteCol)
    }

  /** [[writeIvfIndex]] only when `path` has no completed store — the
    * serving pattern (build once, probe many); callers that must refresh
    * call [[writeIvfIndex]] directly.
    */
  def ensureIvfIndex(
      base: DataFrame,
      id: Column,
      vec: Column,
      path: String,
      centroidStride: Int = 50,
      maxCentroids: Int = 256,
      hierarchical: Boolean = true,
      superStride: Int = 16,
      sProbe: Int = 2,
      pq: Boolean = false,
      numSubspaces: Int = 8,
      numCodes: Int = 16,
      codeStride: Int = 16,
      payload: Seq[Column] = Nil,
      filesPerList: Int = 0,
      targetFileBytes: Long = 128L << 20,
      pqResidual: Boolean = false,
      statsCols: Seq[String] = Nil): Unit = {
    // resolve the requested payload NAMES the same way the build records
    // them, so a servable store built without (or with different) payload
    // columns is rebuilt here instead of failing the caller's filtered
    // probe on an unresolved column
    val payNames =
      if (payload.isEmpty) Nil
      else base.select((id.as("vec_id") +: payload): _*).columns.toSeq.drop(1)
    // the encoding-space requirement only binds for PQ ensures — a plain
    // ensure must keep serving existing PQ stores (their codes are
    // simply unread), so pass a requirement, not the default
    if (!isServable(base.sparkSession, path, payNames,
        if (pq) Some(pqResidual) else None))
      writeIvfIndex(base, id, vec, path, centroidStride, maxCentroids,
        hierarchical, superStride, sProbe, pq, numSubspaces, numCodes,
        codeStride, payload = payload, filesPerList = filesPerList,
        targetFileBytes = targetFileBytes, pqResidual = pqResidual,
        statsCols = statsCols)
    else {
      // servable store, possibly built before these histograms were
      // requested: persist any missing stats/<col> from the lists
      // already on disk (idempotent read-back recount — rows unchanged,
      // so no rebuild; the filtered probe then runs corpus-pass-free)
      val have = statsDirs(base.sparkSession, path).toSet
      statsCols.filterNot(have).foreach(
        writeListStats(base.sparkSession, path, _))
    }
    // callers with a TRAINED model check isServable themselves before
    // training (the model derivation may run eager jobs — an ensure that
    // trains just to discard the result would defeat its own point)
  }

  /** Assign `increment` against the STORED centroids (and, for a
    * hierarchical store, the same super-geometry — both re-derived from
    * the store, so an appended row lands exactly where a build-time row
    * with the same vector would) and append its rows inside the existing
    * `c_id=` partition directories. The centroid model is deliberately
    * NOT retrained: stored rows must stay probe- and batch-independent,
    * the same fixed-model contract as the PQ codebook. Cost tracks the
    * increment — the store is never read, only its directories appended.
    */
  def appendToIvfIndex(
      increment: DataFrame,
      id: Column,
      vec: Column,
      path: String,
      filesPerList: Int = 0,
      targetFileBytes: Long = 128L << 20): Unit = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = increment.sparkSession
    require(isComplete(path), s"no completed IVF store at $path — build with " +
      "writeIvfIndex before appending")
    val meta = readMeta(spark, path)
    val cents = spark.read.parquet(s"$path/centroids")
    val b = increment.select(id.as("vec_id"), vec.as("v"))
    val listed =
      if (meta.hierarchical)
        Similarity.ivfAssignHierarchical(increment, id, vec, cents,
          meta.superStride, meta.sProbe)
      else Similarity.ivfAssignTo(cents, b, "v", "vec_id", 1)
    val rows =
      if (!meta.pq) listed
      else {
        val cb = readCodebook(spark, path, meta)
        def enc(c: Column) = ColumnBridge.column(graft.functions.PqEncode(
          ColumnBridge.expression(c.cast("array<double>")), cb))
        // residual stores encode the increment in residual space against
        // the STORED centroids and the STORED (residual-space) codebook —
        // appended rows must quantize exactly as build-time rows would
        if (meta.pqResidual)
          listed.join(broadcast(cents.select(col("c_id"), col("cv"))),
              Seq("c_id"))
            .withColumn("codes", enc(zip_with(col("v").cast("array<double>"),
              col("cv"), (a, bb) => a - bb)))
            .drop("cv")
        else listed.withColumn("codes", enc(col("v")))
      }
    // payload columns are selected BY THE NAMES the build recorded, so an
    // increment missing one fails loudly here instead of appending rows
    // a filtered probe would silently treat as predicate-false
    val stored =
      if (meta.payload.isEmpty) rows
      else rows.join(
        increment.select((id.as("vec_id") +: meta.payload.map(col)): _*),
        Seq("vec_id"))
    require(filesPerList >= 0,
      s"filesPerList must be positive (or 0 = auto), got $filesPerList")
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    // same routing as the build: an append adds a bounded file count per
    // TOUCHED list per batch (not one per upstream task per list), which
    // is what keeps compaction an occasional maintenance job instead of
    // a per-batch necessity. Auto-sizing uses the INCREMENT's bytes and
    // the increment's own (sampled) per-list masses: a small batch
    // routes to 1 file per touched list, a bulk backfill gets
    // block-sized files like a build would — including on a skewed
    // increment, where the heavy list fans out instead of writing one
    // oversized straggler file.
    lazy val nLists = cents.count()
    val routed =
      if (filesPerList > 0)
        routeToLists(stored, filesPerList,
          if (filesPerList > 1) nLists else 1L)
      else autoListFileCounts(increment, listed, targetFileBytes) match {
        case Some(m) => routeToListsWeighted(stored, m, nLists)
        case None => routeToLists(stored, 1, 1L)
      }
    routed
      .write.mode("append").partitionBy("c_id").parquet(s"$path/lists")
    // refresh the persisted list lengths AFTER the rows land (order
    // matters: a crash between the two leaves sizes/ stale — the mass
    // budget then probes on last batch's masses, an approximation-
    // quality drift the next append self-heals, never a wrong result).
    // Full recount, not an increment merge: the count scan reads only
    // the partition column (file metadata), and recounting also heals a
    // stale sizes/ from a previously interrupted append.
    writeSizes(spark, path)
    // same refresh-by-recount for whichever payload histograms the
    // build persisted (statsDirs — presence IS the registration, like
    // sizes/): an append's new rows enter the filtered probe's masses
    // the moment they are probeable, and a crash mid-refresh degrades
    // to last batch's counts, healed by the next append, never a wrong
    // result (stats only weight the budget's list SELECTION).
    statsDirs(spark, path).foreach(writeListStats(spark, path, _))
  }

  private def readCodebook(
      spark: SparkSession, path: String, meta: Meta): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$path/codebook").collect()
      .map(r => ((r.getAs[Int]("s"), r.getAs[Long]("j"), r.getAs[Int]("pos")),
        r.getAs[Double]("val"))).toMap
    val subDim = rows.keys.map(_._3).max
    Array.tabulate(meta.numSubspaces)(s => Array.tabulate(meta.numCodes)(j =>
      Array.tabulate(subDim)(p => rows((s, j.toLong, p + 1)))))
  }

  /** The probed query assignment `(c_id, q_id, qv)` in the store's own
    * geometry, plus the distinct probed list ids (config-sized: ≤
    * `|queries| · nProbe` longs — the one driver collect, and it is the
    * partition-pruning literal, not data).
    */
  private def probedLists(
      spark: SparkSession, path: String, meta: Meta, queries: DataFrame,
      id: Column, vec: Column, nProbe: Int): (DataFrame, Array[Long]) = {
    val cents = spark.read.parquet(s"$path/centroids")
    val probed =
      (if (meta.hierarchical)
        Similarity.ivfAssignHierarchical(queries, id, vec, cents,
          meta.superStride, meta.sProbe, keep = nProbe)
          .select(col("c_id"), col("vec_id").as("q_id"), col("v").as("qv"))
      else
        Similarity.ivfAssignTo(cents,
          queries.select(id.as("q_id"), vec.as("qv")), "qv", "q_id", nProbe))
    val ids = probed.select(col("c_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    (probed, ids)
  }

  /** The MASS-BUDGET probe selection over a store's persisted model
    * artifacts — [[Similarity.massProbed]]'s rule fed by `centroids/` and
    * [[listSizes]], shared by every adaptive probe
    * ([[probeIvfIndexAdaptive]], [[probeIvfPqIndex]]'s and
    * [[probeIvfRange]]'s `massPpm`). Output mirrors [[probedLists]]:
    * the probed `(c_id, q_id, qv)` assignment plus the budget-selected
    * distinct list ids (the one driver collect — the partition-pruning
    * literal, config-sized).
    */
  private def massProbedLists(
      spark: SparkSession, path: String, queries: DataFrame,
      id: Column, vec: Column, massPpm: Long): (DataFrame, Array[Long]) = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("c_id"), col("cv"))
    val sizes = listSizes(spark, path)
    val n = sizes.agg(coalesce(sum(col("n_list")), lit(0L)))
      .collect().head.getLong(0)
    require(n > 0, s"store at $path has no rows — nothing to probe")
    val probed = Similarity.massProbed(
      queries.select(id.as("q_id"), vec.as("qv")), cents, sizes, n, massPpm)
      .select(col("c_id"), col("q_id"), col("qv"))
    val ids = probed.select(col("c_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    (probed, ids)
  }

  /** TWO-LEVEL mass-budget selection over the store's persisted model —
    * the in-flight s37 rule ([[Similarity.ivfTopKHierarchicalAdaptive]])
    * served from `centroids/` + [[listSizes]]: the super geometry is
    * re-derived from the persisted centroid table exactly as the build
    * derived it (`hierSupers`/`hierC2s` at `meta.superStride` — the
    * filing is deterministic in the centroids, so no extra artifact is
    * needed), leaf sizes roll up through the filing to super masses,
    * [[Similarity.massProbed]]'s gate picks supers, and the probed
    * supers' leaf centroids rank ACROSS their union per query under the
    * same budget. Per-query centroid dots drop from `lists` to
    * `lists/superStride + probed-supers' centroids` — the saving that
    * matters when the probe BATCH is large (serving-scale inference),
    * where the flat rank's `|queries| × lists` assignment dots dominate
    * the budget-bounded scan.
    */
  private def hierMassProbedLists(
      spark: SparkSession, path: String, meta: Meta, queries: DataFrame,
      id: Column, vec: Column, massPpm: Long): (DataFrame, Array[Long]) = {
    import org.apache.spark.sql.expressions.Window
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("c_id"), col("cv"))
    val supers = Similarity.hierSupers(cents, meta.superStride)
    val c2s = Similarity.hierC2s(cents, supers)
    val sizes = listSizes(spark, path)
    val n = sizes.agg(coalesce(sum(col("n_list")), lit(0L)))
      .collect().head.getLong(0)
    require(n > 0, s"store at $path has no rows — nothing to probe")
    val superSizes = c2s.select(col("s_id"), col("c_id"))
      .join(sizes, Seq("c_id"), "left")
      .groupBy("s_id")
      .agg(sum(coalesce(col("n_list"), lit(0L))).as("n_list"))
    val qsup = Similarity.massProbed(
      queries.select(id.as("q_id"), vec.as("qv")),
      supers.select(col("s_id").as("c_id"), col("sv").as("cv")),
      superSizes.select(col("s_id").as("c_id"), col("n_list")),
      n, massPpm)
      .select(col("c_id").as("s_id"), col("q_id"), col("qv"), col("_qu"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("c_dot").desc, col("c_id").asc)
    val probed = qsup
      .join(broadcast(c2s.select(col("s_id"), col("c_id"), col("cv"))
        .withColumn("_cu", Similarity.unitMicros(col("cv")))), Seq("s_id"))
      .select(col("q_id"), col("qv"), col("_qu"), col("c_id"),
        Similarity.unitDot(col("_qu"), col("_cu")).as("c_dot"))
      .join(broadcast(sizes), Seq("c_id"), "left")
      .withColumn("_m", coalesce(col("n_list"), lit(0L)))
      .withColumn("cum_before", coalesce(sum(col("_m")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") * 1000000L < lit(massPpm) * n)
      .select(col("c_id"), col("q_id"), col("qv"))
    val ids = probed.select(col("c_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    (probed, ids)
  }

  /** The store's lists restricted to the probed ids, via a literal filter
    * ON THE PARTITION COLUMN — static partition pruning; only the probed
    * `c_id=` directories are listed or read. The literal is typed to the
    * partition column's inferred type (directory values parse as INT when
    * they fit — a long-typed literal would wrap the column in a cast and
    * defeat pruning).
    */
  private def prunedLists(
      spark: SparkSession, path: String, ids: Array[Long]): DataFrame = {
    val raw = spark.read.parquet(s"$path/lists")
    val pruned = raw.schema("c_id").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.filter(col("c_id").isin(ids.toIndexedSeq: _*))
      case org.apache.spark.sql.types.IntegerType =>
        raw.filter(col("c_id").isin(ids.toIndexedSeq.map(_.toInt): _*))
      case _ =>
        raw.filter(col("c_id").cast("long").isin(ids.toIndexedSeq: _*))
    }
    pruned.withColumn("c_id", col("c_id").cast("long"))
  }

  /** Probe a persisted IVF store: assign `queries` to their `nProbe`
    * nearest lists in the store's own geometry, read ONLY those
    * partitions, broadcast the query assignment onto them, and return the
    * exact-cosine top-k — [[Similarity.ivfTopK]] /
    * [[Similarity.ivfTopKHierarchical]] output shape
    * (`q_id, vec_id, cos, rn`), bit-identical to the in-flight tier that
    * shares the store's geometry (spec-pinned), with probe IO that tracks
    * the probed lists instead of the corpus.
    *
    * `where` is PRE-FILTERED vector search over the store's inline
    * payload columns (see [[writeIvfIndex]]): the predicate restricts the
    * CANDIDATE set before ranking — each query still gets its full `k`
    * survivors among matching rows (post-filtering a plain top-k would
    * return < k and miss matches outside the unfiltered top) — and it
    * evaluates inside the pruned list scan as a pushed parquet data
    * filter, so a filtered probe reads the same `nProbe`-pruned
    * partitions and never joins a corpus-sized attribute table.
    */
  def probeIvfIndex(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int = 10,
      nProbe: Int = 2,
      where: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(isComplete(path), s"no completed IVF store at $path")
    val meta = readMeta(spark, path)
    val (probed, ids) = probedLists(spark, path, meta, queries, id, vec, nProbe)
    val lists = where.foldLeft(prunedLists(spark, path, ids))(_.filter(_))
    // rank on the exact integer unit-grid dot (the s26 convention —
    // each side's unit vector computed once, store-side per candidate
    // row, query-side on the config-sized broadcast); the emitted
    // `cos_ud` IS that integer score (`/2⁴⁰ ≈ cosine`) — no float
    // column enters the output hash
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ud").desc, col("vec_id").asc)
    lists.withColumn("_vu", Similarity.unitMicros(col("v")))
      .join(broadcast(probed.withColumn("_qu", Similarity.unitMicros(col("qv")))),
        Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.unitDot(col("_qu"), col("_vu")).as("cos_ud"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** The store's per-list row counts `(c_id, n_list)` — the persisted
    * `sizes/` artifact when present (every store written or appended
    * since r18 carries it), else counted from the lists' partition
    * column (file metadata — no vector is read; stores built by earlier
    * rounds lack the artifact until their next append refreshes it).
    */
  def listSizes(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/sizes")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(s"$path/sizes")
    else spark.read.parquet(s"$path/lists")
      .groupBy(col("c_id").cast("long").as("c_id"))
      .agg(count(lit(1)).as("n_list"))
  }

  /** [[probeIvfIndex]] with [[Similarity.ivfTopKAdaptive]]'s MASS BUDGET
    * in place of the fixed `nProbe` — the steady-state 100 TB answer to
    * §16c's finding, applied where it pays most: with lists stored
    * `partitionBy(c_id)`, the budget-selected list set IS the partition
    * filter, so `massPpm` bounds the BYTES each query's pruned scan
    * touches — an explicit, skew-proof per-query I/O budget where fixed
    * nProbe's actual cost silently varies with list imbalance (a heavy
    * cluster's 2 lists can be 100× a light one's). List masses come from
    * the store's own config-sized [[listSizes]] artifact — the probe
    * never pays a corpus pass — and the selection rule is byte-identical
    * to the in-flight tier's ([[Similarity.massProbed]]: flat unit-grid
    * centroid rank, window cumsum, all-integer gate), so a probe of a
    * FLAT store replays bit-for-bit against `ivfTopKAdaptive` on the
    * same corpus (spec-pinned; the shared-oracle identity behind
    * s34_ann_store_adaptive). On a HIERARCHICAL store the stored filing
    * is whatever the build recorded; this probe still ranks all lists
    * flat on the query side (masses are config metadata either way), so
    * it trades `|queries| × lists` assignment dots for the flat tier's
    * recall. [[probeIvfIndexHierAdaptive]] is the two-level-ranked
    * sibling (r18) — measured SLOWER-or-even at the 256-list default
    * (BASELINE §17f), it earns its keep only at large list counts where
    * the flat rank stops being config-sized. `where` is the same pushed
    * payload pre-filter as [[probeIvfIndex]]'s.
    */
  def probeIvfIndexAdaptive(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int = 10,
      massPpm: Long = 150000L,
      where: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(isComplete(path), s"no completed IVF store at $path")
    require(massPpm > 0 && massPpm <= 1000000L,
      s"massPpm out of (0, 1e6]: $massPpm")
    readMeta(spark, path) // generation check; the flat rank needs no mode
    val (probed, ids) = massProbedLists(spark, path, queries, id, vec, massPpm)
    val lists = where.foldLeft(prunedLists(spark, path, ids))(_.filter(_))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ud").desc, col("vec_id").asc)
    lists.withColumn("_vu", Similarity.unitMicros(col("v")))
      .join(broadcast(probed.select(col("c_id"), col("q_id"),
          Similarity.unitMicros(col("qv")).as("_qu"))),
        Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.unitDot(col("_qu"), col("_vu")).as("cos_ud"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** FILTERED top-k under the mass budget, with the budget run over
    * MATCHING masses — the metadata-filtered vector search the raw-mass
    * tiers get WRONG on any corpus where the predicate is anti-
    * correlated with the query's neighborhood (cross-source / cross-
    * language retrieval: "nearest docs from that OTHER source").
    *
    * The failure this closes (BASELINE §18a measures it): both
    * [[probeIvfIndex]]'s fixed `nProbe` and [[probeIvfIndexAdaptive]]'s
    * raw-mass budget select lists by the query's centroid-cosine order
    * alone — under a selective predicate whose matching rows live AWAY
    * from the query (in cluster terms: the filter names a cluster the
    * query is not near), the selected lists hold plenty of ROWS but no
    * MATCHING rows, every candidate dies on the scan predicate, and
    * filtered recall collapses while the unfiltered contracts all stay
    * green. No raw-mass budget can see this: row mass is the wrong
    * measure the moment a predicate reweights the corpus.
    *
    * The rule here is [[Similarity.massProbed]]'s gate fed by FILTERED
    * per-list masses from the store's `stats/<statsCol>/` histogram
    * ([[listStats]] — config-sized, persisted at build, refreshed on
    * append): lists still rank by centroid cosine, but (a) lists with
    * ZERO matching rows are excluded outright (`dropEmpty` — they can
    * contribute no candidate, and scanning them buys nothing), and (b)
    * the cumsum-until-budget runs over matching counts against the
    * corpus's total MATCHING count. `massPpm` thereby keeps its
    * meaning under any predicate: the fraction of the MATCHING corpus
    * each query's pruned scan may touch — probing exactly as deep as
    * the filtered neighborhood requires, whether the predicate names
    * 40% of the corpus or 0.4%. All-integer decision, oracle-replayable
    * (s40).
    *
    * `statsValues` is the predicate (`statsCol IN (values…)`), applied
    * three times from one declaration so the budget's weighting and the
    * scan's filter can never diverge: filtered masses (selection), the
    * pruned scan's pushed data filter (candidates), and the matching
    * total (the budget's denominator). `where` composes an optional
    * RESIDUAL predicate on other payload columns — it filters
    * candidates but, by design, does not reweight the budget (declare
    * the selective dimension as the stats column; residual predicates
    * should be the mild ones).
    *
    * 100 TB shape: identical to [[probeIvfIndexAdaptive]] — the
    * budget-selected list set IS the partition filter, the predicate is
    * a parquet data filter inside only those partitions, and the
    * histogram join is config-sized × broadcast. The one new scale knob
    * is stats cardinality (lists × distinct values), which is
    * config-sized precisely when the stats column is low-cardinality
    * metadata (label / lang / source) — the same constraint every
    * engine's filter-stats carry.
    */
  def probeIvfIndexFiltered(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      id: Column,
      vec: Column,
      statsCol: String,
      statsValues: Seq[Any],
      k: Int = 10,
      massPpm: Long = 150000L,
      where: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(isComplete(path), s"no completed IVF store at $path")
    require(massPpm > 0 && massPpm <= 1000000L,
      s"massPpm out of (0, 1e6]: $massPpm")
    require(statsValues.nonEmpty, "statsValues must name at least one value")
    val meta = readMeta(spark, path)
    require(meta.payload.contains(statsCol),
      s"statsCol '$statsCol' is not a stored payload column of $path " +
        s"(stored: ${meta.payload.mkString(", ")}) — the probe's scan " +
        "predicate runs on the inline payload, build with payload= and " +
        "statsCols=")
    // one filtered-mass table from the persisted histogram: values
    // collapse to per-list matching counts; the total is the budget's
    // denominator (a config-sized agg, not a corpus pass)
    val fsizes = listStats(spark, path, statsCol)
      .filter(col("sval").isin(statsValues: _*))
      .groupBy(col("c_id")).agg(sum(col("n_list")).as("n_list"))
    val nF = fsizes.agg(coalesce(sum(col("n_list")), lit(0L)))
      .collect().head.getLong(0)
    require(nF > 0,
      s"no stored rows match $statsCol IN (${statsValues.mkString(", ")})")
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("c_id"), col("cv"))
    val probed = Similarity.massProbed(
      queries.select(id.as("q_id"), vec.as("qv")), cents, fsizes, nF,
      massPpm, dropEmpty = true)
      .select(col("c_id"), col("q_id"), col("qv"))
    val ids2 = probed.select(col("c_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val lists = where.foldLeft(
      prunedLists(spark, path, ids2)
        .filter(col(statsCol).isin(statsValues: _*)))(_.filter(_))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ud").desc, col("vec_id").asc)
    lists.withColumn("_vu", Similarity.unitMicros(col("v")))
      .join(broadcast(probed.select(col("c_id"), col("q_id"),
          Similarity.unitMicros(col("qv")).as("_qu"))),
        Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.unitDot(col("_qu"), col("_vu")).as("cos_ud"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** [[probeIvfIndexAdaptive]] with the TWO-LEVEL rank on the query side
    * — the store-served [[Similarity.ivfTopKHierarchicalAdaptive]]
    * (s37): one `massPpm`, two applications of the gate (supers by
    * rolled-up mass, then the probed supers' leaf centroids across
    * their union), budget-selected lists as the partition filter. A
    * hierarchical store at s37's geometry probed this way is s37 by
    * construction (shared oracle, s38) — same lists (the build filing
    * IS `ivfAssignHierarchical` at the recorded `superStride`/`sProbe`),
    * same selection rule, same exact rescore.
    *
    * When to pick which — MEASURED, not the dot-count intuition
    * (BASELINE §17f, 200k corpus, 256 lists, 2000-query batch): at the
    * pinned 15% budget the two-level probe reads 1.12× faster (31.5 vs
    * 35.2 s — the budget-bounded candidate join dominates both, so the
    * assignment cut barely shows); at a 1% budget it is SLOWER (9.5 vs
    * 7.0 s — the extra gate's plan machinery costs more than the dots
    * it saves), and its recall plateau is the hier tier's 0.96–0.98 vs
    * the flat rank's 1.00 (§17d). So at list counts like the default
    * 256, prefer [[probeIvfIndexAdaptive]] — the two-level rank's
    * `lists → lists/superStride + probed-supers' centroids` saving only
    * outgrows its overhead when the list count itself is large
    * (10³–10⁵ lists, the billion-vector IVF geometry this sandbox
    * cannot reach), which is exactly when the flat per-query rank over
    * ALL lists stops being config-sized. Requires the store's recorded
    * super geometry (`hierarchical = true` build) — probing a flat
    * store two-level would INVENT a filing the stored lists never had.
    */
  def probeIvfIndexHierAdaptive(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int = 10,
      massPpm: Long = 150000L,
      where: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(isComplete(path), s"no completed IVF store at $path")
    require(massPpm > 0 && massPpm <= 1000000L,
      s"massPpm out of (0, 1e6]: $massPpm")
    val meta = readMeta(spark, path)
    require(meta.hierarchical,
      "two-level adaptive probe needs the store's recorded super " +
        "geometry (hierarchical build) — probe flat stores with " +
        "probeIvfIndexAdaptive")
    val (probed, ids) =
      hierMassProbedLists(spark, path, meta, queries, id, vec, massPpm)
    val lists = where.foldLeft(prunedLists(spark, path, ids))(_.filter(_))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ud").desc, col("vec_id").asc)
    lists.withColumn("_vu", Similarity.unitMicros(col("v")))
      .join(broadcast(probed.select(col("c_id"), col("q_id"),
          Similarity.unitMicros(col("qv")).as("_qu"))),
        Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.unitDot(col("_qu"), col("_vu")).as("cos_ud"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Radius (range) search against a persisted store: every candidate in
    * the probed lists with `cosine ≥ minCosine` — top-k's standard
    * sibling for "all near-duplicates / all matches above a bar" calls
    * (the SemDeDup prune's question, served from the index instead of
    * re-derived). Same probe shape as [[probeIvfIndex]] — config-sized
    * probed-list collect, static partition pruning, broadcast query
    * assignment, optional `where` pre-filter on payload columns — but no
    * per-query RESULT window at all: the threshold replaces the rank, so
    * top-k's one `k·|queries|`-bounded rank exchange disappears and the
    * store side flows scan→filter→join→project with no shuffle (the only
    * remaining exchanges are the config-sized query-assignment's own).
    * Membership decides on the exact integer unit-grid dot
    * (`minCosine` scaled to the 2⁴⁰ dot scale — see
    * [[Similarity.cosineMicros2]]), never on a float boundary; output is
    * `(q_id, vec_id, cos_ud)` where `cos_ud` IS the integer score
    * membership decided on (so every emitted row satisfies the bar —
    * and no float reaches the output), exactly as the top-k tiers emit
    * theirs. Result size is
    * data-dependent by definition — callers bound it with `minCosine`
    * (and `nProbe`), not `k`. APPROXIMATE like every IVF probe: a
    * neighbor above the bar whose list is unprobed is missed — recall
    * rides the same nProbe knob the top-k tiers measure.
    */
  def probeIvfRange(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      id: Column,
      vec: Column,
      minCosine: Double,
      nProbe: Int = 2,
      where: Option[Column] = None,
      massPpm: Option[Long] = None): DataFrame = {
    require(isComplete(path), s"no completed IVF store at $path")
    massPpm.foreach(m => require(m > 0 && m <= 1000000L,
      s"massPpm out of (0, 1e6]: $m"))
    val meta = readMeta(spark, path)
    // massPpm swaps the fixed-nProbe selection for the mass budget over
    // the persisted sizes — for range search the budget matters even
    // more than for top-k: the result set is data-dependent, so the
    // probe's I/O bound is the ONLY cost knob the caller holds
    val (probed, ids) = massPpm match {
      case Some(mp) => massProbedLists(spark, path, queries, id, vec, mp)
      case None => probedLists(spark, path, meta, queries, id, vec, nProbe)
    }
    val lists = where.foldLeft(prunedLists(spark, path, ids))(_.filter(_))
    // row MEMBERSHIP decides on the exact integer unit-grid dot
    // (`udot ≥ minCosine·2⁴⁰` — the one comparison a float boundary must
    // never own: a candidate AT the bar would flip rows_match across
    // engines, not just a hash); the emitted `cos_ud` is the SAME score
    // membership decided on, so output rows always satisfy
    // `cos_ud ≥ cosineMicros2(minCosine)` — unlike the old 6-dp float
    // display column, which could print below the bar
    lists.withColumn("_vu", Similarity.unitMicros(col("v")))
      .join(broadcast(probed.withColumn("_qu", Similarity.unitMicros(col("qv")))),
        Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_ud", Similarity.unitDot(col("_qu"), col("_vu")))
      .filter(col("cos_ud") >= Similarity.cosineMicros2(minCosine))
      .select(col("q_id"), col("vec_id"), col("cos_ud"))
  }

  /** File manifest of the store's inverted lists, one row per data file:
    * `(c_id, file_id, bytes)` — the metadata view a maintenance job plans
    * on. Built through the Hadoop FS API, so it works unchanged on
    * HDFS/S3 at deployment scale; at 100 TB the manifest is thousands of
    * rows where the lists are billions — maintenance plans on the
    * manifest, never the data.
    */
  def listManifest(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lists = new org.apache.hadoop.fs.Path(s"$path/lists")
    val fs = lists.getFileSystem(spark.sessionState.newHadoopConf())
    val rows = fs.listStatus(lists).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("c_id="))
      .flatMap { dir =>
        val cId = dir.getPath.getName.stripPrefix("c_id=").toLong
        fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
          .map(f => (cId, f.getPath.getName, f.getLen))
      }
    rows.toDF("c_id", "file_id", "bytes")
  }

  /** Small-file compaction for a store grown by [[appendToIvfIndex]] —
    * the `OPTIMIZE` analog: every append drops one file set per touched
    * `c_id=` directory, so a continuously-ingesting store drifts toward
    * drizzle-sized files and probe IO pays per-file open cost instead of
    * row-group scans. Planning is [[Layout.compactionPlan]] over
    * [[listManifest]] (group = list, next-fit by byte offset into
    * `targetBytes` bins); only lists where a rewrite wins are touched,
    * through a partition-pruned read and a DYNAMIC partition overwrite —
    * untouched lists are never read or rewritten. A rewrite wins in
    * EITHER direction (r18): some bin holds more than one file (drizzle
    * — the merge case), or some single file exceeds `2 × targetBytes`
    * (oversized — the SPLIT case, which drizzle-only compaction could
    * never fix: a Zipf-heavy list written before the mass-proportional
    * build route, or one whose mass outgrew its estimate across appends,
    * is one file in one bin and so never "needy" under the merge rule).
    * Rows are routed to `max(bins, ceil(listBytes / targetBytes))`
    * output files via a deterministic `xxhash64(vec_id) % files` split,
    * so a compacted list lands in row-group-friendly blocks of
    * ≈`targetBytes` whichever direction it came from.
    *
    * Probe results are bit-identical before and after (the store's ROWS
    * are untouched — spec-pinned, and `s28`'s standing oracle replays the
    * probe of a compacted store); the completeness marker is dropped for
    * the duration of the rewrite so a killed compaction fails the next
    * probe loudly instead of serving a half-rewritten store.
    *
    * @return the pre-compaction plan for the rewritten lists — one row
    *         per merged file: (`c_id`, `file_id`, `bytes`, `bin`,
    *         `bin_files`, `bin_bytes`)
    */
  def compactIvfIndex(
      spark: SparkSession,
      path: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    require(isComplete(path), s"no completed IVF store at $path")
    val manifest = listManifest(spark, path)
    val plan = Layout.compactionPlan(manifest, col("c_id"), col("file_id"),
      col("bytes"), targetBytes)
      .withColumnRenamed("group", "c_id")
    // lists worth rewriting, in either direction: drizzle (some bin
    // holds >1 file — merge) or an oversized single file (> 2× target —
    // split; within 2× is row-group tolerance, not worth a rewrite).
    // The rewrite width right-sizes both: at least the plan's bins, at
    // least the list's ideal ceil(bytes/target), clamped like the build
    val needy = plan.groupBy(col("c_id"))
      .agg(max(col("bin_files")).as("max_files"),
        countDistinct(col("bin")).as("bins"),
        max(col("bytes")).as("max_bytes"),
        sum(col("bytes")).as("list_bytes"))
      .filter(col("max_files") > 1 || col("max_bytes") > lit(2L * targetBytes))
      .select(col("c_id").cast("long"),
        least(greatest(col("bins"),
          expr(s"(list_bytes + ${targetBytes - 1}) div $targetBytes")),
          lit(4096L)).cast("int").as("bins"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    if (needy.nonEmpty) {
      val ids = needy.keys.toArray.sorted
      val rows = prunedLists(spark, path, ids)
      val binsOf = typedLit(needy)
      val rewrite = rows
        .withColumn(CompactRouteCol,
          pmod(xxhash64(col("vec_id")), element_at(binsOf, col("c_id"))))
        .repartition(math.max(needy.values.sum, 1), col("c_id"),
          col(CompactRouteCol))
        .drop(CompactRouteCol)
      val conf = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      dropMarker(path)
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        rewrite.write.mode("overwrite").partitionBy("c_id")
          .parquet(s"$path/lists")
      } finally {
        conf.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      putMarker(path)
    }
    import spark.implicits._
    plan.join(broadcast(needy.keys.toSeq.toDF("c_id")), Seq("c_id"))
  }

  /** Continuous ingestion into a persisted store: each micro-batch of
    * `(id, vec)` rows is assigned against the STORED model and appended
    * via [[appendToIvfIndex]] — the streaming face of the same append
    * contract, so the store a batch job builds and the store this stream
    * grows are the same artifact (the [[EventStreams.ingestDedupStream]]
    * shape applied to vectors).
    *
    * `foreachBatch` (not a stateful operator) is the right Spark shape:
    * the store is external shared state that must outlive the query and
    * stay probeable mid-stream. Assignment is deterministic, so an
    * at-least-once replay appends identical rows; exactly-once callers
    * dedup on `vec_id` at probe time or fence batches upstream — the
    * same caveat [[appendToIvfIndex]] documents for batch re-runs.
    */
  def appendStream(
      vecs: DataFrame,
      id: Column,
      vec: Column,
      path: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) appendToIvfIndex(batch, id, vec, path)
      }
      .start()

  /** Continuous serving against a persisted store: each micro-batch of
    * `(id, vec)` query rows is probed via [[probeIvfIndex]] and the
    * `(q_id, vec_id, cos, rn)` top-k rows are handed to `onResults` —
    * the read face of [[appendStream]], together the full
    * ingest-and-serve loop over one store artifact. Probing is stateless
    * per batch (the store is the state), so at-least-once replays re-emit
    * identical rows, and a store refreshed between batches is picked up
    * by the next batch's probe — mid-rewrite batches fail loudly on the
    * completeness marker rather than serving a half-written store.
    */
  def probeStream(
      queries: DataFrame,
      id: Column,
      vec: Column,
      path: String,
      onResults: (DataFrame, Long) => Unit,
      k: Int = 10,
      nProbe: Int = 2,
      where: Option[Column] = None): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          onResults(probeIvfIndex(batch.sparkSession, path, batch, id, vec,
            k, nProbe, where), batchId)
      }
      .start()

  /** Probe a PQ store ([[writeIvfIndex]] with `pq = true`): the ADC
    * candidate ranking reads ONLY `(vec_id, codes)` from ONLY the probed
    * partitions (column pruning × partition pruning — the scan that makes
    * IVF×PQ a serving index: a few small ints per candidate instead of
    * the vector), the pool survivors are broadcast back onto the same
    * pruned partitions to fetch full vectors for the exact rescore, and
    * the result is bit-identical to [[Similarity.ivfPqTopK]] over the
    * same geometry (spec-pinned). The pool floor `max(pool, k·nProbe)`
    * matches `ivfPqTopK`'s enforced contract.
    *
    * r18: serves RESIDUAL stores transparently (`writeIvfIndex(pq =
    * true, pqResidual = true)` — codes over `v − centroid(list)`, the
    * IVFADC layout §16c showed clustered corpora need): meta routes the
    * LUT to per-(query, probed-list) residual space, in lockstep with
    * `ivfPqTopK(residual = true)`. And both adaptive knobs compose:
    * `massPpm` replaces the fixed nProbe with the mass budget over the
    * persisted sizes (the budget then bounds the BYTES the codes scan
    * touches), `poolPpm` replaces the fixed pool with the candidate-
    * scaled cut — a residual store probed with both is the store-served
    * s33 (shared oracle, s35).
    *
    * `where` pre-filters candidates on the store's inline payload
    * columns, exactly as in [[probeIvfIndex]] — applied BEFORE the ADC
    * pool cut, so the pool holds `effPool` MATCHING candidates (filtering
    * after the cut would shrink the rescore pool below its floor). The
    * candidate scan then reads the predicate's columns beside
    * `(vec_id, codes)`; payload stays unread when `where` is empty.
    */
  def probeIvfPqIndex(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int = 10,
      nProbe: Int = 2,
      pool: Int = 50,
      where: Option[Column] = None,
      massPpm: Option[Long] = None,
      poolPpm: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.ColumnBridge
    require(isComplete(path), s"no completed IVF store at $path")
    massPpm.foreach(m => require(m > 0 && m <= 1000000L,
      s"massPpm out of (0, 1e6]: $m"))
    poolPpm.foreach(p => require(p > 0 && p <= 1000000L,
      s"poolPpm out of (0, 1e6]: $p"))
    val meta = readMeta(spark, path)
    require(meta.pq, s"store at $path was written without PQ codes — " +
      "probe with probeIvfIndex or rebuild with pq = true")
    val effPool = math.max(pool, k * nProbe)
    val cb = readCodebook(spark, path, meta)
    def lut(c: Column) = ColumnBridge.column(graft.functions.PqLut(
      ColumnBridge.expression(c.cast("array<double>")), cb))
    lazy val centsDf = spark.read.parquet(s"$path/centroids")
      .select(col("c_id"), col("cv"))
    // probe selection: fixed nProbe in the store's own geometry, or the
    // mass budget over the persisted sizes (see [[probeIvfIndexAdaptive]]
    // — same rule, so massPpm bounds the bytes the codes scan touches)
    val (probed, ids) = massPpm match {
      case Some(mp) => massProbedLists(spark, path, queries, id, vec, mp)
      case None => probedLists(spark, path, meta, queries, id, vec, nProbe)
    }
    // residual stores (meta.pqResidual) hold codes over v − centroid:
    // the LUT must be per-(query, probed LIST) over qv − centroid, in
    // lockstep with Similarity.ivfPqTopK(residual = true)
    val probedLut =
      if (!meta.pqResidual)
        probed.select(col("c_id"), col("q_id"), lut(col("qv")).as("lut"))
      else probed.join(broadcast(centsDf), Seq("c_id"))
        .select(col("c_id"), col("q_id"),
          lut(zip_with(col("qv").cast("array<double>"), col("cv"),
            (a, bb) => a - bb)).as("lut"))
    val all = prunedLists(spark, path, ids)
    val lists = where.foldLeft(all)(_.filter(_))
    val est = (0 until meta.numSubspaces)
      .map(s => element_at(col("lut"),
        element_at(col("codes"), s + 1) + s * meta.numCodes + 1))
      .reduce(_ + _)
    val wEst = Window.partitionBy(col("q_id"))
      .orderBy(col("est").asc, col("vec_id").asc)
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ud").desc, col("vec_id").asc)
    // candidate scan: codes only — the store's vectors are not read here
    val ranked = lists.select(col("c_id"), col("vec_id"), col("codes"))
      .join(broadcast(probedLut), Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), est.as("est"))
      .withColumn("ern", row_number().over(wEst))
    // fixed cut, or ivfPqTopK's ADAPTIVE CONTRACT rule (pool scales with
    // the query's probed candidate count, floor at one full result set)
    val poolRows = (poolPpm match {
      case Some(pp) => ranked
        .withColumn("cand_n",
          count(lit(1)).over(Window.partitionBy(col("q_id"))))
        .filter(col("ern") <= k ||
          col("ern") * 1000000L <= lit(pp) * col("cand_n"))
      case None => ranked.filter(col("ern") <= effPool)
    }).select(col("q_id"), col("vec_id"))
    // rescore fetch: pool·|queries| rows broadcast back onto the SAME
    // pruned partitions — full vectors are read only for survivors
    // (pool rows already satisfy `where`; re-filtering here would only
    // drag the predicate's payload columns into the vector scan)
    val qv = queries.select(id.as("q_id"), vec.as("qv"),
      Similarity.unitMicros(vec).as("_qu"))
    all.select(col("vec_id"), col("v"))
      .join(broadcast(poolRows), Seq("vec_id"))
      .join(broadcast(qv), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.unitDot(col("_qu"), Similarity.unitMicros(col("v"))).as("cos_ud"))
      .withColumn("rn", row_number().over(wCos).cast("long"))
      .filter(col("rn") <= k)
  }
}
