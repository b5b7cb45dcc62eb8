package graft.operators

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF / IVF×PQ store: parity with the in-flight tiers,
  * partition pruning of the probe (the store must NOT be scanned in
  * full), append semantics, and the loud failure modes.
  */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb: DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def queries: DataFrame = emb.filter(col("vec_id") < 5)

  private def tmpStore(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString + "/store"
  }

  private def ranking(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select("q_id", "vec_id", "rn").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  /** Run `body` with AQE off: the executed plan then exposes its
    * FileSourceScanExec leaves to `collect` directly (under AQE they hide
    * inside query stages). The pruning being pinned is STATIC — AQE
    * neither creates nor removes it.
    */
  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("probe of a written hierarchical store is bit-identical to the in-flight s19 tier") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfstore")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      centroidStride = 50, maxCentroids = 256, hierarchical = true,
      superStride = 16, sProbe = 2)
    assert(VectorIndex.isComplete(path))
    val stored = VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2)
    val inflight = Similarity.ivfTopKHierarchical(emb, queries,
      col("vec_id"), col("embedding"), k = 10, centroidStride = 50,
      nProbe = 2, maxCentroids = 256, superStride = 16, sProbe = 2)
    assert(ranking(stored) == ranking(inflight) && ranking(stored).nonEmpty)
  }

  test("probe of a flat store matches the in-flight s3 tier, and meta routes the mode") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfflat")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false)
    val stored = VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2)
    val inflight = Similarity.ivfTopK(emb, queries, col("vec_id"),
      col("embedding"), k = 10, centroidStride = 50, nProbe = 2)
    assert(ranking(stored) == ranking(inflight) && ranking(stored).nonEmpty)
  }

  test("the probe scan is partition-pruned to the probed lists (IO tracks nProbe/lists, not the corpus)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfprune")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path)
    val totalLists = new java.io.File(s"$path/lists").listFiles()
      .count(_.getName.startsWith("c_id="))
    withoutAqe {
    // ONE query × nProbe=2 → at most 2 of the store's lists may be read
    val probe = VectorIndex.probeIvfIndex(spark, path,
      emb.filter(col("vec_id") === 0), col("vec_id"), col("embedding"),
      k = 10, nProbe = 2)
    // collect(), not a noop write: the write would execute a FRESH
    // QueryExecution and leave probe's own scan metrics at 0, making the
    // partition-count pin below pass vacuously (r18 fix — the adaptive
    // test's exact-equality pin caught it)
    probe.collect()
    // the literal IN filter must reach the scan as a PARTITION filter —
    // a data filter (or a cast around the partition column) would read
    // every list and fall back to row-level filtering
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_id"),
      s"expected a partition filter on c_id in:\n$plan")
    // runtime pin: the scan touched at most the probed partitions
    val scans = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("lists")) => s
    }
    assert(scans.nonEmpty, "no file scan over the lists store found")
    val partsRead = scans.map(_.metrics("numPartitions").value).max
    assert(totalLists > 2, s"store too small to make pruning observable: $totalLists")
    assert(partsRead <= 2,
      s"probe read $partsRead of $totalLists list partitions — not pruned")
    }
  }

  test("adaptive probe of a flat store ≡ the in-flight ivfTopKAdaptive (the s34/s32 shared-oracle identity)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfadapt")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false)
    val stored = VectorIndex.probeIvfIndexAdaptive(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, massPpm = 150000L)
    val inflight = Similarity.ivfTopKAdaptive(emb, queries, col("vec_id"),
      col("embedding"), k = 10, centroidStride = 50, massPpm = 150000L)
    assert(ranking(stored) == ranking(inflight) && ranking(stored).nonEmpty)
  }

  test("two-level adaptive probe of a hier store ≡ the in-flight s37 (the s38/s37 shared-oracle identity)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfhieradapt")
    // writeIvfIndex defaults ARE s37's geometry (hier, superStride 16,
    // sProbe 2, stride-50 centroids capped at 256)
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path)
    val stored = VectorIndex.probeIvfIndexHierAdaptive(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, massPpm = 150000L)
    val inflight = Similarity.ivfTopKHierarchicalAdaptive(emb, queries,
      col("vec_id"), col("embedding"), k = 10, massPpm = 150000L)
    assert(ranking(stored) == ranking(inflight) && ranking(stored).nonEmpty)
    // full budget through the store ≡ brute force (the s37 endpoint,
    // store-served)
    val all = ranking(VectorIndex.probeIvfIndexHierAdaptive(spark, path,
      queries, col("vec_id"), col("embedding"), k = 10, massPpm = 1000000L))
    val brute = ranking(Similarity.bruteForceTopK(emb, queries,
      col("vec_id"), col("embedding"), k = 10))
    assert(all == brute)
    // a flat store has no recorded super geometry — rejected loudly,
    // never probed with an invented filing
    val flat = tmpStore("ivfhieradaptflat")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), flat,
      hierarchical = false)
    intercept[IllegalArgumentException] {
      VectorIndex.probeIvfIndexHierAdaptive(spark, flat, queries,
        col("vec_id"), col("embedding"))
    }
  }

  test("adaptive probe reads EXACTLY the budget-selected lists; sizes/ is the persisted mass artifact") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfadaptprune")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false)
    // sizes/ written at build = a recount of the persisted lists
    val persisted = VectorIndex.listSizes(spark, path)
      .select(col("c_id"), col("n_list"))
      .as[(Long, Long)].collect().toMap
    val recount = spark.read.parquet(s"$path/lists")
      .groupBy(col("c_id").cast("long")).agg(count(lit(1)))
      .as[(Long, Long)].collect().toMap
    assert(persisted == recount && persisted.nonEmpty)
    assert(new java.io.File(s"$path/sizes").isDirectory,
      "build must persist the sizes/ artifact")
    val totalLists = new java.io.File(s"$path/lists").listFiles()
      .count(_.getName.startsWith("c_id="))
    // the expected probed set, from the SAME rule over the store's own
    // model artifacts (massProbed is the shared selection)
    val oneQ = emb.filter(col("vec_id") === 0)
    val expected = Similarity.massProbed(
        oneQ.select(col("vec_id").as("q_id"), col("embedding").as("qv")),
        spark.read.parquet(s"$path/centroids"),
        VectorIndex.listSizes(spark, path),
        persisted.values.sum, 150000L)
      .select("c_id").distinct().count()
    withoutAqe {
      val probe = VectorIndex.probeIvfIndexAdaptive(spark, path, oneQ,
        col("vec_id"), col("embedding"), k = 10, massPpm = 150000L)
      // collect() executes THIS DataFrame's own executedPlan, so the
      // scan metrics below are populated (a noop write would build a
      // fresh QueryExecution and leave these at 0 — an equality pin
      // would then pass only vacuously)
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("c_id"),
        s"expected a partition filter on c_id in:\n$plan")
      val scans = probe.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("lists")) => s
      }
      assert(scans.nonEmpty, "no file scan over the lists store found")
      val partsRead = scans.map(_.metrics("numPartitions").value).max
      assert(expected < totalLists,
        s"fixture degenerate: budget selects all $totalLists lists")
      assert(partsRead == expected,
        s"probe read $partsRead list partitions, budget selected $expected")
    }
  }

  test("listSizes falls back to a lists recount when sizes/ is absent (pre-r18 stores)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfnosizes")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false)
    val before = ranking(VectorIndex.probeIvfIndexAdaptive(spark, path,
      queries, col("vec_id"), col("embedding"), k = 10, massPpm = 150000L))
    // simulate a store written by an earlier code generation
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$path/sizes"))
    assert(!new java.io.File(s"$path/sizes").exists())
    val after = ranking(VectorIndex.probeIvfIndexAdaptive(spark, path,
      queries, col("vec_id"), col("embedding"), k = 10, massPpm = 150000L))
    assert(after == before && after.nonEmpty,
      "fallback recount must select the same lists as the persisted sizes")
  }

  test("append refreshes sizes/ so the mass budget sees appended rows") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfsizesapp")
    VectorIndex.writeIvfIndex(emb.filter(col("vec_id") % 7 =!= 0),
      col("vec_id"), col("embedding"), path, hierarchical = false)
    val beforeN = VectorIndex.listSizes(spark, path)
      .agg(sum(col("n_list"))).as[Long].collect().head
    VectorIndex.appendToIvfIndex(emb.filter(col("vec_id") % 7 === 0),
      col("vec_id"), col("embedding"), path)
    val afterN = VectorIndex.listSizes(spark, path)
      .agg(sum(col("n_list"))).as[Long].collect().head
    assert(afterN == emb.count() && afterN > beforeN,
      s"sizes/ must cover build + increment: $beforeN -> $afterN")
  }

  test("residual PQ store probed with both adaptive knobs ≡ in-flight ivfPqTopK (the s35/s33 shared-oracle identity)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfpqres")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false, pq = true, pqResidual = true)
    val stored = VectorIndex.probeIvfPqIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10,
      massPpm = Some(150000L), poolPpm = Some(500000L))
    val inflight = Similarity.ivfPqTopK(emb, queries, col("vec_id"),
      col("embedding"), k = 10, centroidStride = 50, residual = true,
      massPpm = Some(150000L), poolPpm = Some(500000L))
    assert(ranking(stored) == ranking(inflight) && ranking(stored).nonEmpty)
  }

  test("ensure distinguishes residual from raw PQ stores: a raw store is rebuilt, not silently served") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfpqmode")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false, pq = true)
    assert(VectorIndex.isServable(spark, path, pqResidual = Some(false)))
    assert(!VectorIndex.isServable(spark, path, pqResidual = Some(true)),
      "a raw-codes store must not satisfy a residual-encoding requirement")
    // plain (encoding-agnostic) callers keep being served
    assert(VectorIndex.isServable(spark, path))
    VectorIndex.ensureIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false, pq = true, pqResidual = true)
    assert(VectorIndex.isServable(spark, path, pqResidual = Some(true)),
      "ensure must have rebuilt the store in residual space")
  }

  test("residual PQ append: increment encoded in residual space with the stored codebook; sizes refresh") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfpqresapp")
    // build slice keeps every stride-picked codebook id (0,16,…,240),
    // same carve as the raw-PQ maintenance spec
    VectorIndex.writeIvfIndex(
      emb.filter(col("vec_id") < 250 || col("vec_id") >= 300),
      col("vec_id"), col("embedding"), path,
      hierarchical = false, pq = true, pqResidual = true)
    VectorIndex.appendToIvfIndex(
      emb.filter(col("vec_id") >= 250 && col("vec_id") < 300),
      col("vec_id"), col("embedding"), path)
    val n = VectorIndex.listSizes(spark, path)
      .agg(sum(col("n_list"))).as[Long].collect().head
    assert(n == emb.count(), s"sizes must cover build + increment, got $n")
    // the probe decodes appended codes with the SAME stored residual
    // codebook — every query still gets a dense rank prefix
    val got = VectorIndex.probeIvfPqIndex(spark, path, queries,
        col("vec_id"), col("embedding"), k = 10,
        massPpm = Some(150000L), poolPpm = Some(500000L))
      .select("q_id", "rn").as[(Long, Long)].collect()
    assert(got.map(_._1).toSet == queries.select("vec_id")
      .as[Long].collect().toSet)
    got.groupBy(_._1).values.foreach(g =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.size).toSeq))
  }

  test("adaptive range probe: full mass budget ≡ the all-lists fixed probe; tiny budget is a subset") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfrangeadapt")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false)
    def rows(df: DataFrame) = df.select("q_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val nLists = new java.io.File(s"$path/lists").listFiles()
      .count(_.getName.startsWith("c_id="))
    val full = rows(VectorIndex.probeIvfRange(spark, path, queries,
      col("vec_id"), col("embedding"), minCosine = 0.25,
      massPpm = Some(1000000L)))
    val allFixed = rows(VectorIndex.probeIvfRange(spark, path, queries,
      col("vec_id"), col("embedding"), minCosine = 0.25, nProbe = nLists))
    assert(full == allFixed && full.nonEmpty,
      "full-budget adaptive range must equal the every-list fixed probe")
    val tiny = rows(VectorIndex.probeIvfRange(spark, path, queries,
      col("vec_id"), col("embedding"), minCosine = 0.25,
      massPpm = Some(1L)))
    assert(tiny.subsetOf(full),
      "a smaller budget may only shrink the result set")
  }

  test("append assigns the increment with the STORED model and probes see the union") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfappend")
    val batch1 = emb.filter(col("vec_id") % 7 =!= 0)
    val batch2 = emb.filter(col("vec_id") % 7 === 0)
    VectorIndex.writeIvfIndex(batch1, col("vec_id"), col("embedding"), path)
    VectorIndex.appendToIvfIndex(batch2, col("vec_id"), col("embedding"), path)
    val stored = VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2)
    // expected: the full corpus assigned against batch1's FIXED centroid
    // model (the append contract — the model never retrains), probed the
    // same way. Build it in-flight from the same parts.
    import org.apache.spark.sql.expressions.Window
    val cents = Similarity.ivfCentroids(
      batch1.select(col("vec_id"), col("embedding").as("v")), 50, 256)
    val listed = Similarity.ivfAssignHierarchical(emb, col("vec_id"),
      col("embedding"), cents, superStride = 16, sProbe = 2)
    val probed = Similarity.ivfAssignHierarchical(queries, col("vec_id"),
      col("embedding"), cents, superStride = 16, sProbe = 2, keep = 2)
      .select(col("c_id"), col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_ud").desc, col("vec_id").asc)
    val expected = listed.join(probed, Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.unitDot(Similarity.unitMicros(col("qv")),
          Similarity.unitMicros(col("v"))).as("cos_ud"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
    assert(ranking(stored) == ranking(expected) && ranking(stored).nonEmpty)
    // the appended rows really landed inside the existing partition dirs
    val n = spark.read.parquet(s"$path/lists").count()
    assert(n == emb.count())
  }

  test("PQ store: codes-only candidate scan probes bit-identically to in-flight IVF×PQ") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfpq")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = true, pq = true)
    val inflight = Similarity.ivfPqTopK(emb, queries, col("vec_id"),
      col("embedding"), k = 10, centroidStride = 50, nProbe = 2,
      numSubspaces = 8, numCodes = 16, codeStride = 16, pool = 50,
      hierarchical = true, superStride = 16, sProbe = 2)
    withoutAqe {
    val stored = VectorIndex.probeIvfPqIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2, pool = 50)
    assert(ranking(stored) == ranking(inflight) && ranking(stored).nonEmpty)
    // the ADC scan must not read the vector column: its scan schema is
    // (vec_id, codes) only — column pruning × partition pruning is the
    // point of storing codes beside the lists
    stored.write.mode("overwrite").format("noop").save()
    val scans = stored.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("lists")) => s
    }
    assert(scans.size >= 2, "expected the codes scan and the rescore fetch")
    assert(scans.exists(s => {
      val schema = s.requiredSchema.fieldNames.toSet
      schema.contains("codes") && !schema.contains("v")
    }), s"no codes-only scan found: ${scans.map(_.requiredSchema.fieldNames.mkString(","))}")
    }
  }

  test("compaction merges drizzle files, skips healthy lists, and probes are bit-identical") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfcompact")
    // build on one slice, then drizzle three appends — every touched list
    // directory accumulates one file set per append
    VectorIndex.writeIvfIndex(emb.filter(col("vec_id") % 4 === 0),
      col("vec_id"), col("embedding"), path)
    (1 to 3).foreach(r => VectorIndex.appendToIvfIndex(
      emb.filter(col("vec_id") % 4 === r), col("vec_id"), col("embedding"), path))
    val before = VectorIndex.listManifest(spark, path)
      .groupBy("c_id").count().as[(Long, Long)].collect().toMap
    assert(before.values.max > 1, s"appends produced no drizzle: $before")
    val probeBefore = ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    val plan = VectorIndex.compactIvfIndex(spark, path)
    // the returned plan covers exactly the lists that had mergeable bins
    val planned = plan.select("c_id").distinct().as[Long].collect().toSet
    val needy = before.filter(_._2 > 1).keySet
    assert(planned == needy, s"planned $planned vs needy $needy")
    val after = VectorIndex.listManifest(spark, path)
      .groupBy("c_id").count().as[(Long, Long)].collect().toMap
    // default targetBytes puts each tiny list in ONE bin → one file
    assert(needy.forall(c => after(c) == 1L),
      s"compacted lists still fragmented: ${after.filter(_._2 > 1)}")
    assert(VectorIndex.isComplete(path))
    // rows and probe results are untouched
    assert(spark.read.parquet(s"$path/lists").count() == emb.count())
    val probeAfter = ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    assert(probeAfter == probeBefore && probeAfter.nonEmpty)
    // a store with nothing to merge is a no-op plan
    assert(VectorIndex.compactIvfIndex(spark, path).isEmpty)
  }

  test("appendStream grows the store per micro-batch against the stored model") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    implicit val sqlCtx = spark.sqlContext
    val path = tmpStore("ivfstream")
    val base = emb.filter(col("vec_id") % 7 =!= 0)
    VectorIndex.writeIvfIndex(base, col("vec_id"), col("embedding"), path)
    val inc = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val q = VectorIndex.appendStream(
      stream.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), path)
    try {
      val (b1, b2) = inc.splitAt(inc.size / 2)
      stream.addData(b1: _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$path/lists").count() ==
        base.count() + b1.size)
      stream.addData(b2: _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$path/lists").count() == emb.count())
    } finally q.stop()
    // the streamed store is the batch-append store: same rows, same lists
    val batchPath = tmpStore("ivfstreamref")
    VectorIndex.writeIvfIndex(base, col("vec_id"), col("embedding"), batchPath)
    VectorIndex.appendToIvfIndex(emb.filter(col("vec_id") % 7 === 0),
      col("vec_id"), col("embedding"), batchPath)
    def listed(p: String) = spark.read.parquet(s"$p/lists")
      .select(col("c_id").cast("long"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(listed(path) == listed(batchPath))
  }

  test("PQ store maintenance: append encodes the increment with the STORED codebook; compaction preserves codes") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfpqmaint")
    // build slice keeps every stride-picked codebook id (0,16,…,240)
    val base = emb.filter(col("vec_id") < 250 || col("vec_id") >= 300)
    // PQ model (codebook) trained on the BUILD slice — appended rows must
    // be encoded with the stored model, never a retrained one
    VectorIndex.writeIvfIndex(base, col("vec_id"), col("embedding"), path,
      hierarchical = true, pq = true)
    VectorIndex.appendToIvfIndex(emb.filter(col("vec_id") >= 250 && col("vec_id") < 300),
      col("vec_id"), col("embedding"), path)
    val beforeCompact = ranking(VectorIndex.probeIvfPqIndex(spark, path,
      queries, col("vec_id"), col("embedding"), k = 10, nProbe = 2, pool = 50))
    assert(beforeCompact.nonEmpty)
    // every stored row (built + appended) carries codes of the same width
    val widths = spark.read.parquet(s"$path/lists")
      .select(size(col("codes"))).distinct().as[Int].collect().toSet
    assert(widths == Set(8), s"code widths after append: $widths")
    assert(spark.read.parquet(s"$path/lists").filter(col("codes").isNull).count() == 0)
    // compaction rewrites files, codes ride along, probe is bit-identical
    VectorIndex.compactIvfIndex(spark, path)
    val afterCompact = ranking(VectorIndex.probeIvfPqIndex(spark, path,
      queries, col("vec_id"), col("embedding"), k = 10, nProbe = 2, pool = 50))
    assert(afterCompact == beforeCompact)
  }

  test("probeStream serves each micro-batch from the store, in parity with the batch probe") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    implicit val sqlCtx = spark.sqlContext
    val path = tmpStore("ivfserve")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path)
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val stream = MemoryStream[(Long, Array[Float])]
    val q = VectorIndex.probeStream(
      stream.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), path,
      (res, _) => got.synchronized {
        got ++= res.select("q_id", "vec_id", "rn")
          .as[(Long, Long, Long)].collect()
      },
      k = 10, nProbe = 2)
    try {
      val (b1, b2) = qs.splitAt(2)
      stream.addData(b1: _*)
      q.processAllAvailable()
      assert(got.map(_._1).toSet == b1.map(_._1).toSet)
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // per-batch serving ≡ one batch probe of all queries: probing is
    // stateless, the store is the state
    val batch = ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    assert(got.sortBy(r => (r._1, r._3)).toSeq == batch && batch.nonEmpty)
  }

  test("build and append write ≤ filesPerList files per list, not one per upstream task") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffiles")
    // many upstream partitions: the un-routed failure mode would emit up
    // to (tasks × lists) files; the routed write is bounded per list
    VectorIndex.writeIvfIndex(emb.repartition(16).filter(col("vec_id") % 7 =!= 0),
      col("vec_id"), col("embedding"), path)
    def filesPerDir(): Map[String, Int] =
      new java.io.File(s"$path/lists").listFiles().toSeq
        .filter(_.getName.startsWith("c_id="))
        .map(d => d.getName -> d.listFiles()
          .count(f => f.getName.endsWith(".parquet"))).toMap
    val afterBuild = filesPerDir()
    assert(afterBuild.nonEmpty && afterBuild.values.max <= 1, afterBuild.toString)
    VectorIndex.appendToIvfIndex(emb.repartition(16).filter(col("vec_id") % 7 === 0),
      col("vec_id"), col("embedding"), path, filesPerList = 2)
    val afterAppend = filesPerDir()
    // a touched list gains at most filesPerList new files per batch
    assert(afterAppend.values.max <= 1 + 2, afterAppend.toString)
  }

  test("auto filesPerList sizes from the data: a tight byte target splits lists, the default does not") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    def filesPerDir(path: String): Map[String, Int] =
      new java.io.File(s"$path/lists").listFiles().toSeq
        .filter(_.getName.startsWith("c_id="))
        .map(d => d.getName -> d.listFiles()
          .count(f => f.getName.endsWith(".parquet"))).toMap
    // the sf0.001 corpus is a few hundred KB over ≤256 lists: a 256-byte
    // target forces ceil(listBytes/target) > 1 splits per list — the
    // build must choose >1 file on its own (filesPerList left at auto)
    val tight = tmpStore("ivfautotight")
    VectorIndex.writeIvfIndex(emb.repartition(16), col("vec_id"),
      col("embedding"), tight, targetFileBytes = 256L)
    val tightCounts = filesPerDir(tight)
    assert(tightCounts.nonEmpty && tightCounts.values.max > 1,
      s"auto sizing should split lists at a 256-byte target: $tightCounts")
    // ...and the file count stays bounded by the routed split, never
    // tasks × lists (16 upstream tasks would otherwise give up to 16)
    assert(tightCounts.values.max <= 4096)
    // the 128 MB default on the same corpus keeps one file per list (the
    // existing build test pins this too — this is the same-knob contrast)
    val loose = tmpStore("ivfautoloose")
    VectorIndex.writeIvfIndex(emb.repartition(16), col("vec_id"),
      col("embedding"), loose)
    assert(filesPerDir(loose).values.max <= 1)
  }

  test("auto route is mass-proportional on a skewed corpus: heavy list fans out, probes invariant") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    // a Zipf-shaped corpus on disk (real plan stats): 70% of rows carry
    // vector 7's values (one heavy list), the rest keep their own — ids
    // stay unique so routing and probes are well-defined
    val heavyVec = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).as[Array[Float]].head()
    val skewDir = tmpStore("skewcorpus").stripSuffix("/store")
    // spare vec_id % 10 == 0: the stride-picked centroids (% 50 == 0)
    // keep their own vectors, so the corpus still yields distinct lists
    emb.select(col("vec_id"),
        when(col("vec_id") % 10 >= 3, typedLit(heavyVec))
          .otherwise(col("embedding")).as("embedding"))
      .write.mode("overwrite").parquet(s"$skewDir/embeddings.parquet")
    val skew = spark.read.parquet(s"$skewDir/embeddings.parquet")
    def filesPerDir(path: String): Map[Long, Int] =
      new java.io.File(s"$path/lists").listFiles().toSeq
        .filter(_.getName.startsWith("c_id="))
        .map(d => d.getName.stripPrefix("c_id=").toLong -> d.listFiles()
          .count(f => f.getName.endsWith(".parquet"))).toMap
    // auto route at a tight byte target: the heavy list must get MORE
    // files than the light ones — the global-mean rule gave every list
    // the same count, sizing the heavy list's files at ~heavyShare ×
    // lists × target
    val path = tmpStore("ivfskew")
    VectorIndex.writeIvfIndex(skew.repartition(16), col("vec_id"),
      col("embedding"), path, hierarchical = false, targetFileBytes = 1024L)
    val counts = filesPerDir(path)
    val heavyList = spark.read.parquet(s"$path/lists")
      .groupBy(col("c_id").cast("long")).count()
      .orderBy(col("count").desc).as[(Long, Long)].head()._1
    assert(counts(heavyList) > 1,
      s"heavy list should split at a 1 KB target: $counts")
    assert(counts(heavyList) == counts.values.max &&
      counts.values.min < counts(heavyList),
      s"file counts should track list mass: $counts (heavy=$heavyList)")
    // layout is invisible to results: probe ≡ the same store built with
    // the single-file route
    val ref = tmpStore("ivfskewref")
    VectorIndex.writeIvfIndex(skew, col("vec_id"), col("embedding"), ref,
      hierarchical = false, filesPerList = 1)
    val skewQueries = skew.filter(col("vec_id") >= 8 && col("vec_id") < 13)
    val a = ranking(VectorIndex.probeIvfIndex(spark, path, skewQueries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    val b = ranking(VectorIndex.probeIvfIndex(spark, ref, skewQueries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    assert(a == b && a.nonEmpty)
  }

  test("append's auto route is also mass-proportional: a skewed increment fans its heavy list") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    // build on a light slice, then append a skewed bulk increment whose
    // rows concentrate on one vector — the backfill case where the r17
    // rule wrote the increment's heavy share into one straggler file
    val heavyVec = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).as[Array[Float]].head()
    val skewDir = tmpStore("skewinc").stripSuffix("/store")
    emb.select(col("vec_id"),
        when(col("vec_id") % 10 >= 3, typedLit(heavyVec))
          .otherwise(col("embedding")).as("embedding"))
      .write.mode("overwrite").parquet(s"$skewDir/embeddings.parquet")
    val skew = spark.read.parquet(s"$skewDir/embeddings.parquet")
    val path = tmpStore("ivfskewapp")
    VectorIndex.writeIvfIndex(skew.filter(col("vec_id") % 10 < 3),
      col("vec_id"), col("embedding"), path, hierarchical = false,
      targetFileBytes = 1024L)
    def filesPerDir(): Map[Long, Int] =
      new java.io.File(s"$path/lists").listFiles().toSeq
        .filter(_.getName.startsWith("c_id="))
        .map(d => d.getName.stripPrefix("c_id=").toLong -> d.listFiles()
          .count(f => f.getName.endsWith(".parquet"))).toMap
    val before = filesPerDir()
    VectorIndex.appendToIvfIndex(skew.filter(col("vec_id") % 10 >= 3),
      col("vec_id"), col("embedding"), path, targetFileBytes = 1024L)
    val after = filesPerDir()
    val heavyList = spark.read.parquet(s"$path/lists")
      .groupBy(col("c_id").cast("long")).count()
      .orderBy(col("count").desc).as[(Long, Long)].head()._1
    val gained = after.map { case (c, n) => c -> (n - before.getOrElse(c, 0)) }
    assert(gained(heavyList) > 1,
      s"heavy list should gain >1 file from the skewed increment: $gained")
    assert(gained(heavyList) == gained.values.max, s"gains: $gained")
    // the store still serves: appended rows all present
    assert(spark.read.parquet(s"$path/lists").count() == skew.count())
  }

  test("compaction also SPLITS an oversized file, and the rewrite right-sizes it") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    // force the failure the merge-only rule could never fix: every list
    // written as ONE file (explicit filesPerList = 1), then compact at a
    // target small enough that some single file is > 2× target
    val path = tmpStore("ivfsplit")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false, filesPerList = 1)
    val before = VectorIndex.listManifest(spark, path)
      .as[(Long, String, Long)].collect()
    assert(before.groupBy(_._1).values.forall(_.size == 1))
    val target = 1024L
    val oversized = before.filter(_._3 > 2L * target).map(_._1).toSet
    assert(oversized.nonEmpty, s"fixture too small: ${before.toSeq}")
    val probeBefore = ranking(VectorIndex.probeIvfIndex(spark, path,
      queries, col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    val plan = VectorIndex.compactIvfIndex(spark, path, targetBytes = target)
    val planned = plan.select(col("c_id").cast("long")).distinct()
      .as[Long].collect().toSet
    assert(oversized.subsetOf(planned),
      s"oversized lists $oversized not all planned ($planned)")
    val after = VectorIndex.listManifest(spark, path)
      .as[(Long, String, Long)].collect()
    // every oversized list was fanned out across more, smaller files
    for (c <- oversized) {
      val files = after.filter(_._1 == c)
      assert(files.size > 1, s"list $c still one file after split-compact")
      assert(files.map(_._3).max < before.find(_._1 == c).get._3,
        s"list $c max file did not shrink")
    }
    // rows and probe results are untouched by the rewrite
    assert(spark.read.parquet(s"$path/lists").count() == emb.count())
    val probeAfter = ranking(VectorIndex.probeIvfIndex(spark, path,
      queries, col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    assert(probeAfter == probeBefore && probeAfter.nonEmpty)
  }

  test("filtered probe: full k among matching rows, predicate pushed into the pruned scan") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffil")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      payload = Seq(col("label")))
    val filtered = VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2,
      where = Some(col("label") < 4))
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val got = ranking(filtered)
    assert(got.nonEmpty && got.forall(r => labels(r._2) < 4))
    // pre-filter semantics: filtering an UNCAPPED unfiltered probe of the
    // same store per query and re-ranking the survivors is the same
    // top-10 — the filter restricts candidates, it never costs a match
    val all = ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 1000000, nProbe = 2))
    val expected = all.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.sortBy(_._3).filter(r => labels(r._2) < 4).take(10)
        .zipWithIndex.map { case (r, i) => (q, r._2, (i + 1).toLong) }
    }.sortBy(r => (r._1, r._3))
    assert(got == expected)
    // the predicate reaches the store scan as a PUSHED parquet filter on
    // only the probed partitions — never a post-scan attribute join
    withoutAqe {
      val one = VectorIndex.probeIvfIndex(spark, path,
        emb.filter(col("vec_id") === 0), col("vec_id"), col("embedding"),
        k = 10, nProbe = 2, where = Some(col("label") < 4))
      one.write.mode("overwrite").format("noop").save()
      val scans = one.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("lists")) => s
      }
      assert(scans.nonEmpty)
      assert(scans.exists(_.metadata.get("PushedFilters")
          .exists(_.contains("LessThan(label,4)"))),
        scans.map(_.metadata.get("PushedFilters")).mkString("\n"))
      assert(scans.map(_.metrics("numPartitions").value).max <= 2)
    }
  }

  test("range probe: threshold replaces the rank; equals the uncapped probe filtered by cos, composes with where") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfrange")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      payload = Seq(col("label")))
    val t = 0.25
    val range = VectorIndex.probeIvfRange(spark, path, queries,
      col("vec_id"), col("embedding"), minCosine = t, nProbe = 2)
      .select("q_id", "vec_id", "cos_ud").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    // same candidates as an uncapped top-k probe of the same store,
    // cut by threshold instead of rank (the integer bar BOTH paths use)
    val viaTopK = VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 1000000, nProbe = 2)
      .filter(col("cos_ud") >= Similarity.cosineMicros2(t))
      .select("q_id", "vec_id", "cos_ud").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(range == viaTopK && range.nonEmpty)
    // the threshold replaces top-k's final per-query rank: the range plan
    // has no Window at all and strictly fewer exchanges than the top-k
    // probe of the same store (the query-ASSIGNMENT subplan's own
    // exchanges are shared by both)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val rangePlan = planOf(VectorIndex.probeIvfRange(spark, path, queries,
      col("vec_id"), col("embedding"), minCosine = t, nProbe = 2))
    val topkPlan = planOf(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2))
    def count(s: String, token: String) = s.sliding(token.length).count(_ == token)
    // the query-ASSIGNMENT's windows (partitioned by the query id) exist
    // in both plans; the per-query RESULT rank (partitioned by q_id) only
    // in top-k's
    assert(!rangePlan.contains("windowspecdefinition(q_id"), rangePlan)
    assert(topkPlan.contains("windowspecdefinition(q_id"), topkPlan)
    assert(count(rangePlan, "Exchange") < count(topkPlan, "Exchange"),
      s"range=${count(rangePlan, "Exchange")} topk=${count(topkPlan, "Exchange")}")
    // pre-filter composes: every survivor matches the payload predicate
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val filtered = VectorIndex.probeIvfRange(spark, path, queries,
      col("vec_id"), col("embedding"), minCosine = t, nProbe = 2,
      where = Some(col("label") < 4))
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(filtered.nonEmpty && filtered.forall(r => labels(r._2) < 4))
    assert(filtered.toSet == range.filter(r => labels(r._2) < 4)
      .map(r => (r._1, r._2)).toSet)
  }

  test("probeStream passes the filter through: streamed filtered serving ≡ the batch filtered probe") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    implicit val sqlCtx = spark.sqlContext
    val path = tmpStore("ivfservefil")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      payload = Seq(col("label")))
    val pred = Some(col("label") < 4)
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val stream = MemoryStream[(Long, Array[Float])]
    val q = VectorIndex.probeStream(
      stream.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), path,
      (res, _) => got.synchronized {
        got ++= res.select("q_id", "vec_id", "rn")
          .as[(Long, Long, Long)].collect()
      },
      k = 10, nProbe = 2, where = pred)
    try {
      stream.addData(qs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2, where = pred))
    assert(got.sortBy(r => (r._1, r._3)).toSeq == batch && batch.nonEmpty)
  }

  test("filtered PQ probe: pool holds MATCHING candidates; with a covering pool it equals the flat filtered probe") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffilpq")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      pq = true, payload = Seq(col("label")))
    val pred = Some(col("label") < 4)
    // pool ≥ any list's size ⇒ ADC ordering is immaterial and the exact
    // rescore ranks ALL matching candidates — must equal the flat
    // filtered probe over the same store
    val pq = ranking(VectorIndex.probeIvfPqIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2, pool = 1000000,
      where = pred))
    val flat = ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2, where = pred))
    assert(pq == flat && pq.nonEmpty)
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    assert(pq.forall(r => labels(r._2) < 4))
  }

  test("filtered-adaptive probe at full budget ≡ exact filtered top-k; stats/ persists the histogram") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffila")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false, payload = Seq(col("label")),
      statsCols = Seq("label"))
    assert(new java.io.File(s"$path/stats/label").exists())
    // massPpm = 1e6 covers every matching list → the probe must be the
    // exact cosine top-k among matching rows (the filtered ground truth)
    val got = ranking(VectorIndex.probeIvfIndexFiltered(spark, path,
      queries, col("vec_id"), col("embedding"), statsCol = "label",
      statsValues = Seq(3), k = 10, massPpm = 1000000L))
    val exact = ranking(Similarity.bruteForceTopK(
      emb.filter(col("label") === 3), queries, col("vec_id"),
      col("embedding"), k = 10))
    assert(got == exact && got.nonEmpty)
  }

  test("filtered-adaptive: the raw-mass budget misses an anti-correlated filter; the filtered mass restores it") {
    // the §18a finding as a permanent pin — two well-separated clusters,
    // the heavy one (40 rows, label 0) holding the query, the rare one
    // (10 rows, label 1) holding every matching row. Lists: stride-10
    // centroids give the heavy cluster 4 lists and the rare one 1, so a
    // raw-mass budget of 20% (10 rows) is exhausted by the query's own
    // first heavy list — the rare label's list is never probed, every
    // candidate dies on the scan predicate, and the filtered result is
    // EMPTY. The filtered mass runs the same gate over matching counts
    // (zero-match lists dropped outright), so the same 20% budget probes
    // the rare list first and returns the exact filtered top-k.
    val vecs = (0L until 50L).map { i =>
      val (base, lbl) = if (i < 40) (1.0f, 0) else (-1.0f, 1)
      (i, Array(base, 0.02f * (i % 10), 0.01f * (i % 7), 0.1f), lbl)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val path = tmpStore("ivfanti")
    VectorIndex.writeIvfIndex(df, col("vec_id"), col("embedding"), path,
      hierarchical = false, centroidStride = 10, payload = Seq(col("label")),
      statsCols = Seq("label"))
    val q = df.filter(col("vec_id") === 0) // deep inside the heavy cluster
    val raw = VectorIndex.probeIvfIndexAdaptive(spark, path, q,
      col("vec_id"), col("embedding"), k = 10, massPpm = 200000L,
      where = Some(col("label") === 1))
    assert(raw.isEmpty,
      "raw-mass budget unexpectedly reached the rare label's list — " +
        "the anti-correlated fixture no longer demonstrates the failure")
    val fil = ranking(VectorIndex.probeIvfIndexFiltered(spark, path, q,
      col("vec_id"), col("embedding"), statsCol = "label",
      statsValues = Seq(1), k = 10, massPpm = 200000L))
    val exact = ranking(Similarity.bruteForceTopK(
      df.filter(col("label") === 1), q, col("vec_id"), col("embedding"),
      k = 10))
    assert(fil == exact && fil.size == 10)
  }

  test("filtered-adaptive falls back to a stats recount when stats/ is absent; ensure heals the artifact") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffilb")
    // built WITHOUT statsCols — the probe recounts from the lists'
    // (c_id, label) columns and must decide identically
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false, payload = Seq(col("label")))
    assert(!new java.io.File(s"$path/stats/label").exists())
    val noStats = ranking(VectorIndex.probeIvfIndexFiltered(spark, path,
      queries, col("vec_id"), col("embedding"), statsCol = "label",
      statsValues = Seq(3), k = 10, massPpm = 300000L))
    // ensure on the servable store persists the missing histogram
    // without a rebuild; the probe then reads the artifact — same rows
    VectorIndex.ensureIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false, payload = Seq(col("label")),
      statsCols = Seq("label"))
    assert(new java.io.File(s"$path/stats/label").exists())
    val withStats = ranking(VectorIndex.probeIvfIndexFiltered(spark, path,
      queries, col("vec_id"), col("embedding"), statsCol = "label",
      statsValues = Seq(3), k = 10, massPpm = 300000L))
    assert(noStats == withStats && noStats.nonEmpty)
  }

  test("append refreshes stats/ — a label that exists only in the increment becomes probeable") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffilc")
    // base slice excludes label 9 entirely; the filtered probe must
    // fail LOUDLY (no matching rows), not return an empty result
    VectorIndex.writeIvfIndex(emb.filter(col("label") =!= 9),
      col("vec_id"), col("embedding"), path, hierarchical = false,
      payload = Seq(col("label")), statsCols = Seq("label"))
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.probeIvfIndexFiltered(spark, path, queries,
        col("vec_id"), col("embedding"), statsCol = "label",
        statsValues = Seq(9), k = 10, massPpm = 1000000L)
    }
    assert(ex.getMessage.contains("no stored rows match"))
    VectorIndex.appendToIvfIndex(emb.filter(col("label") === 9),
      col("vec_id"), col("embedding"), path)
    // stats/ recounted on append → the new label's masses drive the
    // budget and its rows are served
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val got = ranking(VectorIndex.probeIvfIndexFiltered(spark, path,
      queries, col("vec_id"), col("embedding"), statsCol = "label",
      statsValues = Seq(9), k = 10, massPpm = 1000000L))
    assert(got.nonEmpty && got.forall(r => labels(r._2) == 9))
  }

  test("filtered-adaptive loud failures: a non-payload stats column is rejected") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffild")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      hierarchical = false)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.probeIvfIndexFiltered(spark, path, queries,
        col("vec_id"), col("embedding"), statsCol = "label",
        statsValues = Seq(3), k = 10)
    }
    assert(ex.getMessage.contains("not a stored payload column"))
    // and statsCols on the build must name payload columns
    val ex2 = intercept[IllegalArgumentException] {
      VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"),
        tmpStore("ivffile"), hierarchical = false,
        statsCols = Seq("label"))
    }
    assert(ex2.getMessage.contains("statsCols must name payload columns"))
  }

  test("append carries the recorded payload columns; an increment missing one fails loudly") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivffilapp")
    VectorIndex.writeIvfIndex(emb.filter(col("vec_id") % 7 =!= 0),
      col("vec_id"), col("embedding"), path, payload = Seq(col("label")))
    VectorIndex.appendToIvfIndex(emb.filter(col("vec_id") % 7 === 0),
      col("vec_id"), col("embedding"), path)
    val lists = spark.read.parquet(s"$path/lists")
    assert(lists.columns.contains("label"))
    assert(lists.count() == emb.count())
    assert(lists.filter(col("label").isNull).count() == 0)
    // the filtered probe sees appended rows through the same predicate
    val got = ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"), k = 10, nProbe = 2,
      where = Some(col("label") < 4)))
    assert(got.nonEmpty)
    // increments must carry the build's payload schema — a missing
    // column is an analysis-time error, not rows a filtered probe
    // silently treats as predicate-false
    intercept[org.apache.spark.sql.AnalysisException] {
      VectorIndex.appendToIvfIndex(
        emb.filter(col("vec_id") % 7 === 0).drop("label"),
        col("vec_id"), col("embedding"), path)
    }
  }

  test("a store built under another assignment-semantics generation is rejected, not silently probed") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = tmpStore("ivfgen")
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path)
    // simulate a generation-1 store: its meta predates version-stamping
    // (the field is absent), so its lists were filed under rounded-cosine
    // semantics that today's probe assignment would disagree with
    val legacy = spark.read.parquet(s"$path/meta").drop("format_version")
      .collect()
    val schema = spark.read.parquet(s"$path/meta").drop("format_version").schema
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(legacy: _*)), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.probeIvfIndex(spark, path, queries,
        col("vec_id"), col("embedding"))
    }
    assert(e.getMessage.contains("generation"))
    // ensure = build-if-needed: an older-generation store is REBUILT
    // (probe/append fail, the serving gate refreshes)
    assert(!VectorIndex.isServable(spark, path))
    VectorIndex.ensureIvfIndex(emb, col("vec_id"), col("embedding"), path)
    assert(VectorIndex.isServable(spark, path))
    assert(ranking(VectorIndex.probeIvfIndex(spark, path, queries,
      col("vec_id"), col("embedding"))).nonEmpty)
  }

  test("loud failures: probing an incomplete store, PQ-probing a non-PQ store, appending to nothing") {
    val path = tmpStore("ivfbad")
    intercept[IllegalArgumentException] {
      VectorIndex.probeIvfIndex(spark, path, queries, col("vec_id"), col("embedding"))
    }
    intercept[IllegalArgumentException] {
      VectorIndex.appendToIvfIndex(queries, col("vec_id"), col("embedding"), path)
    }
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    // payload names may not collide with the store's own columns
    intercept[IllegalArgumentException] {
      VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
        payload = Seq(col("label").as("codes")))
    }
    VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"), path,
      pq = false)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.probeIvfPqIndex(spark, path, queries, col("vec_id"),
        col("embedding"))
    }
    assert(e.getMessage.contains("pq"))
  }
}
