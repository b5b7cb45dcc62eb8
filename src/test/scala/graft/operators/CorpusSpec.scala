package graft.operators

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs: DataFrame = Seq.tabulate(60) { i =>
    (i.toLong, Seq.fill(5 + i % 20)(s"w$i token filler text").mkString(" "),
      if (i % 3 == 0) "en" else "de")
  }.toDF("doc_id", "text", "lang")

  test("leakproofSplit keeps every cluster member in one split and covers all docs") {
    // two clusters: {1,2,9} rep 1, {4,40} rep 4
    val clusters = Seq((1L, 1L), (2L, 1L), (9L, 1L), (4L, 4L), (40L, 4L))
      .toDF("doc_id", "cluster_rep")
    val out = Corpus.leakproofSplit(docs, col("doc_id"), clusters)
      .as[(Long, String)].collect().toMap
    assert(out.size == 60)
    assert(out.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(Set(out(1L), out(2L), out(9L)).size == 1, "cluster {1,2,9} split apart")
    assert(Set(out(4L), out(40L)).size == 1, "cluster {4,40} split apart")
    // clustered docs inherit the REP's bucket: doc 2 must land where doc 1's
    // own hash points, even if 2's own hash says otherwise
    val h1 = (1L * Corpus.SplitMult) % 1000L
    val expected = if (h1 < 800) "train" else if (h1 < 900) "val" else "test"
    assert(out(2L) == expected)
  }

  test("percentileGate keeps exactly the rows at or above the exact percentile") {
    val scored = Seq.tabulate(100)(i => (i.toLong, (i * 10).toLong))
      .toDF("id", "score")
    val kept = Corpus.percentileGate(scored, col("score"), 0.1)
      .select("id").as[Long].collect().toSet
    // scores 0..990 step 10: the exact 10th percentile of 100 values is
    // interpolated at 99*0.1 = index 9.9 → 99.0, so ids 10.. survive
    assert(kept == (10L until 100L).toSet)
    assert(Corpus.percentileGate(scored, col("score"), 0.0).count() == 100)
    // threshold column must not leak into the output schema
    assert(Corpus.percentileGate(scored, col("score"), 0.1).columns.toSeq
      == Seq("id", "score"))
  }

  test("stratifiedSample applies per-stratum rates, deterministically") {
    val rates = Map("en" -> 20)
    val out = Corpus.stratifiedSample(docs, col("doc_id"), col("lang"), rates, 50)
      .select("doc_id").as[Long].collect().toSet
    val expected = (0L until 60L).filter { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      val h = ((i % Corpus.IdMod) * Corpus.SampleMult + Corpus.SampleInc) % 4294967296L
      h * 100L < rates.getOrElse(lang, 50).toLong * 4294967296L
    }.toSet
    assert(out == expected)
    val again = Corpus.stratifiedSample(docs, col("doc_id"), col("lang"), rates, 50)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out, "hash sampling must be reproducible")
  }

  test("quotaSample caps each stratum at the hash-order prefix") {
    val out = Corpus.quotaSample(docs, col("doc_id"), col("lang"), cap = 15)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // en has 20 docs (capped to 15), de has 40 (capped to 15)
    assert(byLang("en").size == 15 && byLang("de").size == 15)
    // kept set = the cap-smallest by (quota hash, id) within each stratum
    def ord(i: Long) =
      ((i % Corpus.IdMod) * Corpus.QuotaMult + Corpus.QuotaInc) % 4294967296L
    val expectEn = (0L until 60L).filter(_ % 3 == 0)
      .sortBy(i => (ord(i), i)).take(15).toSet
    assert(byLang("en") == expectEn)
    // a cap above the stratum size keeps everything
    val all = Corpus.quotaSample(docs, col("doc_id"), col("lang"), cap = 100).count()
    assert(all == 60L)
  }

  test("weightedSample keeps the cap-best A-ES keys per stratum, weight-proportionally") {
    // weight = doc_id + 1 so weights are distinct and positive
    val weighted = docs.withColumn("w", col("doc_id") + 1L)
    val out = Corpus.weightedSample(weighted, col("doc_id"), col("lang"),
      col("w"), cap = 10)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang("en").size == 10 && byLang("de").size == 10)
    // exact replay: u from the Weight hash family, key = ln(u)/w desc, id tiebreak
    def key(i: Long): Double = {
      val u = ((((i % Corpus.IdMod) * Corpus.WeightMult + Corpus.WeightInc)
        % 4294967296L) + 1L).toDouble / 4294967296.0
      math.log(u) / (i + 1).toDouble
    }
    val expectEn = (0L until 60L).filter(_ % 3 == 0)
      .sortBy(i => (-key(i), i)).take(10).toSet
    assert(byLang("en") == expectEn)
    // a cap above the stratum size keeps everything
    assert(Corpus.weightedSample(weighted, col("doc_id"), col("lang"),
      col("w"), cap = 100).count() == 60L)
    // non-positive weights must raise, not silently sort last
    val bad = intercept[Exception] {
      Corpus.weightedSample(docs.withColumn("w", col("doc_id") - 30L),
        col("doc_id"), col("lang"), col("w"), cap = 10).count()
    }
    assert(bad.getMessage.contains("non-positive weight")
      || bad.getCause != null && bad.getCause.getMessage.contains("non-positive weight"))
  }

  test("weightedSample skews toward heavy rows but is not take-highest-weight") {
    // two weight classes in one stratum: ids 0-39 weight 1, ids 40-59 weight 50
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, "s", if (i < 40) 1L else 50L)).toDF("doc_id", "lang", "w")
    val kept = Corpus.weightedSample(rows, col("doc_id"), col("lang"),
      col("w"), cap = 20)
      .select("doc_id").as[Long].collect().toSet
    val heavy = kept.count(_ >= 40)
    // 20 heavy rows at 50× weight should dominate the 40 light rows, but a
    // hard take-by-weight would keep ALL 20 heavy and 0 light would be
    // possible only degenerately — require both properties
    assert(heavy >= 15, s"heavy rows underrepresented: $heavy of 20 kept")
    assert(kept.exists(_ < 40) || heavy == 20)
  }

  test("upsampleMix: exact copy counts, both directions, unlisted domain dropped") {
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, if (i < 30) "en" else if (i < 50) "de" else "es")).toDF("doc_id", "lang")
    val out = Corpus.upsampleMix(rows, col("doc_id"), col("lang"),
      Map("en" -> 2500000L, "de" -> 600000L))
      .select("doc_id", "dom", "copy").as[(Long, String, Long)].collect()
    // es absent from the recipe → dropped entirely
    assert(!out.exists(_._2 == "es"))
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    def extra(id: Long, frac: Long): Boolean =
      ((id % Corpus.IdMod) * Corpus.UpsampleMult + Corpus.UpsampleInc) % 1000000L < frac
    (0L until 30L).foreach { i => // en: 2 or 3 copies, contiguous 1..n
      val n = 2 + (if (extra(i, 500000L)) 1 else 0)
      assert(perDoc(i) == (1L to n.toLong), s"en doc $i: ${perDoc.get(i)}")
    }
    (30L until 50L).foreach { i => // de: 0 or 1 copies (downsample path)
      if (extra(i, 600000L)) assert(perDoc(i) == Seq(1L))
      else assert(!perDoc.contains(i))
    }
    // deterministic across runs
    val again = Corpus.upsampleMix(rows, col("doc_id"), col("lang"),
      Map("en" -> 2500000L, "de" -> 600000L))
      .select("doc_id", "dom", "copy").as[(Long, String, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
    intercept[IllegalArgumentException] {
      Corpus.upsampleMix(rows, col("doc_id"), col("lang"), Map.empty)
    }
  }

  test("targetMix realizes the requested shares at the max feasible size, never upsampling") {
    // en: 40 docs, de: 20 docs (ids 0..59, en = id%3==0 is 20... build explicitly)
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, if (i < 40) "en" else "de")).toDF("doc_id", "lang")
    // target 50/50: T = min(40/0.5, 20/0.5) = 40 → en rate 40*0.5/40 = 50%,
    // de rate 40*0.5/20 = 100%
    val out = Corpus.targetMix(rows, col("doc_id"), col("lang"),
      Map("en" -> 500000L, "de" -> 500000L))
      .select("doc_id", "lang", "rate_ppm").as[(Long, String, Long)].collect()
    val rates = out.map(r => r._2 -> r._3).toMap
    assert(rates == Map("en" -> 500000L, "de" -> 1000000L))
    // de kept whole (rate 1e6 keeps every hash), en hash-thinned
    assert(out.count(_._2 == "de") == 20)
    val keptEn = out.filter(_._2 == "en").map(_._1).toSet
    val expectEn = (0L until 40L).filter(i =>
      ((i % Corpus.IdMod) * Corpus.TargetMult + Corpus.TargetInc) % 1000000L < 500000L).toSet
    assert(keptEn == expectEn)
    // a domain outside the target drops entirely
    val dropped = Corpus.targetMix(rows, col("doc_id"), col("lang"),
      Map("en" -> 1000000L))
    assert(dropped.filter(col("lang") === "de").count() == 0)
    // invalid targets are rejected loudly
    intercept[IllegalArgumentException] {
      Corpus.targetMix(rows, col("doc_id"), col("lang"),
        Map("en" -> 900000L, "de" -> 200000L))
    }
    // a recipe domain with zero corpus rows caps T at 0: the largest size
    // honoring the recipe is empty — never a silently wrong mixture
    val infeasible = Corpus.targetMix(rows, col("doc_id"), col("lang"),
      Map("en" -> 700000L, "fr" -> 300000L))
    assert(infeasible.count() == 0)
  }

  test("dsirScores ranks target-like docs above off-target docs, exact integer sums") {
    // target exemplars speak "aaa bbb"; off-target docs speak "zzz yyy";
    // a mixed doc sits between
    val docs = Seq(
      (1L, "aaa bbb aaa bbb", true),
      (2L, "aaa bbb bbb aaa", true),
      (3L, "zzz yyy zzz yyy", false),
      (4L, "aaa zzz", false))
      .toDF("doc_id", "text", "is_tgt")
    val out = Corpus.dsirScores(docs, col("doc_id"), col("text"),
      col("is_tgt"), buckets = 64)
      .select("doc_id", "n_tokens", "dsir_micro_nats")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L)._1 == 4L && out(3L)._1 == 4L && out(4L)._1 == 2L)
    // docs 1 and 2 are permutations of the same tokens → identical scores
    assert(out(1L)._2 == out(2L)._2)
    // target-vocabulary docs outscore off-target; mixed lands in between
    assert(out(1L)._2 > out(4L)._2 && out(4L)._2 > out(3L)._2)
    // deterministic across runs (pure hash + integer arithmetic)
    val again = Corpus.dsirScores(docs, col("doc_id"), col("text"),
      col("is_tgt"), buckets = 64)
      .select("doc_id", "dsir_micro_nats").as[(Long, Long)].collect().toMap
    assert(again == out.map { case (k, v) => k -> v._2 })
    // empty-text docs produce no row; bad bucket count rejected loudly
    val withEmpty = docs.union(Seq((5L, "", false)).toDF("doc_id", "text", "is_tgt"))
    assert(Corpus.dsirScores(withEmpty, col("doc_id"), col("text"),
      col("is_tgt")).count() == 4)
    intercept[IllegalArgumentException] {
      Corpus.dsirScores(docs, col("doc_id"), col("text"), col("is_tgt"), buckets = 0)
    }
  }

  test("gumbelTopK samples ∝ exp(logWeight) in log space, deterministic, cap-exact") {
    // two strata of 30; within each, ids 0..9 carry +20 nats over the rest
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, if (i < 30) "a" else "b",
        if (i % 30 < 10) 20.0 else 0.0)).toDF("doc_id", "s", "lw")
    val out = Corpus.gumbelTopK(rows, col("doc_id"), col("lw"), k = 8,
      strata = col("s"))
      .select("doc_id", "s").as[(Long, String)].collect()
    assert(out.length == 16 && out.count(_._2 == "a") == 8)
    // +20 nats ≈ e^20 ≈ 5·10^8× likelier: heavy rows should dominate picks
    val heavy = out.count(r => r._1 % 30 < 10)
    assert(heavy >= 12, s"heavy rows underrepresented: $heavy of 16")
    // deterministic across runs
    val again = Corpus.gumbelTopK(rows, col("doc_id"), col("lw"), k = 8,
      strata = col("s")).select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
    // extreme log-weights where exp() would overflow/underflow still rank
    val extreme = Seq((1L, 50000.0), (2L, -50000.0), (3L, 0.0))
      .toDF("doc_id", "lw")
    val top = Corpus.gumbelTopK(extreme, col("doc_id"), col("lw"), k = 1)
      .select("doc_id").as[Long].collect()
    assert(top.toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      Corpus.gumbelTopK(rows, col("doc_id"), col("lw"), k = 0)
    }
  }

  test("snapshotDiff classifies added/removed/changed, null-safely on fingerprints") {
    val oldSnap = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("c")), (4L, None: Option[String]))
      .toDF("id", "fp")
    val newSnap = Seq(
      (2L, Some("b")),     // unchanged
      (3L, Some("c2")),    // changed
      (4L, Some("d")),     // changed: null → non-null must NOT read unchanged
      (5L, Some("e")))     // added;  1 is removed
      .toDF("id", "fp")
    val out = Corpus.snapshotDiff(oldSnap, newSnap, col("id"), col("fp"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
  }

  test("tokenRarity: exact integer-ppm commonness per document") {
    val tiny = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2 b=2 c=1, total 5 → freq_ppm a=400000 b=400000 c=200000
    val out = Corpus.tokenRarity(tiny, col("doc_id"), col("text"))
      .select("doc_id", "n_tokens", "mean_freq_ppm")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, 400000L)))            // (400000*3)/3
    assert(out(2L) == ((2L, 300000L)))            // (400000+200000)/2
    Corpus.unpersistIntermediates(blocking = true)
  }

  test("shardManifest partitions the corpus exactly once") {
    val m = Corpus.shardManifest(docs, col("doc_id"), col("text"), numShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(m.map(_._1).toSet.subsetOf((0L until 4L).toSet))
    assert(m.map(_._2).sum == 60L, "every doc in exactly one shard")
    val totalTokens = docs
      .select(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .as[Long].collect().sum
    assert(m.map(_._3).sum == totalTokens)
  }

  test("packTokens replays the greedy per-shard prefix scan exactly") {
    val budget = 40L
    val out = Corpus.packTokens(docs, col("doc_id"), col("text"), numShards = 4, budget)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 60)
    // re-simulate the greedy scan on the driver and require exact agreement
    val byShard = out.groupBy(_._1).map { case (sh, rows) =>
      sh -> rows.sortBy(_._2)
    }
    byShard.foreach { case (_, rows) =>
      var pack = 1L
      var used = rows.head._3
      assert(rows.head._4 == 1L, "first doc of a shard opens pack 1")
      rows.tail.foreach { case (_, _, tok, packId) =>
        if (used + tok <= budget) used += tok
        else { pack += 1L; used = tok }
        assert(packId == pack, s"greedy assignment diverged at $rows")
      }
    }
    // no pack exceeds the budget unless it is a single oversized doc
    byShard.values.flatten.groupBy(r => (r._1, r._4)).foreach { case (_, rows) =>
      val total = rows.map(_._3).sum
      assert(total <= budget || rows.size == 1,
        s"pack over budget with ${rows.size} docs: $total")
    }
  }

  test("packTokens gives an oversized doc its own pack without stalling the scan") {
    val d = Seq(
      (0L, "a b c"), // 3 tokens
      (4L, Seq.fill(50)("x").mkString(" ")), // 50 tokens > budget
      (8L, "d e f g")) // 4 tokens
      .toDF("doc_id", "text")
    // ShardMult * {0,4,8} are all ≡ 0 mod 4 → one shard, id order preserved
    val out = Corpus.packTokens(d, col("doc_id"), col("text"), numShards = 4, budget = 10L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(r => r._2 -> r._4).toSeq == Seq(0L -> 1L, 4L -> 2L, 8L -> 3L))
  }

  test("shardManifest describes exactly the files partitionBy(shard) writes (the shard-writer contract)") {
    val n = 4
    val outDir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    docs.withColumn("shard", Corpus.shardOf(col("doc_id"), n))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val back = spark.read.parquet(outDir)
    val manifest = Corpus.shardManifest(docs, col("doc_id"), col("text"), n)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val physical = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
      .as[(Long, Long, Long, Long)].collect()
    assert(physical.length == manifest.size)
    physical.foreach { case (sh, cnt, mn, mx) =>
      val (_, mDocs, _, mMin, mMax) = manifest(sh)
      assert(cnt == mDocs && mn == mMin && mx == mMax,
        s"manifest diverges from written shard $sh")
    }
  }

  test("stratifiedSample is a stateless filter — identical rows on a stream (batch/stream parity)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq.tabulate(40)(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
    val rates = Map("en" -> 30)
    val batch = Corpus.stratifiedSample(rows.toDF("doc_id", "lang"),
      col("doc_id"), col("lang"), rates, 60)
      .select("doc_id").as[Long].collect().toSet
    val stream = MemoryStream[(Long, String)]
    val q = Corpus.stratifiedSample(stream.toDF().toDF("doc_id", "lang"),
      col("doc_id"), col("lang"), rates, 60)
      .writeStream.format("memory").queryName("sampled").outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sampled").select("doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.size < rows.size)
    } finally q.stop()
  }

  test("contaminationPairs flags planted benchmark overlap, counts shared shingles") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      // shares shingles "alpha beta gamma", "beta gamma delta" → n_shared 2
      (1L, "alpha beta gamma delta nothing else here at all"),
      // shares exactly one shingle
      (2L, "unrelated words then alpha beta gamma"),
      (3L, "completely disjoint training document text with no overlap"))
      .toDF("doc_id", "text")
    val out = Corpus.contaminationPairs(train, bench, col("doc_id"), col("text"),
      n = 3, minShared = 1L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((100L, 1L)) == 2L)
    assert(out((100L, 2L)) == 1L)
    assert(!out.contains((100L, 3L)))
    val strict = Corpus.contaminationPairs(train, bench, col("doc_id"), col("text"),
      n = 3, minShared = 2L).as[(Long, Long, Long)].collect()
    assert(strict.map(r => (r._1, r._2)).toSet == Set((100L, 1L)))
  }

  test("corpus hashes survive multi-billion ids (ANSI overflow) and honor any integer rate") {
    // ids past 2^31: every hash pre-reduces mod 2^31, so no multiply can
    // overflow BIGINT (ANSI mode throws on overflow — this test would die)
    val big = Seq.tabulate(2000)(i => (4000000000L + i.toLong, "en"))
      .toDF("doc_id", "lang")
    // rate 37 is NOT a multiple of 5 — the old %100 hash (SampleMult shares
    // factor 5 with 100) silently rounded it up to 40%
    val kept = Corpus.stratifiedSample(big, col("doc_id"), col("lang"),
      Map("en" -> 37), 37).count()
    assert(math.abs(kept - 740L) < 80, s"rate 37% should keep ~740 of 2000, kept $kept")
    val noClusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_rep")
    assert(Corpus.leakproofSplit(big, col("doc_id"), noClusters).count() == 2000)
    assert(Corpus.shardManifest(big, col("doc_id"), col("lang"), 7)
      .agg(sum("n_docs")).as[Long].collect()(0) == 2000)
    assert(Corpus.temperatureMix(big, col("doc_id"), col("lang")).count() == 2000)
    val ranks = Corpus.epochOrder(big, col("doc_id"), epoch = 2)
      .agg(min("epoch_rank"), max("epoch_rank")).as[(Long, Long)].collect()(0)
    assert(ranks == (1L, 2000L))
    Corpus.unpersistIntermediates()
  }

  test("repetitionProfile: looped phrases score high, short/empty docs zero") {
    val d = Seq(
      (0L, "a b a b a b"), // bigrams [a b, b a, a b, b a, a b] → top 3 of 5
      (1L, "a b c d e"), // all-distinct bigrams → 1 of 4
      (2L, "word"), // no bigrams
      (3L, ""), // empty doc
      (4L, "x x y")) // distinct tokens 2 of 3
      .toDF("doc_id", "text")
    val out = Corpus.repetitionProfile(d, col("doc_id"), col("text"))
      .select("doc_id", "top_bigram_ppm", "distinct_token_ppm", "symbol_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 5, "every doc profiled, including bigram-less ones")
    assert(out(0L)._2 == 3L * 1000000L / 5L)
    assert(out(1L)._2 == 1000000L / 4L)
    assert(out(2L)._2 == 0L && out(3L)._2 == 0L)
    assert(out(4L)._3 == 2L * 1000000L / 3L)
    assert(out(3L)._3 == 0L && out(3L)._4 == 0L)
  }

  test("temperatureMix keeps the rarest domain whole and downsamples by sqrt(min/cnt)") {
    val out = Corpus.temperatureMix(docs, col("doc_id"), col("lang"))
      .select("doc_id", "lang", "rate_ppm").as[(Long, String, Long)].collect()
    // docs: 20 en (i%3==0), 40 de → rate(en)=1e6 (min domain), rate(de)=floor(sqrt(20/40)*1e6)
    val rates = out.map(r => r._2 -> r._3).toMap
    assert(rates("en") == 1000000L)
    assert(rates("de") == math.floor(math.sqrt(20.0 / 40.0) * 1000000.0).toLong)
    // membership replays the hash threshold exactly
    val expected = (0L until 60L).filter { i =>
      val rate = if (i % 3 == 0) 1000000L else rates("de")
      ((i % Corpus.IdMod) * Corpus.MixMult + Corpus.MixInc) % 1000000L < rate
    }.toSet
    assert(out.map(_._1).toSet == expected)
    // every en doc survives (rate 1e6 ≡ keep all)
    assert(out.count(_._2 == "en") == 20)
  }

  test("temperatureMix treats null domains as a domain (null-safe rate join)") {
    val d = Seq((0L, "en"), (1L, "en"), (2L, "en"), (3L, "en"), (4L, null))
      .toDF("doc_id", "lang")
    val out = Corpus.temperatureMix(d, col("doc_id"), col("lang"))
      .select("doc_id", "rate_ppm").as[(Long, Long)].collect().toMap
    // null is the rarest domain (1 doc) → rate 1e6, kept; en rate = sqrt(1/4)
    assert(out.contains(4L) && out(4L) == 1000000L)
    assert(out.filter(_._1 != 4L).values.forall(_ ==
      math.floor(math.sqrt(1.0 / 4.0) * 1000000.0).toLong))
  }

  test("epochOrder is a contiguous deterministic permutation that changes with the epoch") {
    val r3 = Corpus.epochOrder(docs, col("doc_id"), epoch = 3)
      .as[(Long, Long)].collect()
    assert(r3.map(_._1).toSet == (0L until 60L).toSet, "every doc ranked once")
    assert(r3.map(_._2).sorted.toSeq == (1L to 60L).toSeq, "ranks contiguous 1..N")
    // matches the single-window oracle ordering
    val expected = (0L until 60L)
      .sortBy(i => ((((i + 3L * Corpus.EpochStride) % Corpus.IdMod) * Corpus.SplitMult)
        % 4294967296L, i))
      .zipWithIndex.map { case (d, r) => d -> (r + 1L) }.toMap
    r3.foreach { case (d, r) => assert(r == expected(d), s"rank diverged for doc $d") }
    // reproducible; and a different epoch yields a different permutation
    val again = Corpus.epochOrder(docs, col("doc_id"), epoch = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3.toMap == again)
    val r4 = Corpus.epochOrder(docs, col("doc_id"), epoch = 4)
      .as[(Long, Long)].collect().toMap
    assert(r3.toMap != r4)
    assert(Corpus.unpersistIntermediates() >= 1, "epochOrder registers its sorted cache")
  }

  test("balancedOrder: proportional keys, hash-ordered within domain, partition-invariant") {
    val d = ((0L until 12L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "small")) :+ (200L, null: String))
      .toDF("doc_id", "dom")
    def run(p: Int) = Corpus.balancedOrder(d, col("doc_id"), col("dom"), partitions = p)
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val out = run(4)
    // the per-domain keys are exactly (0..n-1)·SCALE div n, assigned in
    // (hash, id) order — recompute by hand
    def expectKeys(ids: Seq[Long]): Map[Long, Long] = {
      val n = ids.size
      ids.sortBy(i => (((i % Corpus.IdMod) * Corpus.SplitMult) % 4294967296L, i))
        .zipWithIndex.map { case (id, k) => id -> k.toLong * Corpus.BalanceScale / n }
        .toMap
    }
    val big = expectKeys(0L until 12L)
    val small = expectKeys(100L until 103L)
    out.foreach {
      case (id, "big", key) => assert(key == big(id), s"doc $id")
      case (id, "small", key) => assert(key == small(id), s"doc $id")
      case (200L, nullDom, key) => assert(nullDom == null && key == 0L,
        "single null-domain doc sits at position 0 of its own domain")
      case other => fail(s"unexpected row $other")
    }
    // the offsets machinery must not depend on the partition count
    assert(run(1) == out && run(3) == out)
    assert(Corpus.unpersistIntermediates() >= 1)
  }

  test("writeShards: one sorted file per shard, all rows preserved") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toFile
    try {
      val packed = Corpus.packTokens(docs, col("doc_id"), col("text"),
        numShards = 4, budget = 64L)
      val expected = packed.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      Corpus.writeShards(packed, out.getAbsolutePath)
      val shardDirs = out.listFiles().filter(_.getName.startsWith("shard="))
      assert(shardDirs.length == 4, "one directory per shard")
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName}: exactly one data file, got ${files.length}")
        val rows = spark.read.parquet(files(0).getAbsolutePath)
          .select("pack_id", "doc_id").as[(Long, Long)].collect()
        assert(rows.sortBy(identity).toSeq == rows.toSeq,
          s"${d.getName}: rows must arrive (pack_id, doc_id)-sorted")
      }
      val back = spark.read.parquet(out.getAbsolutePath)
        .select("shard", "doc_id", "n_tokens", "pack_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(back == expected, "roundtrip preserves every packed row")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(out)
    }
  }

  test("chunkTokens boundaries: stride coverage, short docs, empty docs") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // 2 tokens <= overlap
      (3L, ""),                                       // empty → no chunks
      (4L, (1 to 8).map(i => s"x$i").mkString(" "))   // exactly chunkSize
    ).toDF("doc_id", "text")
    val out = Corpus.chunkTokens(d, col("doc_id"), col("text"),
      chunkSize = 8, overlap = 2)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    // doc 1: stride 6 → chunks [0,8) and [6,10)
    assert(out(1L).map(c => (c._3, c._4)).toSeq == Seq(
      ((1 to 8).map(i => s"w$i").mkString(" "), 8L),
      ((7 to 10).map(i => s"w$i").mkString(" "), 4L)))
    // overlap region w7..w8 appears in both chunks
    assert(out(1L)(0)._3.endsWith("w7 w8") && out(1L)(1)._3.startsWith("w7 w8"))
    assert(out(2L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0L, "a b", 2L)))
    assert(!out.contains(3L), "empty doc yields no chunks")
    assert(out(4L).map(c => (c._2, c._4)).toSeq == Seq((0L, 8L)),
      "doc of exactly chunkSize tokens yields one chunk, not a dangling tail")
    // reconstruction: dropping each chunk's leading overlap re-yields the doc
    val rebuilt = out(1L).zipWithIndex.map { case ((_, _, txt, _), i) =>
      if (i == 0) txt else txt.split(" ").drop(2).mkString(" ")
    }.mkString(" ")
    assert(rebuilt == (1 to 10).map(i => s"w$i").mkString(" "))
  }

  test("keepBest keeps the highest-scoring cluster member, ties to min id") {
    val d = Seq((1L, 10.0), (2L, 30.0), (3L, 30.0), (4L, 99.0))
      .toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_rep")
    val kept = Dedup.keepBest(d, col("doc_id"), clusters, col("score"))
      .select("doc_id").as[Long].collect().toSet
    // 2 and 3 tie on score → 2 wins on id; 4 is unclustered → kept
    assert(kept == Set(2L, 4L))
  }

  test("contrastiveTriplets: one triplet per pair, negative never an endpoint, deterministic") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (5L, 9L), (10L, 30L)).toDF("doc_a", "doc_b")
    val run1 = Corpus.contrastiveTriplets(docs, col("doc_id"), pairs, poolBuckets = 8)
      .select("anchor", "positive", "negative")
      .as[(Long, Long, Long)].collect().sorted
    val run2 = Corpus.contrastiveTriplets(docs, col("doc_id"), pairs, poolBuckets = 8)
      .select("anchor", "positive", "negative")
      .as[(Long, Long, Long)].collect().sorted
    assert(run1.toSeq == run2.toSeq)
    assert(run1.length == 3) // every pair finds a negative (8 non-empty buckets)
    run1.foreach { case (a, p, n) =>
      assert(n != a && n != p, s"negative $n collides with pair ($a, $p)")
      assert(docs.filter(col("doc_id") === n).count() == 1, "negative is a real doc")
    }
  }

  test("gopherRules: each rule kills its targeted document, a clean one survives") {
    val good = ("good " * 20) + Corpus.GopherStops.mkString(" ") // 28 words, all rules pass
    val docs = Seq(
      (0L, good),
      (1L, "too short"),                                    // n_words < 5
      (2L, ("x " * 30) + "the be"),                         // mwl_c < 200 (1-char words)
      (3L, good + " ####%%%%$$$$####%%%%$$$$####%%%%"),     // symbol_ppm
      (4L, (1 to 9).map(_ => "- bullet item the be").mkString("\n")), // bullets
      (5L, (1 to 9).map(_ =>
        "the be some rather longer trailing thought here...").mkString("\n")), // ellipsis
      (6L, ("12345 " * 25) + "the be"),                     // alpha_word_ppm < 0.8
      (7L, "word " * 30))                                   // no required stops
      .toDF("doc_id", "text")
    val out = Corpus.gopherRules(docs, col("doc_id"), col("text"),
      minWords = 5, maxWords = 100, minMwlC = 200, maxMwlC = 1000,
      maxSymbolPpm = 100000, maxBulletPpm = 500000, maxEllipsisPpm = 300000,
      minAlphaPpm = 800000, minRequiredStops = 2)
      .select("doc_id", "keep_flag").as[(Long, Long)].collect().toMap
    assert(out(0L) == 1L, "clean doc must pass every rule")
    (1L to 7L).foreach { i =>
      assert(out(i) == 0L, s"doc $i should die on its targeted rule")
    }
  }

  test("gopherRules: measured values are exact integers (the oracle contract)") {
    val docs = Seq((0L, "- the be to\nplain line\nanother one...")).toDF("doc_id", "text")
    val r = Corpus.gopherRules(docs, col("doc_id"), col("text")).collect().head
    // tokens: [the, be, to, plain, line, another, one] — lengths sum 26
    assert(r.getAs[Long]("n_words") == 7L)
    assert(r.getAs[Long]("mwl_c") == 371L)           // floor(26·100/7)
    assert(r.getAs[Long]("bullet_ppm") == 333333L)   // 1 of 3 lines
    assert(r.getAs[Long]("ellipsis_ppm") == 333333L) // 1 of 3 lines
    assert(r.getAs[Long]("req_stop_hits") == 3L)     // the, be, to
  }

  test("contrastiveTriplets: probe walks past a bucket whose representative is an endpoint") {
    // 3 docs → with 3 buckets every bucket rep is one of the corpus docs;
    // a pair covering two reps forces at least one probe collision, and
    // the walk must still land on the remaining doc
    val docs = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "text")
    val allPairs = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("doc_a", "doc_b")
    val out = Corpus.contrastiveTriplets(docs, col("doc_id"), allPairs, poolBuckets = 3)
      .select("anchor", "positive", "negative")
      .as[(Long, Long, Long)].collect()
    // only valid negative for each pair is the third doc — IF its bucket
    // is among the 3 probed (always true with poolBuckets = 3)
    out.foreach { case (a, p, n) => assert(n != a && n != p) }
    assert(out.length == 3, "each pair's walk reaches the one non-endpoint doc")
  }

  test("curriculumOrder: counted-threshold tiers, hash order within tier, direction flip") {
    // scores 10,20,30,40 with tiers=2: starts 0,1,2,3 of N=4 →
    // tier = start*2 div 4 + 1 → docs 1,2 tier 1; 3,4 tier 2
    val d = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "sc")
    val got = Corpus.curriculumOrder(d, col("id"), col("sc"), tiers = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2).toSeq ==
      Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
    // tier is the high 32 bits of the key: every tier-1 key < every tier-2 key
    val (t1, t2) = got.partition(_._2 == 1L)
    assert(t1.map(_._3).max < t2.map(_._3).min)
    // hard-first flips the tier component but keeps the tier LABELS
    val rev = Corpus.curriculumOrder(d, col("id"), col("sc"), tiers = 2,
      easyFirst = false).as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rev.map(r => r._1 -> r._2).toSeq == got.map(r => r._1 -> r._2).toSeq)
    val (r1, r2) = rev.partition(_._2 == 1L)
    assert(r2.map(_._3).max < r1.map(_._3).min, "hard tier consumes first")
    Corpus.unpersistIntermediates(blocking = true)
  }

  test("rendezvousShards: balanced assignment, minimal movement on reshard") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val s8 = Corpus.rendezvousShards(docs, col("doc_id"), numShards = 8)
      .as[(Long, Long)].collect().toMap
    // every shard populated, no shard dominates (rough balance)
    val byShard = s8.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.keySet == (0L until 8L).toSet)
    assert(byShard.values.max < 2 * byShard.values.min + 100,
      s"unbalanced: $byShard")
    // THE property: 8 → 9 shards moves ~1/9 of docs (mod-hash moves ~8/9)
    val s9 = Corpus.rendezvousShards(docs, col("doc_id"), numShards = 9)
      .as[(Long, Long)].collect().toMap
    val moved = s8.count { case (id, sh) => s9(id) != sh }
    assert(moved < 2000 / 4,
      s"rendezvous moved $moved of 2000 on 8→9 (expect ~222)")
    assert(s8.forall { case (id, sh) => s9(id) == sh || s9(id) == 8L },
      "a reshard move can only target the NEW shard")
    val modMoved = (0L until 2000L).count(id => id % 8 != id % 9)
    assert(moved < modMoved / 3, s"rendezvous $moved vs mod-hash $modMoved")
  }

  test("perplexityBuckets: CCNet head/middle/tail terciles with deterministic ties") {
    // 6 docs, perplexities 5,5,10,20,20,30 → starts 0,0,2,3,3,5 of N=6 →
    // bucket = start*3 div 6 + 1 → {5→1, 10→2, 20→2, 30→3}; both ties
    // land in ONE bucket (counted thresholds, no interpolation)
    val d = Seq((1L, 5L), (2L, 5L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 30L))
      .toDF("id", "px")
    val got = Corpus.perplexityBuckets(d, col("id"), col("px"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._3, r._4)).toSeq == Seq(
      (1L, 1L, "head"), (2L, 1L, "head"), (3L, 2L, "middle"),
      (4L, 2L, "middle"), (5L, 2L, "middle"), (6L, 3L, "tail")))
    assert(got.forall(r => r._2 == Map(1L -> 5L, 2L -> 5L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 30L)(r._1)), "score carried through")
    // non-tercile bucket counts fall back to positional labels
    val b2 = Corpus.perplexityBuckets(d, col("id"), col("px"), buckets = 2)
      .select("bucket_label").distinct().as[String].collect().toSet
    assert(b2 == Set("b1", "b2"))
    Corpus.unpersistIntermediates(blocking = true)
  }

  test("packedSpans: spans tile each pack exactly — contiguous, 0-based, gap-free") {
    val d = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a b c d"), (4L, "a"), (5L, "a b c d e"))
      .toDF("id", "txt")
    val rows = Corpus.packedSpans(d, col("id"), col("txt"),
      numShards = 1, budget = 5L)
      .select("pack_id", "doc_id", "n_tokens", "start_tok", "end_tok")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    rows.values.foreach { pack =>
      assert(pack.head._4 == 0L, "first span starts at 0")
      pack.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4, "spans are contiguous")
        case _ => ()
      }
      pack.foreach { r => assert(r._5 - r._4 == r._3, "span width = token count") }
    }
    // same pack assignment as packTokens (the composition contract)
    val packs = Corpus.packTokens(d, col("id"), col("txt"), 1, 5L)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    rows.values.flatten.foreach { r => assert(packs(r._2) == r._1) }
  }

  test("lengthBucketBatches: length-sorted batches collapse pad waste") {
    // one shard so the batching is fully visible; lengths 1..5 at batch 2
    val d = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"), (5L, "a b c d e"))
      .toDF("id", "txt")
    val got = Corpus.lengthBucketBatches(d, col("id"), col("txt"),
      numShards = 1, batchSize = 2)
      .select("doc_id", "n_tokens", "pos", "batch_idx", "batch_max_tokens", "pad_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // sorted batching: {1,2},{3,4},{5} → total pad 2
    assert(got.map(r => (r._1, r._4, r._6)).toSeq == Seq(
      (1L, 0L, 1L), (2L, 0L, 0L), (3L, 1L, 1L), (4L, 1L, 0L), (5L, 2L, 0L)))
    assert(got.map(_._6).sum == 2L)
    // id-ordered batching of the same docs would pad strictly more when
    // lengths arrive shuffled — the operator's reason to exist
    val shuffled = Seq(
      (1L, "a b c d e"), (2L, "a"), (3L, "a b c d"), (4L, "a b"), (5L, "a b c"))
      .toDF("id", "txt")
    val sortedPad = Corpus.lengthBucketBatches(shuffled, col("id"), col("txt"), 1, 2)
      .agg(sum("pad_tokens")).as[Long].collect().head
    assert(sortedPad == 2L, "pad waste depends on lengths, not id order")
  }

  test("blocklistFilter: per-category counts, ppm threshold, strict mode, empty text") {
    val d = Seq(
      (1L, "clean words only here"),
      (2L, "bad word once in twenty tokens a b c d e f g h i j k l m n"),
      (3L, "bad bad bad bad"),
      (4L, "")).toDF("id", "txt")
    val cats = Map("x" -> Seq("bad"), "y" -> Seq("word"))
    val got = Corpus.blocklistFilter(d, col("id"), col("txt"), cats,
      maxHitsPpm = 150000L)
      .select("doc_id", "n_tokens", "hits_x", "hits_y", "hits_total", "hits_ppm", "keep")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 4L, 0L, 0L, 0L, 0L, true)))
    // doc 2: 20 tokens, 1 "bad" + 1 "word" → 100000 ppm ≤ 150000 → keep
    assert(got(1) == ((2L, 20L, 1L, 1L, 2L, 100000L, true)))
    // doc 3: 4/4 listed → 1e6 ppm → dropped
    assert(got(2) == ((3L, 4L, 4L, 0L, 4L, 1000000L, false)))
    // empty text: zero tokens is not a hit
    assert(got(3) == ((4L, 0L, 0L, 0L, 0L, 0L, true)))
    // strict C4 mode: ANY hit drops
    val strict = Corpus.blocklistFilter(d, col("id"), col("txt"), cats, 0L)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(strict == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }
}
