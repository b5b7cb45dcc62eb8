package graft.operators

import graft.functions.TextFunctions._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines, each expressed
  * as a declarative DataFrame plan so Catalyst/AQE own the physical
  * strategy (map-side partial aggregation, broadcast of small sides, skew
  * handling).
  *
  * Scale design (the point at 100 TB):
  *  - every near-dup variant goes through an **inverted index + shuffle
  *    join on the bucket key** — never an O(N²) cross product and never a
  *    driver-side collect;
  *  - candidate pair counts are bounded by bucket sizes, so the classic
  *    mitigations compose: raise bands (MinHash), widen the hamming bands
  *    (SimHash), or cap document frequency (n-gram) — knobs exposed here;
  *  - output pair sets are deterministic, so the driver's DuckDB oracle can
  *    recompute them exactly at sf0.01.
  */
object Dedup {

  /** Exact dedup: one representative (minimum id) per distinct value of
    * `key`. A single hash aggregation — Spark plans partial aggregation
    * before the shuffle, which is the scalable exact-dedup shape.
    */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles → self-join on shingle (equi-shuffle, no
    * cross product) → per-pair intersection counts → Jaccard ≥ `minJaccard`.
    *
    * `maxDocFreq` drops shingles occurring in more than that many documents
    * (stop-shingles are pure join skew: a shingle shared by f docs yields
    * f² candidate rows while contributing ~nothing to similarity). Pass
    * Int.MaxValue for exact semantics (the oracle uses exact).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      id: Column,
      text: Column,
      n: Int = 3,
      minJaccard: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val sh = docs
      .select(id.as("doc_id"), explode(shingles(tokens(text), n)).as("s"))
    val filtered =
      if (maxDocFreq == Int.MaxValue) sh
      else {
        val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq).select("s")
        sh.join(freq, "s")
      }
    val counts = filtered.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = filtered.as("a")
      .join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("ca.n_sh") + col("cb.n_sh") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash + LSH near-dup pairs: k-hash signature per doc → `bands` bands
    * of k/bands rows → shuffle-join docs sharing any band → verify
    * candidates with exact n-gram Jaccard. The band join touches only
    * colliding docs, so the cost tracks true-duplicate density instead of
    * N² — the standard web-scale dedup shape (the verify join stays small
    * because candidates are rare).
    */
  def minhashLshPairs(
      docs: DataFrame,
      id: Column,
      text: Column,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val base = docs.select(id.as("doc_id"), text.as("text"))
      .withColumn("sh", shingles(tokens(col("text")), n))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // one row per (doc, band): band b = signature[b*rows, (b+1)*rows)
    val banded = base.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), slice(col("sig"), b * rows + 1, lit(rows)).as("bsig"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard on the shingle sets
    val shs = base.select(col("doc_id"), col("sh"))
    candidates
      .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
          size(array_union(col("sa.sh"), col("sb.sh"))), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 32-bit SimHash per document: each token votes ±1 on every bit position
    * of its polynomial hash; bit j of the fingerprint is 1 iff the vote sum
    * is positive. Computed in one explode + one aggregation (token count
    * shuffles once on doc id — linear, no skew beyond document length).
    */
  def simhash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(tokens(text)).as("t"))
      .withColumn("h", polyHash(col("t")))
    val bitSums = (0 until 32).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"b$j")
    }
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`. The
    * fingerprint is cut into `maxHamming + 1` byte-bands; by pigeonhole any
    * pair within the distance budget agrees on at least one whole band, so
    * the band equi-join loses NOTHING — this is exact, not approximate,
    * while still avoiding the N² comparison (the oracle brute-forces the
    * same answer with bit_count(xor)).
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    val width = 32 / bands
    val fp = simhash(docs, id, text)
    // one row per (doc, band); shiftright takes a literal shift, so bands
    // are generated as a unionByName of per-band projections
    val bandRows = (0 until bands).map { b =>
      fp.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit((1L << width) - 1)).as("bsig"))
    }.reduce(_ unionByName _)
    bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact embedding near-dup pairs: cosine ≥ `minCosine` over a blocked
    * self-join. Quadratic by nature (it is the *baseline*; the LSH variant
    * in [[Similarity]] is the scale path) but expressed as a single Spark
    * join so it distributes across executors instead of looping on the
    * driver.
    */
  def embeddingNearDupPairs(
      emb: DataFrame,
      id: Column,
      vec: Column,
      minCosine: Double = 0.4): DataFrame = {
    val e = emb.select(id.as("vec_id"), vec.as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(Similarity.cosine(col("a.v"), col("b.v")), 6).as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
