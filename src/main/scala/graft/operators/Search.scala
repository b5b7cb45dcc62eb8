package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance search — exact-integer TF-IDF-shaped scoring over an
  * inverted posting list, the lexical complement to the embedding ANN tier
  * ([[Similarity]]): the "find the training docs about X" workhorse where
  * the query is words, not a vector.
  *
  * Score is pure integer arithmetic so every engine reproduces it bit-for-
  * bit (the oracle gate hash-compares): each query term contributes
  * `tf(doc, term) × (ppmScale div df(term))` — term frequency weighted by
  * an integer inverse document frequency. Rarer terms weigh more; a term
  * in every doc still carries `ppmScale div N ≥ 1` when N ≤ ppmScale.
  * Deliberately NOT float BM25: log/over-length normalization would hang
  * the correctness gate on cross-engine libm rounding. The ranking
  * behavior (rare-term dominance) is the same shape.
  *
  * Scale path: tokenize+explode is a narrow map; postings are filtered to
  * the query's terms BEFORE any shuffle, so the aggregation handles
  * |docs containing a query term| rows, not the corpus; document
  * frequency is a per-term window count over those same rows (skew
  * bounded: a term's partition is its posting list); top-k is
  * Spark's TakeOrderedAndProject (per-partition heaps, no global sort).
  * No state grows with corpus size except the posting slice itself.
  *
  * Extension operator — the reference has no text scoring of any kind
  * (its only string predicate is CONTAINS, reference: commands.py:109-147).
  */
object Search {

  /** Weight scale: df=1 terms score 1,000,000 per occurrence. */
  val PpmScale = 1000000L

  /** Top-k docs for a bag-of-words query.
    *
    * @param docs   corpus; one row per document
    * @param id     unique document id column
    * @param text   document text column
    * @param terms  query terms (matched against lowercased alnum tokens;
    *               callers pass lowercase)
    * @param k      result size
    * @return (doc_id, score) — matched docs ranked by
    *         (score desc, doc_id asc), ties deterministic
    */
  def keywordTopK(
      docs: DataFrame,
      id: Column,
      text: Column,
      terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "query needs at least one term")
    // df via a window over the tf rows (one row per matching doc×term, so
    // count(*) per term IS document frequency) — the tokenize+explode
    // pipeline is evaluated exactly once; a join against a separate df
    // aggregate would re-derive it per plan branch
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    docs
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("term"))
      .filter(col("term").isin(terms: _*)) // before the shuffle: posting slice only
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(sum(expr(s"tf * ($PpmScale div df)")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Batch retrieval: top-k docs for EVERY query in one pass over the
    * corpus — the production shape (N retrieval requests amortize one
    * posting-list build; running [[keywordTopK]] N times would re-scan
    * the corpus N times).
    *
    * tf/df are computed once on the union of all query terms (df stays
    * GLOBAL per term — a term shared by two queries weighs the same in
    * both), then the tiny query table broadcasts onto the postings and
    * each query ranks independently via a windowed row_number — per-query
    * partitions, no global sort.
    *
    * @param queries (query_id, term) rows; one row per query term
    * @return (query_id, doc_id, score, rank) with rank ≤ k per query,
    *         ties deterministic on ascending doc id
    */
  def keywordTopKBatch(
      docs: DataFrame,
      id: Column,
      text: Column,
      queries: DataFrame,
      k: Int): DataFrame = {
    val terms = queries.select(col("term")).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    docs
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi") // slice before any shuffle
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(w))
      .join(broadcast(queries.select(col("query_id"), col("term"))), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"tf * ($PpmScale div df)")).as("score"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Weight scale for one RRF rank contribution: rank 1 at the default
    * `rrfK` scores 1e9/61 ≈ 16.4M — integer division keeps every fused
    * score exact.
    */
  val RrfScale = 1000000000L

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked lists
    * — the standard hybrid-retrieval combiner: each list contributes
    * `RrfScale div (rrfK + rank)` per document, so agreement across
    * retrievers (lexical top-k ∩ vector top-k) dominates any single
    * list's raw score scale. No score normalization is needed, which is
    * the whole point: TF-IDF integers and cosine micros never meet — only
    * ranks do.
    *
    * Scale shape: each input is already a top-k' slice (k' rows per
    * retriever, NOT corpus-sized), so the union + one aggregation touch
    * `Σ k'` rows total and the final top-k is a TakeOrdered over that.
    * The expensive part of hybrid search is the retrievers themselves
    * ([[keywordTopK]], `Similarity.bruteForceTopK`/IVF) — fusion is free.
    *
    * @param rankings ranked lists, each with columns (`doc_id`, `rank`)
    *                 where rank is 1-based within that list
    * @param k        fused result size
    * @param rrfK     the RRF damping constant (60 in the paper)
    * @return (doc_id, n_lists, rrf_score) ranked by
    *         (rrf_score desc, doc_id asc), ties deterministic
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Long = 60L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranked list")
    require(rrfK >= 0L, s"rrfK must be non-negative, got $rrfK")
    rankings
      .map(_.select(col("doc_id"), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"$RrfScale div ($rrfK + rank)")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(k)
  }
}
