package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding subword vocabulary: train merge rules on the corpus,
  * encode documents with them — the tokenizer-construction step of a
  * training-data pipeline (the published word-level BPE algorithm:
  * iteratively merge the most frequent adjacent symbol pair).
  *
  * Scale shape: training never touches the corpus row-by-row after the
  * first pass — it iterates over the DISTINCT-WORD frequency table, which
  * is vocabulary-bounded (Heaps' law: millions of rows at web scale, not
  * trillions), persisted once. Each merge costs one pair-count
  * aggregation job over that table; the per-iteration driver state is the
  * merge list itself (the model artifact, like the k-means centroids).
  * Symbols are re-derived from the persisted table by applying all merges
  * so far in one map, so lineage depth stays 1 per job instead of the
  * 2^iters chain the first k-means cut hit (SURVEY §8.29).
  *
  * Encoding is a narrow distributed map with the merge list broadcast —
  * no shuffle, no driver involvement per row.
  *
  * Determinism: pair ranking breaks count ties by (left, right) symbol
  * order, and greedy merge application is left-to-right — identical
  * re-runs produce identical vocabularies and encodings.
  */
object Bpe {

  /** One learned merge rule: adjacent (left, right) becomes left+right. */
  final case class Merge(rank: Int, left: String, right: String)

  /** End-of-word sentinel symbol (never merges across word boundaries). */
  val EndOfWord = "</w>"

  /** Distinct-word frequency table — training's only corpus-wide pass. */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(text, "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: code points + [[EndOfWord]]. */
  private[operators] def symbols(word: String): Vector[String] =
    word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector :+ EndOfWord

  /** Greedy left-to-right application of the merge list, in rank order. */
  private[operators] def applyMerges(
      sym: Vector[String], merges: Seq[Merge]): Vector[String] = {
    var cur = sym
    merges.foreach { m =>
      if (cur.length > 1) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == m.left && cur(i + 1) == m.right) {
            out += m.left + m.right
            i += 2
          } else {
            out += cur(i)
            i += 1
          }
        }
        cur = out.result()
      }
    }
    cur
  }

  /** Train up to `numMerges` merge rules; stops early when the best
    * remaining pair's corpus frequency drops below `minPairCount` (a
    * merge seen once is noise, and stopping keeps the vocabulary from
    * absorbing whole rare words).
    */
  def train(
      docs: DataFrame,
      text: Column,
      numMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = wordFreq(docs, text).as[(String, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var done = false
      while (merges.length < numMerges && !done) {
        val applied = merges.toList
        val top = wf.flatMap { case (w, f) =>
            val s = applyMerges(symbols(w), applied)
            s.iterator.zip(s.iterator.drop(1)).map { case (a, b) => (a, b, f) }
          }.toDF("left", "right", "freq")
          .groupBy("left", "right").agg(sum("freq").as("n"))
          .orderBy(col("n").desc, col("left").asc, col("right").asc)
          .limit(1)
          .as[(String, String, Long)].collect()
        top.headOption match {
          case Some((l, r, n)) if n >= minPairCount =>
            merges += Merge(merges.length, l, r)
          case _ => done = true
        }
      }
      merges.toVector
    } finally { wf.unpersist(); () }
  }

  /** Encode each document with a trained merge list.
    * @return (doc_id, tokens, n_tokens)
    */
  def encode(
      docs: DataFrame,
      id: Column,
      text: Column,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toVector)
    // degenerate rows follow train()'s SQL semantics: a NULL text yields no
    // tokens (split(NULL) explodes to nothing there; empty token array here),
    // and a NULL id — unusable as a key — is dropped rather than crashing
    // the typed encoder
    docs.select(id.cast("long").as("_i"), coalesce(text, lit("")).as("_t"))
      .filter(col("_i").isNotNull)
      .as[(Long, String)]
      .map { case (i, t) =>
        val toks = t.split("\\s+").iterator.filter(_.nonEmpty)
          .flatMap(w => applyMerges(symbols(w), bc.value)).toArray
        (i, toks, toks.length.toLong)
      }.toDF("doc_id", "tokens", "n_tokens")
  }
}
