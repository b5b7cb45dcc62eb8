package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching via deletion neighborhoods — the
  * entity-resolution staple (near-identical names/codes/ids) expressed as
  * an equi-join instead of the N² nested loop a raw
  * `levenshtein(a,b) <= 1` predicate would plan.
  *
  * Signature scheme (edit distance ≤ 1): `sig(s) = {s} ∪ del1(s)` where
  * `del1` is every single-character deletion. Two strings within one
  * edit — equal, one substitution (delete at the same position), or one
  * insertion/deletion (the shorter string IS a deletion of the longer) —
  * always share a signature, so candidates come from ONE shuffle join on
  * the exploded signature key. Sharing a signature is necessary but not
  * sufficient ("ab"/"ba" share "a" at distance 2), so an exact
  * `levenshtein` residual — Spark's codegen'd built-in, identical
  * semantics in DuckDB — kills false positives after a distinct.
  *
  * Scale: |sig(s)| = len(s)+1, so the posting table is Σ len — linear —
  * and candidate counts track true near-miss density, not N². Hot
  * signatures (a shared prefix family) bound each bucket by the alphabet
  * size per deleted position.
  */
object FuzzyJoin {

  /** All (id_a < id_b) pairs whose strings are within edit distance 1.
    * Output: (id_a, id_b, s_a, s_b).
    */
  def selfJoin(df: DataFrame, id: Column, str: Column): DataFrame = {
    val sigs = df.select(id.as("fid"), str.as("fs"))
      .filter(col("fs").isNotNull)
      .select(col("fid"), col("fs"), explode(expr(
        // empty string: no deletions (sequence(1,0) would run DESCENDING)
        """CASE WHEN length(fs) = 0 THEN array(fs)
           ELSE array_distinct(concat(array(fs),
             transform(sequence(1, length(fs)),
               i -> concat(substring(fs, 1, i-1),
                           substring(fs, i+1, length(fs))))))
           END""")).as("sig"))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.fid") < col("b.fid"))
      .select(col("a.fid").as("id_a"), col("b.fid").as("id_b"),
        col("a.fs").as("s_a"), col("b.fs").as("s_b"))
      .distinct()
      .filter(levenshtein(col("s_a"), col("s_b")) <= 1)
  }
}
