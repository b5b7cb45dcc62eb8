package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE home of the keyed-decision hash convention shared by the
  * corpus-sampling operators ([[graft.operators.Corpus]]) and the KMV
  * sketch ([[KmvSketch]]): `(key mod 2^31) · mult + inc`, with the caller
  * reducing by its own modulus. Keeping a single implementation means the
  * overflow bound (2^31 · mult < 2^63) and the oracle-lockstep arithmetic
  * can only be changed in one place.
  */
object KeyedHash {

  /** Pre-multiplication reduction: 2^31. Caps every product at
    * ~2^31 · mult < 2^63 for mult < 2^32, at the price that keys congruent
    * mod 2^31 share a hash — inherent to any finite hash and irrelevant
    * below ~2.1 B keys per congruence class.
    */
  val IdMod = 2147483648L

  /** `(key mod 2^31) · mult + inc` — all floored (`pmod`) so NEGATIVE
    * keys hash into the same non-negative range as positive ones instead
    * of silently producing sign-carrying garbage. For the non-negative
    * ids the oracles run on, `pmod` coincides with plain `%`, so DuckDB
    * replays with ordinary modulo.
    */
  def idHash(key: Column, mult: Long, inc: Long = 0L): Column =
    pmod(key.cast("long"), lit(IdMod)) * mult + inc
}
