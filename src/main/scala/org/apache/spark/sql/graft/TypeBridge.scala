package org.apache.spark.sql.graft

import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DoubleType, LongType, TypeCollection}

/** Bridge for the `private[sql]` abstract-type vocabulary, so graft's
  * native expressions can declare `inputTypes` (analyzer implicit casts:
  * float arrays widen to double, int arrays to long) from outside the
  * spark.sql package.
  */
object TypeBridge {
  /** `array<double>` as an expected input type. */
  val doubleArray: AbstractDataType = ArrayType(DoubleType)

  /** `array<long>` preferred, `array<double>` accepted — long first so
    * integral SQL input stays exact instead of silently widening.
    */
  val longOrDoubleArray: AbstractDataType =
    TypeCollection(ArrayType(LongType), ArrayType(DoubleType))
}
