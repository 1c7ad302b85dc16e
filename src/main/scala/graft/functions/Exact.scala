package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine EXACT aggregation helpers — the oracle-parity
  * conventions of SURVEY.md §4, defined once. */
object Exact {

  /** Exact, order-independent sum of a money-like double column:
    * cast to DECIMAL(18,2) BEFORE the sum (exact integer arithmetic
    * under any partitioning / combine order), cast back to DOUBLE
    * after — the one definition every money aggregate in the library
    * uses (Relational/EventOps delegate; Export's manifests call it
    * directly). */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
}
