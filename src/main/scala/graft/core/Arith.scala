package graft.core

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions.lit

/** Shared integer-arithmetic column helpers. */
object Arith {

  /** Integer (long) division — Column `/` is DOUBLE division, exact only
    * below 2⁵³; this stays in LongType end-to-end (SQL `div` semantics:
    * truncation toward zero).
    */
  def longDiv(a: Column, b: Long): Column =
    GraftShim.column(IntegralDivide(
      GraftShim.expression(a.cast("long")), GraftShim.expression(lit(b))))
}
