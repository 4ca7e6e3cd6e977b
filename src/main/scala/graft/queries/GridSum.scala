package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Exact-grid float summation, shared by every query whose oracle must
  * bit-match a cross-row sum of doubles: quantize each term to a 1e9
  * integer grid (`floor(x * 1e9 + 0.5)` — floor+offset, NOT round, so
  * both engines apply the identical half-rule), sum exactly as BIGINT
  * (order-free under partial aggregation), descale once. Per-row
  * sequential folds don't need this; any sum whose addend order Spark
  * may permute does.
  *
  * The Scala and SQL grid constants live HERE, side by side — change
  * one, change both (a desynced pair breaks every oracle bit-match
  * that uses it).
  */
private[graft] object GridSum {
  val Grid = 1e9 // == the 1.0e9 literals in gridSumSql

  def exactGridSum(term: Column): Column =
    sum(floor(term * lit(Grid) + lit(0.5)).cast(LongType))

  def fromGrid(gridSum: Column): Column =
    gridSum.cast(DoubleType) / lit(Grid)

  def gridSumSql(termSql: String): String =
    s"CAST(sum(CAST(floor(($termSql) * 1.0e9 + 0.5e0) AS BIGINT)) AS DOUBLE) / 1.0e9"
}
