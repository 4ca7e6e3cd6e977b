package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: accelerates `l.v BETWEEN r.v - w AND r.v + w`
  * predicates.
  *
  * Spark plans a pure range predicate as broadcast-nested-loop (fine when
  * one side broadcasts) or cartesian (never fine). Bucketizing both sides
  * by `floor(v / w)` and replicating the right side to its adjacent
  * buckets turns the range condition into an equi-join on the bucket id —
  * a shuffled hash/sort-merge join that scales to big-big inputs — with
  * the exact predicate re-checked after the equi-match.
  *
  * Each qualifying (l, r) pair matches in exactly one bucket (the left
  * row's own bucket), so no dedup is needed.
  */
object RangeJoin {

  def bandJoin(
      left: DataFrame, right: DataFrame,
      leftVal: Column, rightVal: Column, width: Double): DataFrame = {
    val l = left.withColumn("__bucket", floor(leftVal / width))
    val r = right.withColumn("__rbucket", floor(rightVal / width))
      .withColumn("__bucket", explode(array(col("__rbucket") - 1, col("__rbucket"), col("__rbucket") + 1)))
      .drop("__rbucket")
    l.join(r, "__bucket")
      .filter(leftVal >= rightVal - width && leftVal <= rightVal + width)
      .drop("__bucket")
  }

  /** SQL table-valued surface, registered as `graft_range` (same
    * injection path as `graft_asof` — see
    * [[graft.plans.NativeAsOfJoin.sqlBuilder]]):
    *
    * {{{
    * SELECT * FROM graft_range('lineitem_v', 'part_v',
    *                           'l_extendedprice', 'p_retailprice', '10.0')
    * }}}
    *
    * Emits every (left, right) column pair with
    * `left_col BETWEEN right_col - w AND right_col + w`, planned as the
    * band-bucketed EQUI-join (never a broadcast-nested-loop or
    * cartesian). The two value columns must have distinct names — the
    * output carries both tables' columns side by side.
    */
  def sqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def lit(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_range", es)(i, what)
    if (es.size != 5)
      throw new IllegalArgumentException(
        "graft_range(left_table, right_table, left_col, right_col, width)")
    val spark = org.apache.spark.sql.SparkSession.active
    val left = spark.table(lit(0, "left table name"))
    val right = spark.table(lit(1, "right table name"))
    // a streaming LEFT composes fine as a stream-static inner join
    // (the bucket explode is stateless); a streaming RIGHT would
    // replicate an unbounded side — reject with the swap hint, the
    // graft_asof pattern
    if (right.isStreaming)
      throw new UnsupportedOperationException(
        "graft_range: the right table is a stream — the banded join " +
          "replicates the right side to adjacent buckets, which is " +
          "unbounded on a stream. Swap the sides (stream-static range " +
          "join keeps the STATIC side on the right)")
    val (lc, rc) = (lit(2, "left_col"), lit(3, "right_col"))
    require(lc != rc,
      s"graft_range: left_col and right_col must differ (both '$lc') — " +
        "alias one side before calling")
    val width = lit(4, "width").toDouble
    bandJoin(left, right, col(lc), col(rc), width).queryExecution.analyzed
  }
}
