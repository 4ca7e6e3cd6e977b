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
}
