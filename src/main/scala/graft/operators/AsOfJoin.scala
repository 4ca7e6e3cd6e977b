package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, attach the most
  * recent right row with the same key and `right.ts <= left.ts`.
  *
  * Spark has no built-in as-of join; the scalable composition is
  * union + ordered window (one shuffle on the key, linear in rows) rather
  * than a range join (quadratic within key) or a per-key loop:
  *
  *  1. tag both inputs and union them by name,
  *  2. window per key ordered by (ts, side) — right rows sort before left
  *     rows at equal timestamps so "at or before" includes ties,
  *  3. `last(right_payload, ignoreNulls)` over an unbounded-preceding
  *     frame carries the latest right payload forward,
  *  4. keep only left rows.
  */
object AsOfJoin {

  /** @param rightCols right columns carried onto left rows (emitted as
    *                   `asof_<name>`, null when no right row precedes).
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload.as("__payload")).schema("__payload").dataType
    val l = left.withColumn("__side", lit(1)).withColumn("__payload", lit(null).cast(payloadType))
    val r = right.select(col(key), col(ts), lit(0).as("__side"), payload.as("__payload"))
    val lCols = left.columns
    val rAligned = lCols.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select((lCols.map(col) :+ col("__side") :+ col("__payload")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(rAligned)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    rightCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"asof_$c", col(s"__asof.$c"))
    }.drop("__side", "__payload", "__asof")
  }
}
