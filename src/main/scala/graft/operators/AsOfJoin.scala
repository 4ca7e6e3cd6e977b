package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** As-of join (point-in-time lookup): for each left row, attach the
  * nearest right row with the same key — the most recent at-or-before
  * (backward, the default) or the earliest at-or-after (forward), with an
  * optional tolerance bound on the time gap.
  *
  * Spark has no built-in as-of join; the scalable composition is
  * union + ordered window (one shuffle on the key, linear in rows) rather
  * than a range join (quadratic within key) or a per-key loop:
  *
  *  1. tag both inputs and union them by name,
  *  2. window per key ordered by (ts, side) — right rows sort before left
  *     rows at equal timestamps so "at or equal" includes ties (the order
  *     is reversed for forward joins),
  *  3. `last(right_payload, ignoreNulls)` over an unbounded-preceding
  *     frame carries the nearest right payload onto each left row,
  *  4. keep only left rows; null out payloads outside the tolerance.
  */
object AsOfJoin {

  /** Backward as-of (most recent right row at-or-before left.ts).
    *
    * @param rightCols right columns carried onto left rows (emitted as
    *                   `asof_<name>`, null when no right row qualifies).
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String]): DataFrame =
    asOfImpl(left, right, key, ts, rightCols, forward = false, None, None)

  /** Forward as-of (earliest right row at-or-after left.ts).
    *
    * @param toleranceMs if set, right rows further than this many
    *                    milliseconds from left.ts yield null instead
    *                    (requires a timestamp `ts` column).
    * @param tieBreak    right-side column ordering ties at equal `ts`
    *                    (the minimum wins) — pass one whenever right
    *                    timestamps can repeat within a key, else the
    *                    pick at a tie is partition-order-dependent.
    */
  def asOfForward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      toleranceMs: Option[Long] = None, tieBreak: Option[String] = None): DataFrame =
    asOfImpl(left, right, key, ts, rightCols, forward = true, toleranceMs, tieBreak)

  /** Nearest as-of (pandas merge_asof direction='nearest'): the right
    * row with the minimum absolute time gap, backward winning exact
    * ties. One shuffle on the key, TWO sorts: the backward and forward
    * scans are windows over the same partitioning, so Catalyst plans a
    * single Exchange with two Sort+Window passes — not two shuffles.
    * Requires a timestamp `ts` column (the gap must be computable).
    */
  def asOfNearest(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      toleranceMs: Option[Long] = None, tieBreak: Option[String] = None): DataFrame = {
    require(left.schema(ts).dataType == TimestampType,
      "asOfNearest requires a timestamp ts column")
    val payload = struct((col(ts).as("__rts") +: rightCols.map(col)): _*)
    val payloadType = right.select(payload.as("__payload")).schema("__payload").dataType
    val tbCol = "__tb"
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
      .withColumn(tbCol, lit(null))
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), payload.as("__payload")) ++
        tieBreak.map(c => col(c).as(tbCol)): _*)
    val lCols = left.columns
    val rAligned = lCols.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select((lCols.toIndexedSeq.map(col) :+ col("__side") :+ col("__payload") :+
      (if (tieBreak.isDefined) col(tbCol) else lit(null).as(tbCol))): _*)

    def w(forward: Boolean) = Window.partitionBy(col(key))
      .orderBy(((if (forward) col(ts).desc else col(ts).asc) +: col("__side") +:
        tieBreak.map(_ => col(tbCol).desc).toSeq): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(rAligned)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(w(forward = false)))
      .withColumn("__f", last(col("__payload"), ignoreNulls = true).over(w(forward = true)))
      .filter(col("__side") === 1)

    val gapB = unix_millis(col(ts)) - unix_millis(col("__b.__rts"))
    val gapF = unix_millis(col("__f.__rts")) - unix_millis(col(ts))
    def tol(gap: org.apache.spark.sql.Column) =
      toleranceMs.map(t => gap <= t).getOrElse(lit(true))
    val bOk = col("__b").isNotNull && tol(gapB)
    val fOk = col("__f").isNotNull && tol(gapF)
    val useB = bOk && (!fOk || gapB <= gapF) // exact tie -> backward
    val chosen = when(useB, col("__b")).when(fOk, col("__f"))
    rightCols.foldLeft(joined.withColumn("__asof", chosen)) { (d, c) =>
      d.withColumn(s"asof_$c", col(s"__asof.$c"))
    }.drop("__side", "__payload", "__b", "__f", "__asof", tbCol)
  }

  private def asOfImpl(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      forward: Boolean, toleranceMs: Option[Long], tieBreak: Option[String]): DataFrame = {
    // carry the right timestamp inside the payload so tolerance can be
    // evaluated after the window pass
    val payload = struct((col(ts).as("__rts") +: rightCols.map(col)): _*)
    val payloadType = right.select(payload.as("__payload")).schema("__payload").dataType
    val tbCol = "__tb"
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
      .withColumn(tbCol, lit(null))
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), payload.as("__payload")) ++
        tieBreak.map(c => col(c).as(tbCol)): _*)
    val lCols = left.columns
    val rAligned = lCols.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select((lCols.toIndexedSeq.map(col) :+ col("__side") :+ col("__payload") :+
      (if (tieBreak.isDefined) col(tbCol) else lit(null).as(tbCol))): _*)

    // scan order: nearest-qualifying right row is the last one seen
    // before each left row. Ties at equal ts resolve to the MINIMUM
    // tieBreak (scanned descending, so the min is scanned last).
    val ord =
      (if (forward) col(ts).desc else col(ts).asc) +: col("__side") +:
        tieBreak.map(_ => col(tbCol).desc).toSeq
    val w = Window.partitionBy(col(key))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(rAligned)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = toleranceMs match {
      case None => lit(true)
      case Some(tol) =>
        require(left.schema(ts).dataType == TimestampType,
          "toleranceMs requires a timestamp ts column")
        val gap =
          if (forward) unix_millis(col(s"__asof.__rts")) - unix_millis(col(ts))
          else unix_millis(col(ts)) - unix_millis(col(s"__asof.__rts"))
        gap <= tol
    }
    rightCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"asof_$c", when(withinTol, col(s"__asof.$c")))
    }.drop("__side", "__payload", "__asof", tbCol)
  }
}
