package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

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
    * @param tieBreak   right-side column ordering ties at equal `ts`
    *                   (the minimum wins — negate a numeric column for
    *                   max-wins) — pass one whenever right timestamps
    *                   can repeat within a key, else the pick at a tie
    *                   is partition-order-dependent.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      tieBreak: Option[String] = None): DataFrame =
    asOfImpl(left, right, key, ts, rightCols, forward = false, None, tieBreak)

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
    val (l, r) = (normTs(left, ts), normTs(right, ts))
    require(l.schema(ts).dataType == TimestampType,
      "asOfNearest requires a timestamp ts column")
    val (tagged, tbCol) = taggedUnion(l, r, key, ts, rightCols, tieBreak)
    def w(forward: Boolean) =
      scanWindow(key, ts, tbCol, forward = forward, tieBreak.isDefined)
    val joined = tagged
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(w(forward = false)))
      .withColumn("__f", last(col("__payload"), ignoreNulls = true).over(w(forward = true)))
      .filter(col("__side") === 1)

    // gaps at MICROsecond precision — Spark timestamps (and the SQL
    // oracle's epoch_us) carry micros; a millis comparison would
    // truncate sub-ms differences and could pick the farther side
    val gapB = unix_micros(col(ts)) - unix_micros(col("__b.__rts"))
    val gapF = unix_micros(col("__f.__rts")) - unix_micros(col(ts))
    def tol(gap: org.apache.spark.sql.Column) =
      toleranceMs.map(t => gap <= t * 1000L).getOrElse(lit(true))
    val bOk = col("__b").isNotNull && tol(gapB)
    val fOk = col("__f").isNotNull && tol(gapF)
    val useB = bOk && (!fOk || gapB <= gapF) // exact tie -> backward
    val chosen = when(useB, col("__b")).when(fOk, col("__f"))
    rightCols.foldLeft(joined.withColumn("__asof", chosen)) { (d, c) =>
      d.withColumn(s"asof_$c", col(s"__asof.$c"))
    }.drop("__side", "__payload", "__b", "__f", "__asof", tbCol)
  }

  /** NTZ inputs are accepted and normalized to `TimestampType` up front
    * (session-zone interpretation — exact under a pinned UTC zone), so
    * user frames read from naive-timestamp parquet work without a
    * pre-cast; every downstream gap computation then sees one type.
    */
  private[graft] def normTs(df: DataFrame, ts: String): DataFrame =
    df.schema(ts).dataType match {
      case TimestampNTZType => df.withColumn(ts, col(ts).cast(TimestampType))
      case _ => df
    }

  /** Shared tagged-union prep for every as-of direction: left rows get
    * `__side=1` and a null payload; right rows collapse to (key, ts,
    * `__side=0`, payload struct carrying `__rts` + the carried columns,
    * optional tie-break), aligned to the left schema with nulls.
    */
  private def taggedUnion(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      tieBreak: Option[String]): (DataFrame, String) = {
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
    (l.unionByName(rAligned), tbCol)
  }

  /** Directional scan order: nearest-qualifying right row is the last
    * one seen before each left row; ties at equal ts resolve to the
    * MINIMUM tie-break (scanned descending, so the min is scanned last).
    */
  private def scanWindow(
      key: String, ts: String, tbCol: String,
      forward: Boolean, hasTieBreak: Boolean) =
    Window.partitionBy(col(key))
      .orderBy(((if (forward) col(ts).desc else col(ts).asc) +: col("__side") +:
        (if (hasTieBreak) Seq(col(tbCol).desc) else Nil)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def asOfImpl(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      forward: Boolean, toleranceMs: Option[Long], tieBreak: Option[String]): DataFrame = {
    val (l, r) = (normTs(left, ts), normTs(right, ts))
    // the right timestamp travels inside the payload so tolerance can be
    // evaluated after the window pass
    val (tagged, tbCol) = taggedUnion(l, r, key, ts, rightCols, tieBreak)
    val w = scanWindow(key, ts, tbCol, forward = forward, tieBreak.isDefined)
    val joined = tagged
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = toleranceMs match {
      case None => lit(true)
      case Some(tol) =>
        require(l.schema(ts).dataType == TimestampType,
          "toleranceMs requires a timestamp ts column")
        // micros, not millis: truncation would admit gaps up to 1 ms
        // past the bound that the SQL oracle (epoch_us) rejects
        val gap =
          if (forward) unix_micros(col(s"__asof.__rts")) - unix_micros(col(ts))
          else unix_micros(col(ts)) - unix_micros(col(s"__asof.__rts"))
        gap <= tol * 1000L
    }
    rightCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"asof_$c", when(withinTol, col(s"__asof.$c")))
    }.drop("__side", "__payload", "__asof", tbCol)
  }
}
