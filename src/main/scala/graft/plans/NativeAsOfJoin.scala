package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, BindReferences, BoundReference, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator as-of join: a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` (the brief's extension tier (c)), registered through
  * `SparkSessionExtensions` next to the expression kernels and rewrite
  * rules.
  *
  * WHY a physical operator when `operators/AsOfJoin.scala` already
  * composes the same semantics from union + ordered window: the window
  * composition is the right LOGICAL shape (one exchange, linear scan),
  * but `WindowExec` MATERIALIZES each key group — every (key) partition
  * group is buffered into an `ExternalAppendOnlyUnsafeRowArray` before
  * the frame is evaluated, spilling past a threshold. At 100 TB a skewed
  * key (one user with 10^8 events) buffers 10^8 rows per group. This
  * exec instead streams BOTH sorted children with O(1) state per group —
  * one held right row plus the current best match — so per-group memory
  * is constant no matter how hot the key. Same exchange count, same
  * sort, strictly less memory; measured faster on skewed inputs
  * (AsOfBench) and bit-identical on every input (NativeAsOfJoinSpec
  * cross-checks against the composed operator and the DuckDB oracle
  * through q_asof_native).
  *
  * Semantics (mirrors `AsOfJoin.asOf`/`asOfForward`/`asOfNearest`): for
  * each left row, attach the payload of the nearest right row with the
  * same key at or before (backward) / at or after (forward) / on either
  * side minimizing the absolute gap with backward winning exact ties
  * (nearest), null when none qualifies or the gap exceeds `toleranceUs`.
  * Ties at equal right timestamps resolve to the MINIMUM tie-break value
  * when `tieBreak` is set (otherwise partition-order-dependent, same
  * caveat as the composed operator). Null keys and null timestamps never
  * match (SQL equi-join semantics).
  *
  * The nearest merge stays O(1) state per key group: it holds the
  * previous-qualifying right (the backward candidate) while the
  * unconsumed head IS the forward candidate, then picks the smaller gap
  * (backward on exact gap ties — the composed `asOfNearest` / pandas
  * merge_asof rule).
  */
/** Physical-strategy request for the native as-of tier. `Auto` (the
  * default) picks broadcast-vs-merge from logical-plan statistics at
  * PLANNING time — the same `sizeInBytes`-under-
  * `spark.sql.autoBroadcastJoinThreshold` rule Spark's own
  * `JoinSelection` applies to equi joins — so a dimension-sized
  * timeline gets the zero-fact-shuffle broadcast exec and a fact-sized
  * one gets the O(1)-state merge, without the caller having to assert
  * the size (a wrong assertion at 100 TB is an executor OOM). `Merge`
  * and `Broadcast` are caller overrides that pin the physical exec
  * regardless of stats (Broadcast keeps the same contract as
  * `broadcast()` hash joins: the caller asserts the side fits).
  */
sealed trait AsOfPhysicalStrategy
object AsOfPhysicalStrategy {
  case object Auto extends AsOfPhysicalStrategy
  case object Merge extends AsOfPhysicalStrategy
  case object Broadcast extends AsOfPhysicalStrategy
}

object NativeAsOfJoin {

  /** Build the as-of join DataFrame. `toleranceMs` requires a timestamp
    * `ts` column; payload columns are emitted as `asof_<name>`.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      forward: Boolean = false,
      toleranceMs: Option[Long] = None,
      tieBreak: Option[String] = None,
      nearest: Boolean = false,
      strategy: AsOfPhysicalStrategy = AsOfPhysicalStrategy.Auto): DataFrame =
    asOfKeys(left, right, Seq(key), ts, rightCols, forward, toleranceMs,
      tieBreak, nearest, strategy)

  /** Nearest-direction as-of through the native exec (pandas merge_asof
    * direction='nearest'): min |gap|, backward winning exact ties.
    */
  def asOfNearest(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      toleranceMs: Option[Long] = None,
      tieBreak: Option[String] = None,
      strategy: AsOfPhysicalStrategy = AsOfPhysicalStrategy.Auto): DataFrame =
    asOfKeys(left, right, Seq(key), ts, rightCols, forward = false,
      toleranceMs, tieBreak, nearest = true, strategy)

  /** Broadcast form: the right timeline is DIMENSION-sized (a rates
    * table, a slowly-changing config, a feature snapshot), so instead
    * of shuffling + sorting the 100 TB fact side to meet a merge, the
    * right is broadcast and indexed per key (sorted timestamp array),
    * and every left partition binary-searches it MAP-SIDE: the fact
    * side needs NO exchange and NO sort — the plan's only movement is
    * one BroadcastExchange of the small side. Same semantics as the
    * merge exec for every direction (equal-ts groups collapse to the
    * min-tie-break row at index build, which is exactly the
    * backward/forward/nearest tie rule). The caller asserts the size
    * contract, as with `broadcast()` hash joins.
    */
  def asOfBroadcast(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String, rightCols: Seq[String],
      forward: Boolean = false,
      toleranceMs: Option[Long] = None,
      tieBreak: Option[String] = None,
      nearest: Boolean = false): DataFrame =
    asOfKeys(left, right, keys, ts, rightCols, forward, toleranceMs,
      tieBreak, nearest, AsOfPhysicalStrategy.Broadcast)

  /** Composite-key form (pandas merge_asof's multi-column `by`): the
    * grouped as-of over e.g. (user, device). Same null semantics — a
    * null in ANY key component never matches.
    */
  def asOfKeys(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String, rightCols: Seq[String],
      forward: Boolean = false,
      toleranceMs: Option[Long] = None,
      tieBreak: Option[String] = None,
      nearest: Boolean = false,
      strategy: AsOfPhysicalStrategy = AsOfPhysicalStrategy.Auto): DataFrame =
    org.apache.spark.sql.GraftSqlBridge.ofRows(left.sparkSession,
      buildPlan(left, right, keys, ts, rightCols, forward, toleranceMs,
        tieBreak, nearest, strategy))

  /** Shared plan construction: the DataFrame entry points wrap this in
    * `Dataset.ofRows`; the SQL table-valued function (`graft_asof`)
    * returns the node directly into the analyzer.
    */
  private def buildPlan(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String, rightCols: Seq[String],
      forward: Boolean, toleranceMs: Option[Long], tieBreak: Option[String],
      nearest: Boolean, strategy: AsOfPhysicalStrategy): AsOfJoinPlan = {
    require(keys.nonEmpty, "at least one key column required")
    require(!(forward && nearest), "forward and nearest are exclusive")
    val lp = graft.operators.AsOfJoin.normTs(left, ts).queryExecution.analyzed
    val rp0 = graft.operators.AsOfJoin.normTs(right, ts).queryExecution.analyzed

    // Self-join hygiene: when both sides derive from the same scan the
    // children share exprIds, which would make every seam reference
    // ambiguous. Re-key the right side through a RENAMING projection —
    // the changed name keeps RemoveRedundantAliases from collapsing it
    // back to the shared attributes (it only strips same-name aliases).
    val rp: LogicalPlan =
      if (lp.outputSet.intersect(rp0.outputSet).nonEmpty)
        Project(rp0.output.map(a => Alias(a, a.name + "__r")()), rp0)
      else rp0

    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(a => a.name == n || a.name == n + "__r").getOrElse(
        throw new IllegalArgumentException(s"$side column '$n' not found"))

    val lKeys = keys.map(attr(lp, _, "left"))
    val rKeys = keys.map(attr(rp, _, "right"))
    val (lTs, rTs) = (attr(lp, ts, "left"), attr(rp, ts, "right"))
    lKeys.zip(rKeys).foreach { case (a, b) =>
      require(a.dataType == b.dataType, s"key types must match: ${a.name}") }
    require(lTs.dataType == rTs.dataType, "ts types must match")
    require(lTs.dataType == TimestampType || lTs.dataType == LongType,
      s"ts must be timestamp or long, got ${lTs.dataType}")
    require(toleranceMs.isEmpty || lTs.dataType == TimestampType,
      "toleranceMs requires a timestamp ts column")
    val payload = rightCols.map(attr(rp, _, "right"))
    val outAttrs = payload.map { a =>
      AttributeReference("asof_" + a.name.stripSuffix("__r"),
        a.dataType, nullable = true)()
    }
    AsOfJoinPlan(lp, rp, lKeys, rKeys, lTs, rTs, payload, outAttrs,
      forward, toleranceMs.map(_ * 1000L), tieBreak.map(attr(rp, _, "right")),
      nearest, strategy)
  }

  /** SQL table-valued surface, registered as `graft_asof` (via
    * `SparkSessionExtensions.injectTableFunction` and the imperative
    * `tableFunctionRegistry` twin):
    *
    * {{{
    * SELECT * FROM graft_asof(
    *   'left_table', 'right_table',   -- catalog/temp-view names
    *   'k1,k2', 'ts', 'p1,p2',        -- keys, ts column, payload cols
    *   'backward',                    -- or 'forward' | 'nearest'
    *   '',                            -- tolerance ms ('' = none)
    *   'tie_col',                     -- tie-break column ('' = none)
    *   'auto')                        -- or 'merge' | 'broadcast'
    * }}}
    *
    * Trailing arguments are optional. Table names resolve through the
    * ACTIVE session's catalog at analysis time (temp views included),
    * so `spark.sql` users reach all three physical strategies without
    * touching the DataFrame API.
    */
  def sqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): LogicalPlan = {
    def lit(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_asof", es)(i, what)
    if (es.size < 5 || es.size > 9)
      throw new IllegalArgumentException(
        "graft_asof(left, right, keys, ts, payload[, direction[, " +
          "tolerance_ms[, tie_break[, strategy]]]])")
    val spark = SparkSession.active
    val left = spark.table(lit(0, "left table name"))
    val right = spark.table(lit(1, "right table name"))
    val keys = lit(2, "keys").split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val ts = lit(3, "ts")
    val payload = lit(4, "payload").split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val (forward, nearest) =
      (if (es.size > 5) lit(5, "direction") else "backward") match {
        case "" | "backward" => (false, false)
        case "forward" => (true, false)
        case "nearest" => (false, true)
        case d => throw new IllegalArgumentException(
          s"graft_asof: direction must be backward|forward|nearest, got '$d'")
      }
    val tol = if (es.size > 6) Some(lit(6, "tolerance_ms")).filter(_.nonEmpty)
      .map(_.toLong) else None
    val tieBreak = if (es.size > 7) Some(lit(7, "tie_break")).filter(_.nonEmpty)
      else None
    val strategy = (if (es.size > 8) lit(8, "strategy") else "auto") match {
      case "" | "auto" => AsOfPhysicalStrategy.Auto
      case "merge" => AsOfPhysicalStrategy.Merge
      case "broadcast" => AsOfPhysicalStrategy.Broadcast
      case s => throw new IllegalArgumentException(
        s"graft_asof: strategy must be auto|merge|broadcast, got '$s'")
    }
    buildPlan(left, right, keys, ts, payload, forward, tol, tieBreak,
      nearest, strategy)
  }
}

/** Resolved-from-birth logical node; `outAttrs` are the freshly minted
  * payload outputs (declared produced so the analyzer does not look for
  * them in the children).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], outAttrs: Seq[Attribute],
    forward: Boolean, toleranceUs: Option[Long], tieBreak: Option[Attribute],
    nearest: Boolean = false,
    strategy: AsOfPhysicalStrategy = AsOfPhysicalStrategy.Auto)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical node onto one of the two physical execs.
  *
  * Strategy resolution: a caller override (`Merge` / `Broadcast`) is
  * honored verbatim; `Auto` broadcasts when the RIGHT child's estimated
  * `sizeInBytes` fits under `spark.sql.autoBroadcastJoinThreshold` —
  * byte-for-byte the rule Spark's `JoinSelection.canBroadcastBySize`
  * applies, consuming the same logical-plan statistics (file-index
  * sizes for scans, ANALYZE/CBO stats where present). Threshold <= 0
  * (the `-1` disable convention) always picks the merge, and unknown
  * stats default to `defaultSizeInBytes` = Long.MaxValue, which also
  * falls through to the merge — the safe side: the merge works at any
  * right size; the broadcast OOMs past executor memory.
  *
  * RUNTIME RE-PLAN (the DynamicJoinSelection analog, by construction):
  * under AQE, every stage completion re-optimizes the remaining logical
  * plan — whose materialized children are LogicalQueryStages with
  * ACCURATE runtime stats — and re-runs the session strategies,
  * including this one. So an Auto pick made on stale or absent stats
  * (e.g. an RDD-backed right side at Long.MaxValue) self-corrects: the
  * static plan is the safe merge, and once the right exchange
  * materializes under the threshold the re-plan lands the broadcast
  * exec over the already-shuffled stage (measured 2.73s -> 1.55s on
  * AsOfBench's 16M/200k arm; direct broadcast 0.58s is the ceiling —
  * the flip still pays the two shuffles the static plan requested).
  * Genuinely large rights re-pick the merge every round. Pinned in
  * NativeAsOfJoinSpec "AQE flips a stale-stats Auto merge".
  */
object AsOfJoinStrategy extends SparkStrategy {
  private def broadcastPick(p: AsOfJoinPlan): Boolean = p.strategy match {
    case _ if p.right.isStreaming =>
      // symmetric planning-time check (checked FIRST so stream-stream
      // also lands here): a streaming RIGHT side can serve NEITHER exec —
      // the merge needs a sorted streaming child (a stateful sort
      // Structured Streaming does not provide) and the broadcast would
      // wrap a BroadcastExchange around an unbounded stream. Fail here
      // with the real reason instead of deep inside EnsureRequirements.
      throw new UnsupportedOperationException(
        "as-of join: the right (timeline) side is a stream — no physical " +
          "strategy supports it. Swap the sides (stream-static as-of " +
          "broadcasts the STATIC right), or join two streams with " +
          "StreamingOps.asOfEnrichStreamKeys")
    case _ if p.left.isStreaming =>
      // the merge exec is not streamable (it requires a clustered +
      // sorted STREAMING child — a stateful sort Structured Streaming
      // does not provide); the broadcast exec is stateless per
      // micro-batch and is the as-of's stream-static form. Auto and
      // Broadcast both resolve to it; an explicit Merge request fails
      // HERE with the real reason instead of deep inside
      // EnsureRequirements with a sort-on-stream error.
      require(p.strategy != AsOfPhysicalStrategy.Merge,
        "as-of strategy Merge is not streamable: a streaming left side " +
          "plans the stream-static broadcast exec (the right side must " +
          "be dimension-sized) — use Auto/Broadcast, or join two " +
          "streams with StreamingOps.asOfEnrichStreamKeys")
      true
    case AsOfPhysicalStrategy.Broadcast => true
    case AsOfPhysicalStrategy.Merge => false
    case AsOfPhysicalStrategy.Auto =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      threshold > 0 && p.right.stats.sizeInBytes <= threshold
  }
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan if broadcastPick(p) =>
      BroadcastAsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.payload, p.outAttrs, p.forward, p.toleranceUs, p.tieBreak,
        p.nearest, planLater(p.left), planLater(p.right)) :: Nil
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.payload,
        p.outAttrs, p.forward, p.toleranceUs, p.tieBreak, p.nearest,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join: both children arrive clustered on the key
  * (EnsureRequirements co-partitions them exactly as it does for a
  * sort-merge join) and sorted by (key, ts[, tieBreak]); the merge holds
  * ONE right row plus the current best match — constant memory per key
  * group, however skewed.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], outAttrs: Seq[Attribute],
    forward: Boolean, toleranceUs: Option[Long], tieBreak: Option[Attribute],
    nearest: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Tie groups (equal right ts) are ordered so the LAST consumed row is
  // the minimum tie-break for backward scans and the FIRST reached row
  // is the minimum for forward scans — the merge then needs no
  // tie-group buffering at all. Nearest uses the FORWARD (ascending)
  // tie order for both of its candidates: the head-side candidate is
  // first-reached as in forward, and the backward candidate keeps the
  // FIRST row of each new-timestamp group instead of the last.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++ (SortOrder(rightTs, Ascending) +:
      tieBreak.map(tb => SortOrder(tb,
        if (forward || nearest) Ascending else Descending)).toSeq))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val keyOrds: Array[Ordering[Any]] = leftKeys.map(a =>
      TypeUtils.getInterpretedOrdering(a.dataType).asInstanceOf[Ordering[Any]]).toArray
    val nKeys = leftKeys.size
    val lKeyB = leftKeys.map(a => BindReferences.bindReference(
      a.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], lOut)).toArray
    val rKeyB = rightKeys.map(a => BindReferences.bindReference(
      a.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rOut)).toArray
    val lTsB = BindReferences.bindReference(leftTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], lOut)
    val rTsB = BindReferences.bindReference(rightTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rOut)
    val fwd = forward
    val near = nearest
    val tolUs = toleranceUs
    // BindReferences takes nullability from the INPUT attribute, so a
    // null-padded right row cannot be projected through the matched-path
    // projection (non-nullable payload attrs would read garbage instead
    // of null) — unmatched rows get their own null-literal projection.
    val matchedExprs = lOut ++ payload
    val unmatchedExprs = lOut ++ payload.map(a =>
      org.apache.spark.sql.catalyst.expressions.Literal.create(null, a.dataType))
    val inSchema = lOut ++ rOut
    val rOutSize = rOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joinMatched = UnsafeProjection.create(matchedExprs, inSchema)
      val joinNull = UnsafeProjection.create(unmatchedExprs, lOut)
      val joined = new JoinedRow

      // composite-key helpers: lexicographic compare with null-first
      // semantics (matching the required NULLS FIRST sort order), so the
      // monotone advance stays correct when a right row carries a null
      // key component; a MATCH additionally requires a fully non-null
      // left vector (checked once per left row — right vectors with any
      // null then compare strictly below it and are dropped by the
      // advance loop before any equality test can see them)
      def evalKeysInto(binds: Array[org.apache.spark.sql.catalyst.expressions.Expression],
          row: InternalRow, out: Array[Any]): Array[Any] = {
        var i = 0
        while (i < nKeys) { out(i) = binds(i).eval(row); i += 1 }
        out
      }
      def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
        var i = 0
        while (i < nKeys) {
          val x = a(i); val y = b(i)
          val c =
            if (x == null && y == null) 0
            else if (x == null) -1
            else if (y == null) 1
            else keyOrds(i).compare(x, y)
          if (c != 0) return c
          i += 1
        }
        0
      }
      def anyNull(a: Array[Any]): Boolean = {
        var i = 0
        while (i < nKeys) { if (a(i) == null) return true; i += 1 }
        false
      }

      new Iterator[InternalRow] {
        // rHead: the next unconsumed right row (valid until the next
        // rIter.next()); best: the nearest-so-far right row for the
        // backward scan, held in OUR OWN reused buffer (bestBuf) —
        // sort/spill iterators reuse their row's backing bytes, so both
        // the retained row AND any object key derived from it (e.g. a
        // UTF8String pointing into the buffer) must be rooted in memory
        // we control. copyFrom grows the buffer in place: zero per-row
        // allocation on the hot consume loop.
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private val bestBuf = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rOutSize)
        bestBuf.pointTo(new Array[Byte](64), 64)
        private var best: InternalRow = null
        // three REUSED key-vector scratch arrays (left, right head,
        // retained best) — refilled in place so the merge allocates
        // nothing per row; eval's boxing of primitives is unavoidable
        // (and predates the composite generalization)
        private val kBuf = new Array[Any](nKeys)
        private val rkBuf = new Array[Any](nKeys)
        private val bestKeyBuf = new Array[Any](nKeys)
        private var bestKey: Array[Any] = null
        // nearest mode tracks the retained best's timestamp so the
        // first-of-new-ts-group retain test and the gap compare both
        // run without re-evaluating rTsB against the buffer
        private var bestTsV: Long = 0L

        // retain rHead as the new best: buffer-copy for UnsafeRow (the
        // universal case under sort), allocate-copy otherwise; the key
        // is re-evaluated AGAINST THE RETAINED COPY so it can never
        // alias the iterator's reused bytes
        private def retainBest(): Unit = {
          rHead match {
            case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
              bestBuf.copyFrom(u); best = bestBuf
            case o => best = o.copy()
          }
          bestKey = evalKeysInto(rKeyB, best, bestKeyBuf)
        }

        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = evalKeysInto(lKeyB, l, kBuf)
          val t = lTsB.eval(l)
          var m: InternalRow = null
          if (!anyNull(k) && t != null) {
            val tv = t.asInstanceOf[Long]
            if (near) {
              // nearest: the merge keeps BOTH candidates at once — the
              // retained best (highest qualifying at-or-before ts; the
              // tie-break sorts ASCENDING here, so the FIRST row of each
              // new-ts group is the group's minimum and later tie rows
              // must NOT replace it) and the unconsumed head (the
              // earliest strictly-after row, first-reached = min
              // tie-break, exactly the forward rule). Same O(1) state.
              var rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
              while (rHead != null && cmpKeys(rk, k) < 0) {
                advanceRight()
                rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
              }
              var rt = if (rHead == null) null else rTsB.eval(rHead)
              while (rHead != null && cmpKeys(rk, k) == 0 && rt == null) {
                advanceRight()
                rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
                rt = if (rHead == null) null else rTsB.eval(rHead)
              }
              while (rHead != null && cmpKeys(rk, k) == 0 &&
                  rt != null && rt.asInstanceOf[Long] <= tv) {
                val rtv = rt.asInstanceOf[Long]
                if (best == null || bestKey == null ||
                    cmpKeys(bestKey, rk) != 0 || rtv > bestTsV) {
                  retainBest(); bestTsV = rtv
                }
                advanceRight()
                rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
                rt = if (rHead == null) null else rTsB.eval(rHead)
              }
              // gaps SATURATE on overflow: a LongType ts timeline can
              // span more than half the Long range, where tv - candidate
              // wraps negative and the FAR candidate would win the
              // nearest compare; the true gap is >= 0 by construction
              // (backward candidate <= tv <= forward candidate), so a
              // negative difference can only mean overflow -> MaxValue
              val bCand = best != null && bestKey != null && cmpKeys(bestKey, k) == 0
              val gapB = if (bCand) {
                val g = tv - bestTsV; if (g < 0) Long.MaxValue else g
              } else 0L
              val bOk = bCand && tolUs.forall(gapB <= _)
              // after the consume loop the head (same key) is strictly
              // after tv with a non-null ts (nulls sort first in the
              // group and were skipped above)
              val fCand = rHead != null && cmpKeys(rk, k) == 0
              val gapF = if (fCand) {
                val g = rt.asInstanceOf[Long] - tv; if (g < 0) Long.MaxValue else g
              } else 0L
              val fOk = fCand && tolUs.forall(gapF <= _)
              // exact |gap| tie -> backward (composed asOfNearest /
              // pandas merge_asof rule)
              if (bOk && (!fOk || gapB <= gapF)) m = best
              else if (fOk) m = rHead
            } else if (!fwd) {
              // drop right rows whose key vector sorts before k (null
              // components sort first and compare strictly below the
              // non-null left vector, so they can never match)
              var rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
              while (rHead != null && cmpKeys(rk, k) < 0) {
                advanceRight()
                rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
              }
              // null-ts rows sort first within the key group and never
              // match — skip them so they cannot stall the scan
              var rt = if (rHead == null) null else rTsB.eval(rHead)
              while (rHead != null && cmpKeys(rk, k) == 0 && rt == null) {
                advanceRight()
                rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
                rt = if (rHead == null) null else rTsB.eval(rHead)
              }
              // consume qualifying rows (key == k, ts <= t); the last
              // consumed is the nearest (and min tie-break on ties)
              while (rHead != null && cmpKeys(rk, k) == 0 &&
                  rt != null && rt.asInstanceOf[Long] <= tv) {
                retainBest()
                advanceRight()
                rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
                rt = if (rHead == null) null else rTsB.eval(rHead)
              }
              if (best != null && bestKey != null && cmpKeys(bestKey, k) == 0) {
                // same saturate-on-overflow rule as the nearest path: the
                // true gap is >= 0 by construction (best's ts <= tv), so a
                // negative difference can only be Long wraparound on a
                // LongType timeline spanning more than half the Long range
                // -> treat as MaxValue so the tolerance check rejects it
                val g = tv - rTsB.eval(best).asInstanceOf[Long]
                val gap = if (g < 0) Long.MaxValue else g
                if (tolUs.forall(gap <= _)) m = best
              }
            } else {
              // forward: skip right rows strictly before (k, t); the
              // head is then the earliest at-or-after candidate (one
              // lexicographic compare per iteration, hoisted)
              var rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
              var rt = if (rHead == null) null else rTsB.eval(rHead)
              var c = if (rHead == null) 1 else cmpKeys(rk, k)
              while (rHead != null && (c < 0 ||
                  (c == 0 && (rt == null || rt.asInstanceOf[Long] < tv)))) {
                advanceRight()
                rk = if (rHead == null) null else evalKeysInto(rKeyB, rHead, rkBuf)
                rt = if (rHead == null) null else rTsB.eval(rHead)
                c = if (rHead == null) 1 else cmpKeys(rk, k)
              }
              if (rHead != null && c == 0) {
                // saturate on overflow (head's ts >= tv, so negative =>
                // wraparound), mirroring the backward/nearest paths
                val g = rt.asInstanceOf[Long] - tv
                val gap = if (g < 0) Long.MaxValue else g
                if (tolUs.forall(gap <= _)) m = rHead
              }
            }
          }
          numOut += 1
          if (m != null) { numMatched += 1; joinMatched(joined(l, m)) }
          else joinNull(l)
        }
      }
    }
  }
}

/** Broadcast as-of join: the fact side pays NO exchange and NO sort.
  *
  * The right (dimension-sized) side arrives as a broadcast row array
  * (`BroadcastDistribution(IdentityBroadcastMode)` — EnsureRequirements
  * inserts the BroadcastExchange); each task indexes it once into
  * key -> (sorted ts array, row array), collapsing equal-ts groups to
  * the MIN-tie-break row (exactly the tie rule every direction of the
  * merge exec implements), then streams its left partition with one
  * hash lookup + binary search per row. At 100 TB this is the as-of
  * analog of a broadcast hash join: the entire fact-side
  * shuffle + sort that the merge exec (and any window composition)
  * must pay disappears from the plan.
  *
  * Key equality across sides is UnsafeRow byte equality over the two
  * key projections — the same mechanism Spark's own UnsafeHashedRelation
  * relies on (equal values produce byte-identical projected rows).
  * Null semantics match the merge exec: right rows with a null key
  * component or null ts never enter the index; left rows with any null
  * key component or null ts never match.
  */
object BroadcastAsOfJoinExec {
  /** Per-executor index cache: the broadcast row array is indexed ONCE
    * per executor JVM instead of once per task — at local[32] the old
    * per-task build held up to 32 copies of the dimension index (the
    * r14 verdict's memory-efficiency flag). Keyed on (broadcast id,
    * right key/ts/tie-break exprIds): the broadcast id is unique per
    * materialized exchange, and the exprIds distinguish two as-of
    * joins that REUSE one exchange (ReuseExchange) with different key
    * columns. LRU-bounded at 8 entries, and each entry holds its built
    * index through a SoftReference — an index whose queries have
    * finished is reclaimable by GC under memory pressure instead of
    * pinning up to 8 full dimension indexes for the executor JVM's
    * lifetime (they rebuild lazily from the still-live broadcast if a
    * later task of the same join returns after a collection). Each
    * holder builds under its own lock so concurrent first-tasks of
    * DIFFERENT joins never serialize on each other's build.
    */
  private final class LazyIndex(build: () => AnyRef) {
    private var ref: java.lang.ref.SoftReference[AnyRef] = null
    def value: AnyRef = synchronized {
      val cached = if (ref == null) null else ref.get()
      if (cached != null) cached
      else {
        val built = build()
        ref = new java.lang.ref.SoftReference[AnyRef](built)
        built
      }
    }
  }
  private val cache = new java.util.LinkedHashMap[String, LazyIndex](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, LazyIndex]): Boolean = size() > 8
  }
  private[plans] def cachedIndex(key: String)(build: => AnyRef): AnyRef = {
    val holder = cache.synchronized {
      var h = cache.get(key)
      if (h == null) { h = new LazyIndex(() => build); cache.put(key, h) }
      h
    }
    holder.value
  }
}

case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], outAttrs: Seq[Attribute],
    forward: Boolean, toleranceUs: Option[Long], tieBreak: Option[Attribute],
    nearest: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyB = leftKeys.map(a => BindReferences.bindReference(
      a.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], lOut)).toArray
    val rKeyB = rightKeys.map(a => BindReferences.bindReference(
      a.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rOut)).toArray
    val lTsB = BindReferences.bindReference(
      leftTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], lOut)
    val rTsB = BindReferences.bindReference(
      rightTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rOut)
    val tbB = tieBreak.map(a => BindReferences.bindReference(
      a.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rOut))
    val tbOrd = tieBreak.map(a => org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(a.dataType).asInstanceOf[Ordering[Any]])
    val fwd = forward
    val near = nearest
    val tolUs = toleranceUs
    // same projection discipline as the merge exec: unmatched rows get
    // their own null-literal projection (payload attrs may be declared
    // non-nullable on the input side)
    val matchedExprs = lOut ++ payload
    val unmatchedExprs = lOut ++ payload.map(a =>
      org.apache.spark.sql.catalyst.expressions.Literal.create(null, a.dataType))
    val inSchema = lOut ++ rOut
    val bc = right.executeBroadcast[Array[InternalRow]]()
    // cache token: broadcast id (unique per materialized exchange) +
    // the projection identity (two as-of joins can REUSE one exchange
    // with different key/ts/tie-break columns — their indexes differ)
    val idxToken = s"${bc.id}|${rightKeys.map(_.exprId.id).mkString(",")}|" +
      s"${rightTs.exprId.id}|${tieBreak.map(_.exprId.id).getOrElse(-1L)}"

    left.execute().mapPartitions { lIter =>
      val joinMatched = UnsafeProjection.create(matchedExprs, inSchema)
      val joinNull = UnsafeProjection.create(unmatchedExprs, lOut)
      val joined = new JoinedRow
      val lKeyProj = UnsafeProjection.create(lKeyB.toSeq)

      // ---- index build (once per EXECUTOR, via the companion's
      // LRU-bounded lazy cache; concurrent tasks of the same join block
      // on one build instead of each paying — and holding — its own
      // copy) ----
      val idx = BroadcastAsOfJoinExec.cachedIndex(idxToken) {
        val rKeyProj = UnsafeProjection.create(rKeyB.toSeq)
        val groups = new java.util.HashMap[
          org.apache.spark.sql.catalyst.expressions.UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        val rows = bc.value
        var i = 0
        while (i < rows.length) {
          val r = rows(i)
          val k = rKeyProj(r)
          if (!k.anyNull) {
            val t = rTsB.eval(r)
            if (t != null) {
              var buf = groups.get(k)
              if (buf == null) {
                buf = scala.collection.mutable.ArrayBuffer.empty[(Long, InternalRow)]
                groups.put(k.copy(), buf)
              }
              buf += ((t.asInstanceOf[Long], r))
            }
          }
          i += 1
        }
        // per key: sort by ts, collapse equal-ts runs to the min-tie-break
        // row (without a tie-break: first in broadcast order — the same
        // partition-order caveat the merge exec documents)
        val built = new java.util.HashMap[
          org.apache.spark.sql.catalyst.expressions.UnsafeRow,
          (Array[Long], Array[InternalRow])]()
        val it = groups.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val sorted = e.getValue.sortBy(_._1)
          val ts = scala.collection.mutable.ArrayBuffer.empty[Long]
          val rws = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          var j = 0
          while (j < sorted.length) {
            val (t0, r0) = sorted(j)
            var bestR = r0
            var bestTb = tbB.map(_.eval(r0)).orNull
            j += 1
            while (j < sorted.length && sorted(j)._1 == t0) {
              val rj = sorted(j)._2
              (tbB, tbOrd) match {
                case (Some(tb), Some(ord)) =>
                  val v = tb.eval(rj)
                  // null tie-breaks sort last (both operators only promise
                  // determinism for non-null tie-break columns)
                  if (v != null && (bestTb == null || ord.compare(v, bestTb) < 0)) {
                    bestR = rj; bestTb = v
                  }
                case _ => // no tie-break: keep the first
              }
              j += 1
            }
            ts += t0
            rws += bestR
          }
          built.put(e.getKey, (ts.toArray, rws.toArray))
        }
        built
      }.asInstanceOf[java.util.HashMap[
        org.apache.spark.sql.catalyst.expressions.UnsafeRow,
        (Array[Long], Array[InternalRow])]]

      // rightmost index with ts <= t, or -1
      def floorIdx(a: Array[Long], t: Long): Int = {
        var lo = 0; var hi = a.length - 1; var res = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (a(mid) <= t) { res = mid; lo = mid + 1 } else hi = mid - 1
        }
        res
      }
      // leftmost index with ts >= t, or length
      def ceilIdx(a: Array[Long], t: Long): Int = {
        var lo = 0; var hi = a.length - 1; var res = a.length
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (a(mid) >= t) { res = mid; hi = mid - 1 } else lo = mid + 1
        }
        res
      }
      // leftmost index with ts STRICTLY greater than t, or length —
      // the nearest path's forward probe. A dedicated strict search
      // (rather than ceilIdx(t + 1)) because t + 1 overflows for a
      // LongType ts column holding Long.MaxValue, wrapping the probe
      // to index 0 and minting a bogus negative-gap "forward" match.
      def higherIdx(a: Array[Long], t: Long): Int = {
        var lo = 0; var hi = a.length - 1; var res = a.length
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (a(mid) > t) { res = mid; hi = mid - 1 } else lo = mid + 1
        }
        res
      }

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          var m: InternalRow = null
          val k = lKeyProj(l)
          val t = lTsB.eval(l)
          if (!k.anyNull && t != null) {
            val entry = idx.get(k)
            if (entry != null) {
              val (ta, ra) = entry
              val tv = t.asInstanceOf[Long]
              if (near) {
                // backward candidate: ts <= tv; forward candidate:
                // first ts STRICTLY after (equal ts belongs to backward,
                // same split as the merge exec); backward wins gap ties.
                // Gaps saturate on overflow (LongType timelines spanning
                // more than half the Long range — same rule as the
                // merge exec's nearest path).
                val b = floorIdx(ta, tv)
                val f = higherIdx(ta, tv)
                val gapB = if (b >= 0) {
                  val g = tv - ta(b); if (g < 0) Long.MaxValue else g
                } else 0L
                val gapF = if (f < ta.length) {
                  val g = ta(f) - tv; if (g < 0) Long.MaxValue else g
                } else 0L
                val bOk = b >= 0 && tolUs.forall(gapB <= _)
                val fOk = f < ta.length && tolUs.forall(gapF <= _)
                if (bOk && (!fOk || gapB <= gapF)) m = ra(b)
                else if (fOk) m = ra(f)
              } else if (!fwd) {
                val b = floorIdx(ta, tv)
                if (b >= 0) {
                  // saturate on overflow, same rule as the nearest path
                  val g = tv - ta(b); val gap = if (g < 0) Long.MaxValue else g
                  if (tolUs.forall(gap <= _)) m = ra(b)
                }
              } else {
                val f = ceilIdx(ta, tv)
                if (f < ta.length) {
                  val g = ta(f) - tv; val gap = if (g < 0) Long.MaxValue else g
                  if (tolUs.forall(gap <= _)) m = ra(f)
                }
              }
            }
          }
          numOut += 1
          if (m != null) { numMatched += 1; joinMatched(joined(l, m)) }
          else joinNull(l)
        }
      }
    }
  }
}
