package graft

import graft.operators.AsOfJoin
import graft.plans.NativeAsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native whole-operator as-of join (LogicalPlan + Strategy +
  * streaming-merge SparkPlan) cross-checked against the composed
  * union+window operator on randomized inputs across every option
  * combination, plus planted edge cases the generator can't guarantee
  * and the null-semantics contract where the native operator is
  * deliberately stricter than the window composition.
  */
class NativeAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Merge-pinned facade: this spec's primary subject is the MERGE
    * exec, and the default Auto strategy would route every tiny
    * in-memory frame here to the broadcast exec — silently dropping
    * the merge's test coverage. The broadcast and Auto strategies have
    * their own tests below.
    */
  private object MergeAsOf {
    import graft.plans.AsOfPhysicalStrategy.Merge
    def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
        rightCols: Seq[String], forward: Boolean = false,
        toleranceMs: Option[Long] = None,
        tieBreak: Option[String] = None): DataFrame =
      NativeAsOfJoin.asOf(left, right, key, ts, rightCols, forward,
        toleranceMs, tieBreak, nearest = false, strategy = Merge)
    def asOfNearest(left: DataFrame, right: DataFrame, key: String,
        ts: String, rightCols: Seq[String],
        toleranceMs: Option[Long] = None,
        tieBreak: Option[String] = None): DataFrame =
      NativeAsOfJoin.asOfNearest(left, right, key, ts, rightCols,
        toleranceMs, tieBreak, strategy = Merge)
    def asOfKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
        ts: String, rightCols: Seq[String], forward: Boolean = false,
        toleranceMs: Option[Long] = None, tieBreak: Option[String] = None,
        nearest: Boolean = false): DataFrame =
      NativeAsOfJoin.asOfKeys(left, right, keys, ts, rightCols, forward,
        toleranceMs, tieBreak, nearest, strategy = Merge)
  }

  private def tsDf(rows: Seq[(Long, Long, Long)], payloadName: String): DataFrame =
    rows.toDF("user_id", "mus", payloadName)
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")

  private def canon(df: DataFrame): Seq[(Long, Long, Any)] =
    df.select(col("user_id"), col("v"), col("asof_p"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  /** Random parity: 40 keys, 1500 rows a side, micro-second timestamps
    * drawn from a small range so at-or-equal ties and empty groups both
    * occur; right (key, ts) pairs deduped except in the tie-break runs
    * (without a tie-break BOTH operators are partition-order-dependent
    * on duplicate right timestamps, so equality is only defined with
    * one).
    */
  test("randomized parity with the composed operator (all modes)") {
    val rnd = new scala.util.Random(42)
    def gen(n: Int): Seq[(Long, Long, Long)] =
      (1 to n).map(i => (rnd.nextInt(40).toLong, rnd.nextInt(5000).toLong * 1000L, i.toLong))
    val left = tsDf(gen(1500), "v")
    val rightRaw = gen(1500)
    val rightDedup = tsDf(
      rightRaw.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq, "p")
    val rightDup = tsDf(rightRaw, "p")

    // composed backward tolerance is emulated by carrying the matched
    // right ts (rightCols = ts :: p) and nulling past-tolerance payloads
    def composed(right: DataFrame, forward: Boolean, tol: Option[Long],
        tb: Option[String]): DataFrame =
      if (forward) AsOfJoin.asOfForward(left, right, "user_id", "ts", Seq("p"), tol, tb)
      else {
        val base = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("ts", "p"), tb)
        tol.fold(base) { t =>
          base.withColumn("asof_p",
            when(unix_micros(col("ts")) - unix_micros(col("asof_ts")) <= t * 1000L,
              col("asof_p")))
        }
      }

    for (forward <- Seq(false, true); tol <- Seq(None, Some(700L))) {
      // no tie-break: deduped right side
      val n = MergeAsOf.asOf(left, rightDedup, "user_id", "ts", Seq("p"),
        forward = forward, toleranceMs = tol)
      assert(canon(n) == canon(composed(rightDedup, forward, tol, None)),
        s"forward=$forward tol=$tol")

      // tie-break: duplicated right timestamps allowed
      val nt = MergeAsOf.asOf(left, rightDup, "user_id", "ts", Seq("p"),
        forward = forward, toleranceMs = tol, tieBreak = Some("p"))
      assert(canon(nt) == canon(composed(rightDup, forward, tol, Some("p"))),
        s"tieBreak forward=$forward tol=$tol")
    }

    // STRING keys through the same randomized grid: the merge's retained
    // key is a UTF8String (object-typed, buffer-backed) — the exact path
    // the owned-buffer copy protects
    val leftS = left.withColumn("user_id", concat(lit("u"), col("user_id")))
    val rightS = rightDup.withColumn("user_id", concat(lit("u"), col("user_id")))
    for (forward <- Seq(false, true)) {
      val n = MergeAsOf.asOf(leftS, rightS, "user_id", "ts", Seq("p"),
        forward = forward, tieBreak = Some("p"))
        .select(col("user_id"), col("v"), col("asof_p")).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      val c = (if (forward)
          AsOfJoin.asOfForward(leftS, rightS, "user_id", "ts", Seq("p"), None, Some("p"))
        else AsOfJoin.asOf(leftS, rightS, "user_id", "ts", Seq("p"), Some("p")))
        .select(col("user_id"), col("v"), col("asof_p")).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      assert(n == c, s"string keys forward=$forward")
    }

    // NEAREST direction over the same randomized frames, with and
    // without tolerance: the one-pass merge (held backward candidate +
    // head-as-forward-candidate) vs the composed two-window spelling.
    // Deduped right without a tie-break (no equal-ts ambiguity; the
    // backward-wins-exact-|gap|-tie rule is still exercised whenever a
    // left ts sits midway), duplicated right with one.
    for (tol <- Seq(None, Some(700L))) {
      val n = MergeAsOf.asOfNearest(left, rightDedup, "user_id", "ts",
        Seq("p"), toleranceMs = tol)
      val c = AsOfJoin.asOfNearest(left, rightDedup, "user_id", "ts",
        Seq("p"), toleranceMs = tol)
      assert(canon(n) == canon(c), s"nearest tol=$tol")

      val nt = MergeAsOf.asOfNearest(left, rightDup, "user_id", "ts",
        Seq("p"), toleranceMs = tol, tieBreak = Some("p"))
      val ct = AsOfJoin.asOfNearest(left, rightDup, "user_id", "ts",
        Seq("p"), toleranceMs = tol, tieBreak = Some("p"))
      assert(canon(nt) == canon(ct), s"nearest tieBreak tol=$tol")
    }
  }

  test("nearest planted semantics: direction pick, exact-gap tie, tolerance") {
    // millisecond-scale gaps so a mid-value ms tolerance can genuinely
    // SPLIT the two directions (the Long toleranceMs is ms-granular).
    // key 1: left at 10ms sits 3ms after r(7ms)=7 and 2ms before
    // r(12ms)=9 -> forward wins; left at 9.5ms is 2.5ms/2.5ms
    // equidistant -> BACKWARD wins the exact tie; key 2 has only a
    // backward row; key 3 only a forward row; key 4 nothing
    val left = tsDf(Seq((1L, 10000L, 10L), (1L, 9500L, 11L), (2L, 5000L, 20L),
      (3L, 1000L, 30L), (4L, 1000L, 40L)), "v")
    val right = tsDf(Seq((1L, 7000L, 7L), (1L, 12000L, 9L), (2L, 4000L, 21L),
      (3L, 3500L, 31L)), "p")
    val out = canon(MergeAsOf.asOfNearest(left, right, "user_id", "ts",
      Seq("p"), tieBreak = Some("p")))
    assert(out == Seq((1L, 10L, 9L), (1L, 11L, 7L), (2L, 20L, 21L),
      (3L, 30L, 31L), (4L, 40L, null)))
    // DIRECTION-SPLITTING tolerance: 2ms keeps (1,10ms)'s 2ms forward
    // match (inclusive boundary) while pruning its 3ms backward
    // candidate, keeps (2,5ms)'s 1ms backward match, and prunes both
    // 2.5ms gaps at (1,9.5ms) and key 3's 2.5ms forward gap
    val tol2 = canon(MergeAsOf.asOfNearest(left, right, "user_id", "ts",
      Seq("p"), toleranceMs = Some(2L), tieBreak = Some("p")))
    assert(tol2 == Seq((1L, 10L, 9L), (1L, 11L, null), (2L, 20L, 21L),
      (3L, 30L, null), (4L, 40L, null)))
    // 0ms tolerance keeps only exact-equal timestamps: none planted
    val tol = canon(MergeAsOf.asOfNearest(left, right, "user_id", "ts",
      Seq("p"), toleranceMs = Some(0L), tieBreak = Some("p")))
    assert(tol == Seq((1L, 10L, null), (1L, 11L, null), (2L, 20L, null),
      (3L, 30L, null), (4L, 40L, null)))
    // equal-ts tie group at the left's own ts: min tie-break, via the
    // FIRST-of-new-ts-group retain (ascending tie order in nearest mode)
    val lt = tsDf(Seq((9L, 500L, 90L)), "v")
    val rt = tsDf(Seq((9L, 500L, 6L), (9L, 500L, 3L), (9L, 450L, 8L)), "p")
    assert(canon(MergeAsOf.asOfNearest(lt, rt, "user_id", "ts", Seq("p"),
      tieBreak = Some("p"))) == Seq((9L, 90L, 3L)))
  }

  test("nearest composite keys: randomized 2-key parity vs composed surrogate") {
    val rnd = new scala.util.Random(11)
    def gen(n: Int, payloadName: String): org.apache.spark.sql.DataFrame =
      (1 to n).map(i => (rnd.nextInt(6).toLong, rnd.nextInt(5).toLong,
        rnd.nextInt(3000).toLong * 1000L, i.toLong))
        .toDF("k1", "k2", "mus", payloadName)
        .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val left = gen(800, "v")
    val right = gen(800, "p")
    val sur = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("kk", concat_ws("|", col("k1"), col("k2")))
    val n = MergeAsOf.asOfKeys(left, right, Seq("k1", "k2"), "ts",
      Seq("p"), tieBreak = Some("p"), nearest = true)
      .select(col("k1"), col("k2"), col("v"), col("asof_p")).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val c = AsOfJoin.asOfNearest(sur(left), sur(right), "kk", "ts", Seq("p"),
      tieBreak = Some("p"))
      .select(col("k1"), col("k2"), col("v"), col("asof_p")).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(n == c)
  }

  test("planted semantics: ties, tolerance boundary, empty groups") {
    val left = tsDf(Seq((1L, 1000L, 10L), (1L, 2000L, 11L), (2L, 500L, 20L),
      (3L, 9000L, 30L)), "v")
    // key 1: two right rows at ts=1000 (tie) + one later; key 2 has only
    // a LATER right row; key 3 absent on the right
    val right = tsDf(Seq((1L, 1000L, 7L), (1L, 1000L, 5L), (1L, 1500L, 9L),
      (2L, 800L, 21L)), "p")

    // backward, tie at 1000 -> min tie-break (5), at-or-before includes ties
    val b = canon(MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
      tieBreak = Some("p")))
    assert(b == Seq((1L, 10L, 5L), (1L, 11L, 9L), (2L, 20L, null), (3L, 30L, null)))

    // forward from 2000: nothing at-or-after for key 1 after 1500 -> null;
    // key 2 forward finds 800
    val f = canon(MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
      forward = true, tieBreak = Some("p")))
    assert(f == Seq((1L, 10L, 5L), (1L, 11L, null), (2L, 20L, 21L), (3L, 30L, null)))

    // tolerance boundary is inclusive and micro-exact: gap 500us within
    // 1ms? tolerance is in ms — gap from 2000us back to 1500us = 500us
    // <= 1ms passes; 0ms tolerance keeps only exact-equal matches
    val t1 = canon(MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
      toleranceMs = Some(1L), tieBreak = Some("p")))
    assert(t1 == Seq((1L, 10L, 5L), (1L, 11L, 9L), (2L, 20L, null), (3L, 30L, null)))
    val t0 = canon(MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
      toleranceMs = Some(0L), tieBreak = Some("p")))
    assert(t0 == Seq((1L, 10L, 5L), (1L, 11L, null), (2L, 20L, null), (3L, 30L, null)))
  }

  test("null keys and null timestamps never match (strict SQL semantics)") {
    val left = Seq((Some(1L), Some(1000L), 10L), (None, Some(1000L), 11L),
      (Some(1L), None, 12L))
      .toDF("user_id", "mus", "v")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val right = Seq((Some(1L), Some(500L), 7L), (None, Some(400L), 8L),
      (Some(1L), None, 9L))
      .toDF("user_id", "mus", "p")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val out = MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"))
      .select(col("v"), col("asof_p")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .sortBy(_._1).toSeq
    // row v=10 matches the one valid right row; null-key and null-ts
    // left rows match nothing; the null-key / null-ts right rows are
    // never candidates (they must not stall the merge either)
    assert(out == Seq((10L, 7L), (11L, null), (12L, null)))
  }

  test("string keys and self-join exprId hygiene") {
    // both sides derive from the SAME DataFrame -> shared exprIds; the
    // operator must re-key the right side internally
    val base = Seq(("a", 100L, 1L), ("a", 200L, 2L), ("b", 150L, 3L))
      .toDF("user_id", "mus", "x")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val left = base.select(col("user_id"), col("ts"), col("x").as("v"))
    val right = base.select(col("user_id"), col("ts"), col("x").as("p"))
    val out = MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
      tieBreak = Some("p"))
      .select(col("v"), col("asof_p")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // each row at least matches itself at-or-before
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("string keys: best carried within a key, invalidated across keys") {
    // left rows interleave a keyless-match key ("b") between two key
    // groups that DO match — the stale-best guard must neither leak
    // key-"a"'s payload onto "b" nor lose it for "a"'s later row
    val left = Seq(("a", 100L, 1L), ("a", 300L, 2L), ("b", 200L, 3L),
      ("c", 250L, 4L))
      .toDF("user_id", "mus", "v")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val right = Seq(("a", 50L, 7L), ("c", 240L, 9L))
      .toDF("user_id", "mus", "p")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val out = MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"))
      .select(col("v"), col("asof_p")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(out == Seq((1L, 7L), (2L, 7L), (3L, null), (4L, 9L)))
  }

  test("composite keys: randomized 2-key parity vs composed on a surrogate") {
    // native joins on (k1, k2); the composed reference runs on the
    // concatenated surrogate key — equality proves the lexicographic
    // composite merge equals true grouped semantics
    val rnd = new scala.util.Random(7)
    def gen(n: Int, payloadName: String): org.apache.spark.sql.DataFrame =
      (1 to n).map(i => (rnd.nextInt(6).toLong, rnd.nextInt(5).toLong,
        rnd.nextInt(3000).toLong * 1000L, i.toLong))
        .toDF("k1", "k2", "mus", payloadName)
        .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val left = gen(800, "v")
    val right = gen(800, "p")
    val sur = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("kk", concat_ws("|", col("k1"), col("k2")))
    for (forward <- Seq(false, true)) {
      val n = MergeAsOf.asOfKeys(left, right, Seq("k1", "k2"), "ts",
        Seq("p"), forward = forward, tieBreak = Some("p"))
        .select(col("k1"), col("k2"), col("v"), col("asof_p")).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3))
      val c = (if (forward)
          AsOfJoin.asOfForward(sur(left), sur(right), "kk", "ts", Seq("p"), None, Some("p"))
        else AsOfJoin.asOf(sur(left), sur(right), "kk", "ts", Seq("p"), Some("p")))
        .select(col("k1"), col("k2"), col("v"), col("asof_p")).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3))
      assert(n == c, s"composite forward=$forward")
    }
    // null in ANY component never matches
    val ln = Seq((Some(1L), None: Option[Long], 100L, 1L),
      (Some(1L), Some(2L), 100L, 2L))
      .toDF("k1", "k2", "mus", "v")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val rn = Seq((Some(1L), None: Option[Long], 50L, 7L),
      (Some(1L), Some(2L), 50L, 8L))
      .toDF("k1", "k2", "mus", "p")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val out = MergeAsOf.asOfKeys(ln, rn, Seq("k1", "k2"), "ts", Seq("p"))
      .select(col("v"), col("asof_p")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(out == Seq((1L, null), (2L, 8L)))
  }

  test("composite keys: DATE second component (q_asof_native_keys' shape)") {
    // (long, date) key vector — gates a non-long key type through the
    // merge's lexicographic compare; composed reference on the
    // concatenated surrogate, same construction as the 2-long case
    val rnd = new scala.util.Random(11)
    def gen(n: Int, payloadName: String): org.apache.spark.sql.DataFrame =
      (1 to n).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(4),
        rnd.nextInt(3000).toLong * 1000L, i.toLong))
        .toDF("k1", "doff", "mus", payloadName)
        .withColumn("day", date_add(to_date(lit("2024-01-01")), col("doff")))
        .withColumn("ts", timestamp_micros(col("mus"))).drop("mus", "doff")
    val left = gen(600, "v")
    val right = gen(600, "p")
    val sur = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("kk", concat_ws("|", col("k1"), col("day")))
    val n = MergeAsOf.asOfKeys(left, right, Seq("k1", "day"), "ts",
      Seq("p"), tieBreak = Some("p"))
      .select(col("k1"), col("day"), col("v"), col("asof_p")).collect().toSeq
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val c = AsOfJoin.asOf(sur(left), sur(right), "kk", "ts", Seq("p"), Some("p"))
      .select(col("k1"), col("day"), col("v"), col("asof_p")).collect().toSeq
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(n == c)
  }

  test("broadcast exec: randomized parity with the merge exec (all modes)") {
    // same semantics, different physical strategy: the broadcast index
    // (per-key sorted timeline + binary search) must agree with the
    // streaming merge on every direction, with and without tolerance
    // and tie-break, on the same randomized frames
    val rnd = new scala.util.Random(99)
    def gen(n: Int): Seq[(Long, Long, Long)] =
      (1 to n).map(i => (rnd.nextInt(40).toLong, rnd.nextInt(5000).toLong * 1000L, i.toLong))
    val left = tsDf(gen(1500), "v")
    val right = tsDf(gen(1200), "p")
    for (mode <- Seq("backward", "forward", "nearest"); tol <- Seq(None, Some(700L))) {
      val (fwd, near) = mode match {
        case "backward" => (false, false)
        case "forward" => (true, false)
        case "nearest" => (false, true)
      }
      val b = NativeAsOfJoin.asOfBroadcast(left, right, Seq("user_id"), "ts",
        Seq("p"), forward = fwd, toleranceMs = tol, tieBreak = Some("p"),
        nearest = near)
      val m = MergeAsOf.asOfKeys(left, right, Seq("user_id"), "ts",
        Seq("p"), forward = fwd, toleranceMs = tol, tieBreak = Some("p"),
        nearest = near)
      assert(canon(b) == canon(m), s"mode=$mode tol=$tol")
    }
    // composite STRING+long keys through the broadcast index: UnsafeRow
    // byte-equality across the two key projections is the lookup
    // mechanism — exercise it with a var-length component
    val leftS = left.withColumn("k2", concat(lit("g"), col("user_id") % 3))
    val rightS = right.withColumn("k2", concat(lit("g"), col("user_id") % 3))
    val b2 = NativeAsOfJoin.asOfBroadcast(leftS, rightS, Seq("user_id", "k2"),
      "ts", Seq("p"), tieBreak = Some("p"))
    val m2 = MergeAsOf.asOfKeys(leftS, rightS, Seq("user_id", "k2"),
      "ts", Seq("p"), tieBreak = Some("p"))
    assert(canon(b2) == canon(m2), "composite string keys")
    // null semantics: null key / null ts rows never match or index
    val ln = Seq((Some(1L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(1L), None, 3L))
      .toDF("user_id", "mus", "v")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val rn = Seq((Some(1L), Some(50L), 7L), (Some(1L), None, 8L),
      (None, Some(40L), 9L))
      .toDF("user_id", "mus", "p")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val out = NativeAsOfJoin.asOfBroadcast(ln, rn, Seq("user_id"), "ts", Seq("p"))
      .select(col("v"), col("asof_p")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(out == Seq((1L, 7L), (2L, null), (3L, null)))
  }

  test("broadcast nearest: LongType ts at Long.MaxValue (overflow guard)") {
    // a LongType ts column may legitimately hold Long.MaxValue; the
    // nearest path's forward probe must use a strictly-greater search —
    // a ceil search at (ts + 1) wraps to Long.MinValue and returns
    // index 0, minting a bogus negative-gap forward match that would
    // beat the true backward candidate
    val left = Seq((1L, Long.MaxValue, 10L), (1L, 150L, 11L))
      .toDF("user_id", "ts", "v")
    val right = Seq((1L, 100L, 7L), (1L, 200L, 9L))
      .toDF("user_id", "ts", "p")
    val out = NativeAsOfJoin.asOfBroadcast(left, right, Seq("user_id"), "ts",
      Seq("p"), tieBreak = Some("p"), nearest = true)
      .select(col("v"), col("asof_p")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // ts=MaxValue: nearest is the LAST right row (backward, gap huge but
    // no tolerance); ts=150: equidistant 50/50 -> backward wins -> 7
    assert(out == Seq((10L, 9L), (11L, 7L)))

    // GAP-WRAP case: a timeline spanning more than half the Long range.
    // left at MaxValue-10 has backward candidate MinValue (true gap
    // ~2^64, wraps negative) and forward candidate MaxValue (gap 10) —
    // an unsaturated compare would let the wrapped backward "win";
    // the nearest pick must be the forward row, on BOTH execs
    val lw = Seq((1L, Long.MaxValue - 10L, 10L)).toDF("user_id", "ts", "v")
    val rw = Seq((1L, Long.MinValue, 7L), (1L, Long.MaxValue, 9L))
      .toDF("user_id", "ts", "p")
    def picked(df: DataFrame): Long =
      df.select(col("asof_p")).collect().head.getLong(0)
    assert(picked(NativeAsOfJoin.asOfBroadcast(lw, rw, Seq("user_id"), "ts",
      Seq("p"), tieBreak = Some("p"), nearest = true)) == 9L)
    assert(picked(MergeAsOf.asOfKeys(lw, rw, Seq("user_id"), "ts", Seq("p"),
      tieBreak = Some("p"), nearest = true)) == 9L)
  }

  test("backward/forward tolerance saturates on Long overflow (both execs)") {
    // The public API only admits a tolerance with TimestampType ts
    // (whose micros cannot span half the Long range), but the plan node
    // carries a raw toleranceUs and the execs must still be safe on a
    // LongType timeline: left at MaxValue-10 vs right at MinValue gives
    // a true backward gap of ~2^64 that wraps NEGATIVE — an unsaturated
    // `gap <= tol` check would emit a match enormously outside the
    // stated tolerance. Construct the node directly with toleranceUs.
    import org.apache.spark.sql.catalyst.expressions.Attribute
    def rawPlan(left: DataFrame, right: DataFrame, forward: Boolean,
        strategy: graft.plans.AsOfPhysicalStrategy): DataFrame = {
      val lp = left.queryExecution.analyzed
      val rp = right.queryExecution.analyzed
      def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          n: String): Attribute = p.output.find(_.name == n).get
      val payload = a(rp, "p")
      val out = org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "asof_p", payload.dataType, nullable = true)()
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        graft.plans.AsOfJoinPlan(lp, rp,
          Seq(a(lp, "user_id")), Seq(a(rp, "user_id")),
          a(lp, "ts"), a(rp, "ts"), Seq(payload), Seq(out),
          forward, toleranceUs = Some(1000L), tieBreak = None,
          nearest = false, strategy = strategy))
    }
    def matched(df: DataFrame): Option[Long] = {
      val r = df.select(col("asof_p")).collect().head
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    import graft.plans.AsOfPhysicalStrategy.{Broadcast, Merge}
    // backward: only candidate is MinValue, wrapped gap would "pass"
    val lb = Seq((1L, Long.MaxValue - 10L, 10L)).toDF("user_id", "ts", "v")
    val rb = Seq((1L, Long.MinValue, 7L)).toDF("user_id", "ts", "p")
    assert(matched(rawPlan(lb, rb, forward = false, Merge)).isEmpty)
    assert(matched(rawPlan(lb, rb, forward = false, Broadcast)).isEmpty)
    // forward: left at MinValue+10, only candidate at MaxValue
    val lf = Seq((1L, Long.MinValue + 10L, 10L)).toDF("user_id", "ts", "v")
    val rf = Seq((1L, Long.MaxValue, 7L)).toDF("user_id", "ts", "p")
    assert(matched(rawPlan(lf, rf, forward = true, Merge)).isEmpty)
    assert(matched(rawPlan(lf, rf, forward = true, Broadcast)).isEmpty)
    // sanity: an in-tolerance candidate still matches on all four paths
    val rn = Seq((1L, Long.MaxValue - 12L, 8L)).toDF("user_id", "ts", "p")
    assert(matched(rawPlan(lb, rn, forward = false, Merge)).contains(8L))
    assert(matched(rawPlan(lb, rn, forward = false, Broadcast)).contains(8L))
  }

  test("streaming RIGHT side is rejected at planning time (all strategies)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long)]
    stream.addData((1L, 100L, 7L))
    val right = stream.toDF().toDF("user_id", "ts", "p")
    val left = Seq((1L, 150L, 10L)).toDF("user_id", "ts", "v")
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    for (s <- Seq(graft.plans.AsOfPhysicalStrategy.Auto,
        graft.plans.AsOfPhysicalStrategy.Merge,
        graft.plans.AsOfPhysicalStrategy.Broadcast)) {
      val df = NativeAsOfJoin.asOfKeys(left, right, Seq("user_id"), "ts",
        Seq("p"), strategy = s)
      val q = df.writeStream.format("memory")
        .queryName(s"asof_right_stream_$s").outputMode("append").start()
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      q.stop()
      assert(messages(err).exists(_.contains("right (timeline) side is a stream")),
        s"strategy $s: " + messages(err).mkString(" | "))
    }
  }

  test("broadcast exec plan shape: zero shuffle, zero sort, one broadcast") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val l = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val r = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val df = NativeAsOfJoin.asOfBroadcast(l, r, Seq("user_id"), "ts",
      Seq("click_id"), tieBreak = Some("click_id"))
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[graft.plans.BroadcastAsOfJoinExec]) == 1,
      df.queryExecution.executedPlan.toString)
    // THE claim: the fact side moves and sorts NOTHING
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      df.queryExecution.executedPlan.toString)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      df.queryExecution.executedPlan.toString)
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]) == 1,
      df.queryExecution.executedPlan.toString)
    // and the result equals the merge exec's on the same inputs
    val viaMerge = MergeAsOf.asOf(l, r, "user_id", "ts", Seq("click_id"),
      tieBreak = Some("click_id"))
    assert(df.collect().map(_.toString).sorted.toSeq ==
      viaMerge.collect().map(_.toString).sorted.toSeq)
  }

  test("plan shape: AsOfJoinExec with one exchange+sort per side") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val l = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val r = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val df = MergeAsOf.asOf(l, r, "user_id", "ts", Seq("click_id"))
    df.collect() // finalize the adaptive plan before inspecting it
    // AQE hides stage plans from collect(): flatten through
    // AdaptiveSparkPlanExec / QueryStageExec containers explicitly
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[graft.plans.AsOfJoinExec]) == 1,
      df.queryExecution.executedPlan.toString)
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) == 2,
      df.queryExecution.executedPlan.toString)
    // and NO WindowExec: the buffering operator this exec exists to avoid
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExecBase]),
      df.queryExecution.executedPlan.toString)
  }

  test("Auto strategy: stats pick broadcast vs merge; overrides win") {
    import graft.plans.AsOfPhysicalStrategy
    // parquet-backed frames so sizeInBytes comes from the file index —
    // the same statistic JoinSelection's canBroadcastBySize consumes
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val l = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val r = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    def physicalOf(df: DataFrame): org.apache.spark.sql.execution.SparkPlan =
      df.queryExecution.executedPlan
    def has[T](df: DataFrame)(implicit ct: scala.reflect.ClassTag[T]): Boolean = {
      def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      flatten(physicalOf(df)).exists(n => ct.runtimeClass.isInstance(n))
    }
    def auto() = NativeAsOfJoin.asOf(l, r, "user_id", "ts", Seq("click_id"),
      tieBreak = Some("click_id"))
    val mergeRef = MergeAsOf.asOf(l, r, "user_id", "ts", Seq("click_id"),
      tieBreak = Some("click_id")).collect().map(_.toString).sorted.toSeq

    // dim-sized right under the default 10MB threshold -> broadcast exec
    val small = auto()
    assert(has[graft.plans.BroadcastAsOfJoinExec](small), physicalOf(small).toString)
    assert(small.collect().map(_.toString).sorted.toSeq == mergeRef)

    // threshold disabled (-1, Spark's own convention) -> the same call
    // plans the merge exec; values identical
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = auto()
      assert(has[graft.plans.AsOfJoinExec](big), physicalOf(big).toString)
      assert(big.collect().map(_.toString).sorted.toSeq == mergeRef)
      // caller override beats stats in BOTH directions
      val forced = NativeAsOfJoin.asOf(l, r, "user_id", "ts", Seq("click_id"),
        tieBreak = Some("click_id"),
        strategy = AsOfPhysicalStrategy.Broadcast)
      assert(has[graft.plans.BroadcastAsOfJoinExec](forced),
        physicalOf(forced).toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val forcedMerge = NativeAsOfJoin.asOf(l, r, "user_id", "ts",
      Seq("click_id"), tieBreak = Some("click_id"),
      strategy = AsOfPhysicalStrategy.Merge)
    assert(has[graft.plans.AsOfJoinExec](forcedMerge),
      physicalOf(forcedMerge).toString)
  }

  test("pre-partitioned inputs: mixed partitioning schemes stay co-partitioned") {
    // the zipPartitions hazard: RangePartitioning(user_id) SATISFIES
    // ClusteredDistribution(user_id), so a range-partitioned left with
    // a hash-exchanged right could pair partition i of one scheme with
    // partition i of the other — same key, different partition index,
    // silently wrong rows. EnsureRequirements' two-children
    // compatibility check (ShuffleSpec) must re-shuffle one side; this
    // pins that the VALUES survive every pre-partitioning mix.
    val rnd = new scala.util.Random(17)
    def gen(n: Int, p: String): DataFrame =
      (1 to n).map(i => (rnd.nextInt(50).toLong, rnd.nextInt(5000).toLong * 1000L, i.toLong))
        .toDF("user_id", "mus", p)
        .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val l0 = gen(2000, "v")
    val r0 = gen(2000, "p")
    val expected = canon(MergeAsOf.asOf(l0, r0, "user_id", "ts", Seq("p"),
      tieBreak = Some("p")))
    val variants = Seq(
      "rangeL" -> ((l0.repartitionByRange(8, col("user_id")), r0)),
      "rangeR" -> ((l0, r0.repartitionByRange(8, col("user_id")))),
      "rangeL-hashR" -> ((l0.repartitionByRange(8, col("user_id")),
        r0.repartition(4, col("user_id")))),
      "hash3-hash7" -> ((l0.repartition(3, col("user_id")),
        r0.repartition(7, col("user_id")))),
      "sortedL" -> ((l0.orderBy("user_id", "ts"), r0)))
    variants.foreach { case (name, (l, r)) =>
      val got = canon(MergeAsOf.asOf(l, r, "user_id", "ts", Seq("p"),
        tieBreak = Some("p")))
      assert(got == expected, s"variant $name")
    }
  }

  test("bucketed+sorted layout: the merge as-of plans ZERO exchange, ZERO sort") {
    // the stored-layout amortization applied to the as-of tier: both
    // sides written bucketBy(user_id).sortBy(user_id, ts) with one file
    // per bucket — the scan then reports HashPartitioning + the exact
    // (key, ts) ordering the merge exec requires, so EnsureRequirements
    // adds NOTHING: at 100 TB the PIT join pays zero runtime movement.
    // (tieBreak unset: its right-side ordering ends DESC on the break
    // column, which a sortBy layout can't provide — that variant keeps
    // one sort.)
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    def writeBkt(name: String, typ: String, payloadAs: String): String = {
      val t = s"asof_bkt_$name"
      val root = s"${sys.props("java.io.tmpdir")}/graft_asof_bkt/$name"
      e.filter(col("event_type") === typ)
        .select(col("user_id"), col("ts"), col("event_id").as(payloadAs))
        .repartition(4, col("user_id")) // one file per bucket
        .write.mode("overwrite").option("path", root)
        .bucketBy(4, "user_id").sortBy("user_id", "ts")
        .saveAsTable(t)
      t
    }
    val lt = writeBkt("purch", "purchase", "event_id")
    val rt = writeBkt("click", "click", "click_id")
    // Spark only propagates the bucket sortBy into the scan's
    // outputOrdering behind this flag (it is unsound when a bucket
    // spans MULTIPLE files, whose concatenation is not globally
    // sorted); the writes above repartition on the bucket column first,
    // so every bucket is exactly one file and the ordering is real —
    // the standard compacted feature-store layout this demo models.
    val prevOrd = spark.conf
      .getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val df = MergeAsOf.asOf(spark.table(lt), spark.table(rt), "user_id",
        "ts", Seq("click_id"))
      df.collect()
      def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val nodes = flatten(df.queryExecution.executedPlan)
      assert(nodes.count(_.isInstanceOf[graft.plans.AsOfJoinExec]) == 1,
        df.queryExecution.executedPlan.toString)
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
        df.queryExecution.executedPlan.toString)
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
        df.queryExecution.executedPlan.toString)
      // and the values equal the plain (shuffling) spelling
      val plain = MergeAsOf.asOf(
        e.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id"),
        e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id")),
        "user_id", "ts", Seq("click_id"))
      assert(df.collect().map(_.toString).sorted.toSeq ==
        plain.collect().map(_.toString).sorted.toSeq)
    } finally {
      prevOrd match {
        case Some(v) => spark.conf
          .set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
        case None => spark.conf
          .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
      spark.sql(s"DROP TABLE IF EXISTS $lt")
      spark.sql(s"DROP TABLE IF EXISTS $rt")
    }
  }

  test("AQE interaction: shuffles feeding AsOfJoinExec still coalesce") {
    // SURVEY §4's caveat — bespoke physical nodes forfeit SOME adaptive
    // re-planning — made precise for the as-of tier: AQE's
    // CoalesceShufflePartitions DOES still apply to the two
    // ENSURE_REQUIREMENTS exchanges feeding the merge exec (both sides
    // coalesce together, preserving co-partitioning), while skew-split
    // (OptimizeSkewedJoin) and runtime strategy flips
    // (DynamicJoinSelection) do NOT — they pattern-match Spark's own
    // join execs. Skew safety comes from the merge's O(1)-state design
    // instead, and strategy choice is the static stats rule.
    val rnd = new scala.util.Random(3)
    def gen(n: Int, p: String): DataFrame =
      (1 to n).map(i => (rnd.nextInt(50).toLong, rnd.nextInt(5000).toLong * 1000L, i.toLong))
        .toDF("user_id", "mus", p)
        .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    val prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      val df = MergeAsOf.asOf(gen(2000, "v"), gen(2000, "p"), "user_id",
        "ts", Seq("p"), tieBreak = Some("p"))
      df.collect()
      def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val nodes = flatten(df.queryExecution.executedPlan)
      assert(nodes.count(_.isInstanceOf[graft.plans.AsOfJoinExec]) == 1)
      // the adaptive reads prove AQE re-planned the exchanges feeding
      // the custom exec — tiny partitions coalesce on BOTH sides
      val reads = nodes.collect {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => r
      }
      assert(reads.size == 2, df.queryExecution.executedPlan.toString)
      // and the coalesced sides stay co-partitioned: equal partition
      // counts, or the merge's zipPartitions would mispair key ranges
      assert(reads.map(_.outputPartitioning.numPartitions).distinct.size == 1,
        reads.map(_.outputPartitioning).mkString(", "))
    } finally
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
  }

  test("AQE flips a stale-stats Auto merge to the broadcast exec at runtime") {
    // The DynamicJoinSelection analog, obtained by CONSTRUCTION rather
    // than by a bespoke rule: AQE's re-optimization re-runs the session
    // strategies — AsOfJoinStrategy included — against a logical plan
    // whose materialized children are LogicalQueryStages with ACCURATE
    // runtime stats. A right side that is stats-less at planning time
    // (localCheckpoint -> LogicalRDD -> defaultSizeInBytes) makes Auto
    // pick the safe merge statically; once the right exchange
    // materializes and its true size fits the threshold, the re-plan
    // picks the broadcast exec. Genuine unknowns still fall back to
    // merge (the second half below).
    val left = Seq.tabulate(64)(i => (i.toLong % 8, 1000L + i, i.toLong))
      .toDF("user_id", "mus", "v")
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    // an RDD-backed frame is DELIBERATELY stats-less: LogicalRDD has no
    // size information, so its stats are defaultSizeInBytes (Long.Max);
    // the projection on top scales that, keeping it astronomically large
    val rightRows = Seq.tabulate(16)(i =>
      org.apache.spark.sql.Row(i.toLong % 8, 990L + i, 100L + i))
    val rightSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("mus",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.LongType)))
    val right = spark.createDataFrame(
        spark.sparkContext.parallelize(rightRows, 2), rightSchema)
      .withColumn("ts", timestamp_micros(col("mus"))).drop("mus")
    assert(right.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(1L << 40), "precondition: the right side must be stats-less")
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val df = NativeAsOfJoin.asOf(left, right, "user_id", "ts", Seq("p"),
      tieBreak = Some("p"))
    // static pick is the merge (the safe side for unknown stats)
    val initial = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    assert(initial.collect { case m: graft.plans.AsOfJoinExec => m }.size == 1,
      initial.toString)
    val rows = df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[graft.plans.BroadcastAsOfJoinExec]) == 1,
      df.queryExecution.executedPlan.toString)
    assert(nodes.count(_.isInstanceOf[graft.plans.AsOfJoinExec]) == 0)
    // and the flipped plan computes the same join as the pinned merge
    val viaMerge = MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
      tieBreak = Some("p")).collect()
    def key(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(r.fieldIndex("v")),
        if (r.isNullAt(r.fieldIndex("asof_p"))) -1L
        else r.getLong(r.fieldIndex("asof_p")))).sortBy(_._1).toSeq
    assert(key(rows) == key(viaMerge))

    // a right side whose RUNTIME size exceeds the threshold stays merge
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val big = NativeAsOfJoin.asOf(left, right, "user_id", "ts", Seq("p"),
        tieBreak = Some("p"))
      big.collect()
      val bigNodes = flatten(big.queryExecution.executedPlan)
      assert(bigNodes.count(_.isInstanceOf[graft.plans.AsOfJoinExec]) == 1,
        big.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("graft_asof SQL table function: every spelling matches the API") {
    // the TVF resolves straight to AsOfJoinPlan at analysis time; every
    // direction/tolerance/tie-break/strategy spelling must agree with
    // the DataFrame API on the same views
    val rnd = new scala.util.Random(5)
    def gen(n: Int): Seq[(Long, Long, Long)] =
      (1 to n).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(3000).toLong * 1000L, i.toLong))
    val left = tsDf(gen(300), "v")
    val right = tsDf(gen(300), "p")
    left.createOrReplaceTempView("asof_sql_l")
    right.createOrReplaceTempView("asof_sql_r")
    def viaSql(extra: String): Seq[(Long, Long, Any)] =
      spark.sql("SELECT user_id, v, asof_p FROM graft_asof(" +
          s"'asof_sql_l', 'asof_sql_r', 'user_id', 'ts', 'p'$extra)")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2)))
        .sortBy(t => (t._1, t._2))
    // backward (defaults beyond the 5 required args)
    assert(viaSql(", 'backward', '', 'p'") ==
      canon(MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
        tieBreak = Some("p"))))
    // forward + tolerance + pinned merge strategy
    assert(viaSql(", 'forward', '700', 'p', 'merge'") ==
      canon(MergeAsOf.asOf(left, right, "user_id", "ts", Seq("p"),
        forward = true, toleranceMs = Some(700L), tieBreak = Some("p"))))
    // nearest through the pinned broadcast strategy
    assert(viaSql(", 'nearest', '', 'p', 'broadcast'") ==
      canon(NativeAsOfJoin.asOfBroadcast(left, right, Seq("user_id"), "ts",
        Seq("p"), tieBreak = Some("p"), nearest = true)))
    // malformed spellings fail analysis loudly
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof('asof_sql_l', 'asof_sql_r', 'user_id', 'ts')"))
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof('asof_sql_l', 'asof_sql_r', 'user_id', " +
        "'ts', 'p', 'sideways')"))
  }
}
