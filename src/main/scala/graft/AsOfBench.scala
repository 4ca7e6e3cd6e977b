package graft

import org.apache.spark.sql.functions._

/** Micro-bench for the whole-operator as-of join (streaming merge,
  * `plans/NativeAsOfJoin`) vs the composed union+window spelling
  * (`operators/AsOfJoin`) on a SKEWED key distribution — the case the
  * native exec exists for: `WindowExec` buffers each key group into an
  * `ExternalAppendOnlyUnsafeRowArray` before evaluating the frame, so a
  * hot key materializes (and past the threshold, SPILLS) its whole
  * group, while the merge holds one right row + one best match whatever
  * the skew.
  *
  * Synthetic workload: SPARK_GRAFT_ROWS right rows (default 4M) and
  * rows/10 left rows over 1000 keys, with SPARK_GRAFT_HOT_PCT percent
  * (default 80) of BOTH sides on a single hot key — the "one user is a
  * bot" shape. Timestamps deterministic (xxhash64 of the row id), so
  * both spellings join the same data. Prints one JSON line with min-of-3
  * wall seconds per spelling and a matched-row cross-check.
  *
  * Usage: runMain graft.AsOfBench  (env: SPARK_GRAFT_ROWS,
  * SPARK_GRAFT_HOT_PCT, SPARK_GRAFT_CPUS)
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "4000000").toLong
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_HOT_PCT", "80").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def frame(n: Long, payloadName: String) = spark.range(n).select(
      when(pmod(xxhash64(col("id"), lit(payloadName)), lit(100)) < hotPct, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(payloadName), lit("k")), lit(1000L)))
        .as("user_id"),
      timestamp_micros(pmod(xxhash64(col("id"), lit(payloadName), lit("t")),
        lit(1000000000L))).as("ts"),
      col("id").as(payloadName))
    val right = frame(rows, "p").localCheckpoint()
    val left = frame(rows / 10, "v").localCheckpoint()

    // BROADCAST arm (SPARK_GRAFT_BCAST=1): dimension-sized right
    // (rows/80 ~ 50k at the default 4M) against the same skewed left —
    // the regime BroadcastAsOfJoinExec exists for. Compares the
    // broadcast index (fact side: no exchange, no sort) against the
    // merge exec (fact side: one exchange + sort) on identical data;
    // the matched/sum cross-check pins semantic agreement.
    if (sys.env.get("SPARK_GRAFT_BCAST").contains("1")) {
      val smallRight = frame(rows / 80, "p").localCheckpoint()
      def viaBcast() = graft.plans.NativeAsOfJoin
        .asOfBroadcast(left, smallRight, Seq("user_id"), "ts", Seq("p"),
          tieBreak = Some("p"))
        .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
          coalesce(sum(col("asof_p")), lit(0L)).as("s"))
      def viaMerge() = graft.plans.NativeAsOfJoin
        .asOf(left, smallRight, "user_id", "ts", Seq("p"),
          tieBreak = Some("p"),
          strategy = graft.plans.AsOfPhysicalStrategy.Merge)
        .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
          coalesce(sum(col("asof_p")), lit(0L)).as("s"))
      def t3(mk: () => org.apache.spark.sql.DataFrame): (Double, Long, Long, Long) = {
        var best = Double.MaxValue
        var mm = 0L; var nn = 0L; var ss = 0L
        (1 to 3).foreach { _ =>
          val df = mk()
          val t0 = System.nanoTime()
          val r = df.collect()(0)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          mm = r.getLong(0); nn = r.getLong(1); ss = r.getLong(2)
        }
        (best, mm, nn, ss)
      }
      // AQE-FLIP leg: strategy Auto on the SAME (stats-less —
      // localCheckpoint reports defaultSizeInBytes) right side. The
      // static pick is the safe merge; once the right exchange
      // materializes under the broadcast threshold, AQE's re-plan
      // re-runs AsOfJoinStrategy with real stage stats and lands the
      // broadcast exec (spec-pinned in NativeAsOfJoinSpec). The leg's
      // time sits between merge (it skips both sorts + the merge scan)
      // and direct broadcast (it still pays the two already-submitted
      // shuffles the static plan requested).
      // rebuilt RDD-backed so the planner sees NO size information
      // (localCheckpoint reports accurate stats, which would let Auto
      // broadcast statically and measure nothing)
      val statslessRight = spark.createDataFrame(smallRight.rdd, smallRight.schema)
      def viaAutoFlip() = graft.plans.NativeAsOfJoin
        .asOf(left, statslessRight, "user_id", "ts", Seq("p"),
          tieBreak = Some("p"),
          strategy = graft.plans.AsOfPhysicalStrategy.Auto)
        .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
          coalesce(sum(col("asof_p")), lit(0L)).as("s"))
      val (tb, mb, nb, sb) = t3(viaBcast)
      val (tm, mm2, nm, sm) = t3(viaMerge)
      val (tf, mf, nf, sf) = t3(viaAutoFlip)
      require(mb == mm2 && nb == nm && sb == sm,
        s"bcast/merge disagree: ($mb/$nb/$sb) vs ($mm2/$nm/$sm)")
      require(mb == mf && nb == nf && sb == sf,
        s"bcast/autoflip disagree: ($mb/$nb/$sb) vs ($mf/$nf/$sf)")
      println(s"""{"bench":"asof_skew_bcast","rows":$rows,"hot_pct":$hotPct,""" +
        s""""right_rows":${rows / 80},""" +
        s""""bcast_sec":${math.round(tb * 100) / 100.0},""" +
        s""""merge_sec":${math.round(tm * 100) / 100.0},""" +
        s""""autoflip_sec":${math.round(tf * 100) / 100.0},""" +
        s""""matched":$mb,"left_rows":$nb,""" +
        s""""speedup":${math.round(tm / tb * 100) / 100.0}}""")
      spark.stop()
      return
    }

    // COMPOSITE-key arm (SPARK_GRAFT_COMPOSITE=1): the same skewed
    // workload keyed on (user_id, device STRING) — the key-compare
    // cost regime the merge's composite generalization pays per row
    // (three key evaluations per advance instead of one). Prints its
    // own JSON line and exits; the default single-key line stays
    // byte-stable for PERF_NOTES comparisons.
    if (sys.env.get("SPARK_GRAFT_COMPOSITE").contains("1")) {
      def cframe(n: Long, payloadName: String) = frame(n, payloadName)
        .withColumn("device", concat(lit("dev-"),
          pmod(xxhash64(col(payloadName), lit("d")), lit(4L))))
      val cr = cframe(rows, "p").localCheckpoint()
      val cl = cframe(rows / 10, "v").localCheckpoint()
      def cnative() = graft.plans.NativeAsOfJoin
        .asOfKeys(cl, cr, Seq("user_id", "device"), "ts", Seq("p"),
          tieBreak = Some("p"),
          strategy = graft.plans.AsOfPhysicalStrategy.Merge)
        .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
          coalesce(sum(col("asof_p")), lit(0L)).as("s"))
      var best = Double.MaxValue
      var mm = 0L; var nn = 0L; var ss = 0L
      (1 to 3).foreach { _ =>
        val df = cnative()
        val t0 = System.nanoTime()
        val r = df.collect()(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        mm = r.getLong(0); nn = r.getLong(1); ss = r.getLong(2)
      }
      println(s"""{"bench":"asof_skew_composite","rows":$rows,""" +
        s""""hot_pct":$hotPct,"native_sec":${math.round(best * 100) / 100.0},""" +
        s""""matched":$mm,"left_rows":$nn,"payload_sum":$ss}""")
      spark.stop()
      return
    }

    def native() = graft.plans.NativeAsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("p"), tieBreak = Some("p"),
        strategy = graft.plans.AsOfPhysicalStrategy.Merge)
      .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
        coalesce(sum(col("asof_p")), lit(0L)).as("s"))
    def composed() = graft.operators.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("p"), tieBreak = Some("p"))
      .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
        coalesce(sum(col("asof_p")), lit(0L)).as("s"))

    // a FRESH DataFrame per run: re-collecting one Dataset object reuses
    // its AQE-materialized shuffle stages and times only the tail stage
    def time3(mk: () => org.apache.spark.sql.DataFrame): (Double, Long, Long, Long) = {
      var best = Double.MaxValue
      var mm = 0L; var nn = 0L; var ss = 0L
      (1 to 3).foreach { _ =>
        val df = mk()
        val t0 = System.nanoTime()
        val r = df.collect()(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        mm = r.getLong(0); nn = r.getLong(1); ss = r.getLong(2)
      }
      (best, mm, nn, ss)
    }
    def nativeNearest() = graft.plans.NativeAsOfJoin
      .asOfNearest(left, right, "user_id", "ts", Seq("p"), tieBreak = Some("p"),
        strategy = graft.plans.AsOfPhysicalStrategy.Merge)
      .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
        coalesce(sum(col("asof_p")), lit(0L)).as("s"))
    def composedNearest() = graft.operators.AsOfJoin
      .asOfNearest(left, right, "user_id", "ts", Seq("p"), tieBreak = Some("p"))
      .agg(count(col("asof_p")).as("m"), count(lit(1)).as("n"),
        coalesce(sum(col("asof_p")), lit(0L)).as("s"))

    val (tn, mn, nn, sn) = time3(native)
    val (tc, mc, nc, sc) = time3(composed)
    require(mn == mc && nn == nc && sn == sc,
      s"spellings disagree: native ($mn/$nn/$sn) vs composed ($mc/$nc/$sc)")
    // nearest arm: the composed spelling pays TWO window passes over
    // the skewed key; the merge holds one extra candidate — same O(1)
    val (tnn, mnn, nnn, snn) = time3(nativeNearest)
    val (tcn, mcn, ncn, scn) = time3(composedNearest)
    require(mnn == mcn && nnn == ncn && snn == scn,
      s"nearest spellings disagree: native ($mnn/$nnn/$snn) vs composed ($mcn/$ncn/$scn)")
    println(s"""{"bench":"asof_skew","rows":$rows,"hot_pct":$hotPct,""" +
      s""""native_sec":${math.round(tn * 100) / 100.0},""" +
      s""""composed_sec":${math.round(tc * 100) / 100.0},""" +
      s""""matched":$mn,"left_rows":$nn,""" +
      s""""speedup":${math.round(tc / tn * 100) / 100.0},""" +
      s""""nearest_native_sec":${math.round(tnn * 100) / 100.0},""" +
      s""""nearest_composed_sec":${math.round(tcn * 100) / 100.0},""" +
      s""""nearest_matched":$mnn,""" +
      s""""nearest_speedup":${math.round(tcn / tnn * 100) / 100.0}}""")
    spark.stop()
  }
}
