package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import graft.ops.CoreOps.dsum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream queries (SURVEY.md §2.10): batch equivalents of the
  * Structured Streaming surface, oracle-checked — the streaming variants
  * run the same aggregations through `readStream` in StreamingSpec
  * (identical semantics by construction, same window functions).
  */
object EventQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling window aggregation — batch twin of StreamingOps.tumblingAgg.
    "q_tumbling_window" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // Sliding window (1h window, 30m slide): each event lands in 2 windows.
    "q_sliding_window" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n"))
        .orderBy("window_start")
    },

    // Sessionization: gap > 30 min starts a new session; classic
    // lag + cumulative-flag-sum, one shuffle on user_id.
    "q_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy("user_id", "session_id")
    },

    // Native session_window (gap-merge sessions as a grouping function)
    // — the same sessions q_sessionize derives with lag + cumulative
    // flag, cross-validated against one boundary-exact oracle.
    // (Boundary note, VERIFIED empirically on this Spark: an event
    // arriving exactly `gap` after its predecessor MERGES into the
    // session — Spark merges when next.start <= prev.end, i.e. the
    // window-end exclusivity does NOT govern merging; events at 00:00
    // and 00:30 with a 30-min gap yield ONE session [00:00, 01:00) of
    // n=2. The lag-form `> gap` new-session predicate is therefore the
    // exact encoding for both queries at every boundary.)
    "q_session_window" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // Latest record per key — CDC/changelog compaction: one window
    // shuffle on the key, row_number desc = 1. At scale this is the
    // standard upsert-table read path (Delta/Hudi snapshot semantics).
    "q_latest_per_key" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, dir, "events")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          col("event_type"), col("value"))
        .orderBy("user_id")
    },

    // Mergeable-sketch rollup — THE incremental pattern at 100 TB: each
    // day (standing in for a bronze-table partition) builds a tiny HLL
    // sketch of its users ONCE; later rollups union the SKETCHES
    // (register-wise max — lossless, associative, commutative) instead
    // of rescanning raw events. Union-of-daily == direct-over-all
    // exactly at equal lgK (asserted in SketchSpec); the estimate is
    // approximate against true counts, so rows-only at the oracle.
    "q_sketch_merge" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("est_users"))
        .orderBy("event_type")
    },

    // Ordered-step funnel (view -> click -> purchase): per user the
    // first click at-or-after the first view, then the first purchase
    // at-or-after that click, folded in ONE scan — running conditional
    // minima over a single user-partitioned window. Because events are
    // time-ordered within the partition, each stage's running min
    // freezes at the first qualifying event, so stage N's predicate can
    // reference stage N-1's column directly (Catalyst stacks the three
    // window projects over one exchange+sort on user_id). The per-user
    // rollup and the final 3-row unpivot reuse that partitioning — at
    // 100 TB the whole funnel is one shuffle on user_id plus a tiny
    // global agg, the shape funnels must have (never a per-stage
    // self-join, which would rescan the fact table once per step).
    "q_funnel" -> { (s, dir) =>
      val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(run))
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("ts") >= col("t_view"),
            col("ts"))).over(run))
        .withColumn("t_buy",
          min(when(col("event_type") === "purchase" && col("ts") >= col("t_click"),
            col("ts"))).over(run))
        .groupBy(col("user_id"))
        .agg(min(col("t_view")).as("t1"), min(col("t_click")).as("t2"),
          min(col("t_buy")).as("t3"))
        .agg(count(col("t1")).as("n_view"), count(col("t2")).as("n_click"),
          count(col("t3")).as("n_buy"))
        .selectExpr("stack(3, 1L, 'view', n_view, 2L, 'click', n_click, " +
          "3L, 'purchase', n_buy) AS (step, stage, n_users)")
        .orderBy("step")
    },

    // Cohort retention: users grouped by first-active week, activity
    // counted per (cohort, weeks-since) cell. The (user, week) activity
    // grid is distinct-ed FIRST (shrinks events to at most
    // users x weeks rows before anything else touches it); the first-
    // seen dim derives from that grid and broadcasts back (per-user
    // one-row dim — if the user dim outgrows the broadcast threshold at
    // scale, the same plan degrades to a co-partitioned shuffle join on
    // user_id, still one fact-table scan).
    "q_cohort_retention" -> { (s, dir) =>
      val active = Tables(s, dir, "events")
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val firstSeen = active.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      active.join(broadcast(firstSeen), Seq("user_id"))
        .groupBy(col("cohort_wk"),
          floor(datediff(col("wk"), col("cohort_wk")) / 7).cast(LongType).as("week_no"))
        // plain count, not count_distinct: the activity grid is already
        // distinct per (user, wk) and a user has exactly one cohort, so
        // each (cohort, week_no, user) triple occurs once — same number,
        // one less shuffle (count_distinct would expand to two).
        .agg(count(lit(1)).as("n_active"))
        .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
          col("week_no"), col("n_active"))
        .orderBy("cohort_week", "week_no")
    },

    // Cohort LTV curve — q_cohort_retention's revenue twin: cumulative
    // value per ORIGINAL cohort member by weeks-since-acquisition (the
    // "when does a cohort pay back" curve). Weekly value sums are
    // decimal-exact; the cumulative runs on the tiny cohort × week
    // domain; the denominator is the WEEK-0 cohort size (not the
    // still-active count), so the curve reads as LTV per acquired user.
    "q_cohort_ltv" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"),
          col("value").cast(DecimalType(18, 4)).as("v"))
      val firstSeen = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val sized = firstSeen.groupBy(col("cohort_wk"))
        .agg(count(lit(1)).as("cohort_size"))
      val wCum = Window.partitionBy(col("cohort_wk")).orderBy(col("week_no"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // firstSeen is one row PER USER — at fleet user counts that is
      // not broadcastable; the shuffle join on user_id is the scale
      // shape (the weekly aggregate pays a shuffle anyway)
      e.join(firstSeen, Seq("user_id"))
        .groupBy(col("cohort_wk"),
          floor(datediff(col("wk"), col("cohort_wk")) / 7).cast(LongType).as("week_no"))
        .agg(sum(col("v")).as("wk_value"))
        .withColumn("cum_value", sum(col("wk_value")).over(wCum))
        .join(broadcast(sized), Seq("cohort_wk"))
        .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
          col("week_no"), col("cohort_size"),
          col("wk_value").cast(DoubleType).as("wk_value"),
          (col("cum_value").cast(DoubleType) / col("cohort_size"))
            .as("ltv_per_user"))
        .orderBy("cohort_week", "week_no")
    },

    // SCD type-2 compaction: collapse the event changelog into validity
    // ranges [valid_from, valid_to) per consecutive run of equal state
    // (event_type standing in for the tracked attribute). Change-flag
    // via lag + cumulative sum = run id (the sessionize skeleton), one
    // row per run, valid_to = next run's valid_from via lead. ONE
    // shuffle on user_id serves the lag window, the run groupBy, and
    // the lead window — the standard changelog -> dimension-history
    // build, and the read-side inverse of q_latest_per_key.
    "q_scd2" -> { (s, dir) =>
      val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
      scd2Versions(s, dir)
        .withColumn("vt", lead(col("vf"), 1).over(wv))
        .select(col("user_id"), col("version"), col("state"),
          date_format(col("vf"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("vt"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("vt").isNull.as("is_current"), col("n_events"))
        .orderBy("user_id", "version")
    },

    // Point-in-time enrichment — the READ side of SCD2, and the join
    // every feature store must get right (training-serving skew is
    // exactly a PIT-join bug): each purchase picks up the user-state
    // version in force at its timestamp via the backward as-of
    // operator, never a future version (no leakage) and never a stale
    // re-read after compaction. Composes scd2Versions (one user_id
    // exchange) with the NATIVE as-of exec (plans/NativeAsOfJoin) —
    // the production consumer of the streaming-merge operator: the
    // version side arrives already clustered on user_id from the scd2
    // window exchange, so the as-of adds only the purchase-side
    // exchange, and a user hot enough to buffer in WindowExec costs
    // the merge O(1) state instead. No interval blow-up, no per-row
    // range scan, no WindowExec beyond the scd2 build's own two
    // (pinned in ExplainSpec).
    "q_pit_enrich" -> { (s, dir) =>
      // negv: ties at equal vf (two state changes in the same
      // microsecond) must pick the LATEST version — the oracle's
      // `ORDER BY vf DESC, version DESC` — and the as-of tie-break is
      // min-wins, so negate; without it the pick at a tie is
      // partition-order-nondeterministic.
      val versions = scd2Versions(s, dir)
        .select(col("user_id"), col("vf").as("ts"),
          col("version"), col("state"), (-col("version")).as("negv"))
      val purchases = Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      // strategy pinned to Merge: at production scale both sides are
      // fact-sized (the scd2 timeline grows with the event log), so the
      // Auto pick at tiny test SFs (broadcast) would pin the WRONG
      // 100 TB plan shape in ExplainSpec
      graft.plans.NativeAsOfJoin.asOf(purchases, versions, "user_id", "ts",
          Seq("version", "state"), tieBreak = Some("negv"),
          strategy = graft.plans.AsOfPhysicalStrategy.Merge)
        .select(col("user_id"), col("event_id"),
          col("asof_version").as("version"), col("asof_state").as("state"))
        .orderBy("event_id")
    },

    // Robust per-key anomaly flagging: modified z-score against the
    // per-user median/MAD (outlier-resistant, unlike mean/stddev which
    // the outliers themselves drag). Both medians run as window
    // aggregates over the SAME user_id partitioning — one exchange, one
    // fact-table scan, no stats-table join-back. Per-key memory is the
    // percentile buffer (rows per user), the same bound the groupBy
    // formulation has; keys too hot for that get pre-aggregated
    // value-histogram medians instead.
    "q_anomaly_mad" -> { (s, dir) =>
      val wU = Window.partitionBy(col("user_id"))
      Tables(s, dir, "events")
        .withColumn("med", median(col("value")).over(wU))
        .withColumn("mad", median(abs(col("value") - col("med"))).over(wU))
        .filter(col("mad") > 0)
        .withColumn("score",
          round(abs(col("value") - col("med")) / (lit(1.4826) * col("mad")), 6))
        .filter(col("score") > 3.0)
        .select(col("user_id"), col("event_id"), col("value"), col("score"))
        .orderBy("user_id", "event_id")
    },

    // Association rules over daily event baskets (market-basket
    // support / confidence / lift): basket = distinct (user, day,
    // type); co-occurrence via a basket-keyed self-join (the baskets
    // frame is localCheckpointed — a self-join would otherwise re-plan
    // its scan+distinct subtree twice, and unlike .cache() the
    // checkpoint frees with stage GC instead of pinning executor
    // memory for the life of a shared catalog-running session); item
    // counts and the basket total broadcast back onto the (tiny) pair
    // matrix. Every metric is a per-row ratio of exact counts —
    // deterministic, round(6) only for display.
    "q_basket_rules" -> { (s, dir) =>
      val b = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
        .distinct().localCheckpoint()
      val tot = Tables(s, dir, "events")
        .agg(count_distinct(col("user_id"), to_date(col("ts"))).as("n_baskets"))
      val itemN = b.groupBy("event_type").agg(count(lit(1)).as("n_item"))
      // pairs is branched twice into `rules` below — checkpointing the
      // |event-types|^2-bounded matrix runs the basket self-join ONCE
      val pairs = b.as("x").join(b.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.day") === col("y.day") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .localCheckpoint()
      val rules = pairs
        .select(col("a").as("ante"), col("b").as("conseq"), col("n_ab"))
        .unionByName(pairs
          .select(col("b").as("ante"), col("a").as("conseq"), col("n_ab")))
      rules
        .join(broadcast(itemN.withColumnRenamed("event_type", "ante")
          .withColumnRenamed("n_item", "n_ante")), Seq("ante"))
        .join(broadcast(itemN.withColumnRenamed("event_type", "conseq")
          .withColumnRenamed("n_item", "n_conseq")), Seq("conseq"))
        .crossJoin(broadcast(tot))
        .filter(col("n_ab") >= 5)
        .select(col("ante"), col("conseq"), col("n_ab"),
          round(col("n_ab").cast(DoubleType) / col("n_baskets"), 6).as("support"),
          round(col("n_ab").cast(DoubleType) / col("n_ante"), 6).as("confidence"),
          round(col("n_ab") * col("n_baskets").cast(DoubleType) /
            (col("n_ante") * col("n_conseq")), 6).as("lift"))
        .orderBy(desc("lift"), asc("ante"), asc("conseq"))
        .limit(20)
    },

    // Per-user EWMA (alpha = 0.25) over the event-time-ordered value
    // sequence — per-entity sequential recursion, the smoothing pass a
    // window function cannot express (each state depends on the
    // previous OUTPUT, not a frame of inputs). Shape: one shuffle to
    // collect each user's (bounded) sequence in-row, then a sequential
    // fold per row — deterministic in both engines (identical IEEE op
    // order), so the oracle matches unrounded. Per-key memory is
    // bounded by the user's event count; an unbounded-key stream would
    // use the incremental closed form instead.
    "q_ewma" -> { (s, dir) =>
      val sorted = array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("value"))))
      val vals = transform(col("evs"), e => e.getField("value"))
      Tables(s, dir, "events")
        .groupBy("user_id").agg(sorted.as("evs"))
        .select(col("user_id"), size(col("evs")).cast("long").as("n_events"),
          aggregate(
            slice(vals, lit(2), size(col("evs")) - 1),
            element_at(vals, 1),
            (acc, x) => lit(0.75) * acc + lit(0.25) * x).as("ewma"))
        .orderBy("user_id")
    },

    // Event-path transition matrix: per-user event sequences (ts,
    // event_id total order) -> (event_type, next_type) counts and
    // row-normalized transition probabilities — the Markov path-mining
    // pass behind "what do users do after X" analytics. One user-keyed
    // window for lead(), then a pair aggregate; the probability
    // normalizer is a window over the (tiny) pair matrix, not the data.
    "q_event_paths" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n").cast(DoubleType) /
          sum(col("n")).over(Window.partitionBy("event_type")), 6))
        .orderBy("event_type", "next_type")
    },

    // k-anonymity audit over quasi-identifiers — the privacy QA a
    // training set runs before release (Sweeney 2002): a (event_type,
    // day, value-decile) combination shared by fewer than k=5 distinct
    // users is a re-identification handle. TWO-LEVEL aggregate (the
    // q_dup_rate discipline — per-user rows first, then the combo
    // rollup), so the distinct-user count needs no Expand and the first
    // exchange combines map-side on the (combo, user) grain.
    "q_k_anonymity" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          floor(col("value") / 10).cast(LongType).as("vbucket"), col("user_id"))
        .groupBy("event_type", "day", "vbucket", "user_id")
        .agg(count(lit(1)).as("c"))
        .groupBy("event_type", "day", "vbucket")
        .agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_rows"))
        .withColumn("risky", col("n_users") < 5)
        .orderBy("event_type", "day", "vbucket")
    },

    // Time-series gap fill + forward fill, SINGLE-SCAN: each observed
    // hour expands the gap run it terminates (the hours since the
    // previous observation) via one generator, carrying the running
    // last non-null sum. Semantically identical to the textbook
    // spine + left-join + running-last form — but that form's "shared"
    // hourly subtree is NOT shared after optimization (Catalyst
    // collapses the spine's min/max aggregate straight onto the raw
    // scan, so events was scanned and aggregated TWICE, then broadcast-
    // joined); this shape is one scan, one agg exchange, one window
    // exchange. At 100 TB the second full pass over the fact table is
    // the difference that matters.
    "q_gap_fill" -> { (s, dir) =>
      val hourly = Tables(s, dir, "events")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
        .agg(dsum(col("value")).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // pinKeyed (r20): the window stage also runs the hour-spine
      // explode + date_format — AQE byte-coalesced it to one task on
      // this byte-light frame; the explicit user_id repartition IS the
      // window's required distribution (no extra exchange), just
      // non-coalescible
      graft.ops.CoreOps.pinKeyed(hourly, col("user_id"))
        .withColumn("prev_hr", lag(col("hr"), 1).over(w))
        // running fill INCLUDING the current row (for the observed hour
        // itself), lagged once for the gap hours before it — null-sum
        // hours stay gaps and inherit the last non-null fill, exactly
        // like the running-last-over-spine formulation
        .withColumn("fill", last(col("v"), ignoreNulls = true).over(wRun))
        .withColumn("prev_fill", lag(col("fill"), 1).over(w))
        .select(col("user_id"), col("hr"), col("v"), col("fill"), col("prev_fill"),
          explode(sequence(
            coalesce(col("prev_hr") + expr("interval 1 hour"), col("hr")),
            col("hr"), expr("interval 1 hour"))).as("h"))
        .select(col("user_id"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          when(col("h") === col("hr"), col("fill"))
            .otherwise(col("prev_fill")).as("value_filled"),
          (col("h") =!= col("hr") || col("v").isNull).as("is_gap"),
          col("h"))
        // sort on the 8-byte timestamp, not the 19-char string — same
        // total order (the format is monotonic in h), cheaper compares
        // and range-sampler keys
        .orderBy("user_id", "h")
        .select("user_id", "hour", "value_filled", "is_gap")
    },

    // Longest consecutive-day activity streak per user — the classic
    // gaps-and-islands reduction: distinct active days, then
    // (day - row_number) is CONSTANT exactly along a run of consecutive
    // dates, so one groupBy on that anchor measures every streak.
    // Two narrow shuffles total: the (user, day) distinct and the
    // per-user window; both island grouping and the final per-user
    // rollup reuse the user_id hash partitioning (HashPartitioning on a
    // PREFIX of the grouping keys satisfies the clustered distribution,
    // so Catalyst plans no third exchange).
    "q_streak" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("rn", row_number().over(w))
        .withColumn("anchor", date_sub(col("day"), col("rn")))
        .groupBy(col("user_id"), col("anchor"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest_streak"),
          sum(col("len")).as("n_active_days"))
        .orderBy("user_id")
    },

    // Lag-k autocorrelation (ACF at lags 1..3) of the daily event-count
    // series per event_type — the seasonality probe behind drift/anomaly
    // monitors. Determinism design: daily counts are INTEGERS, so all
    // five co-moments (Σx, Σy, Σxy, Σx², Σy²) are summed exactly as
    // BIGINTs — order-free under partial aggregation — and Pearson r is
    // ONE double formula over exact integers, so any engine computes the
    // identical bits (the usual corr() accumulate-in-doubles hazard
    // never arises). Lags pair adjacent OBSERVED days (the series here
    // is gapless; a gapped series would gap-fill first, see q_gap_fill).
    "q_autocorr" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
      val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)) *
        sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType))
      daily
        .withColumn("l1", lag(col("c"), 1).over(w))
        .withColumn("l2", lag(col("c"), 2).over(w))
        .withColumn("l3", lag(col("c"), 3).over(w))
        .select(col("event_type"), explode(array(
          struct(lit(1L).as("lg"), col("c").as("x"), col("l1").as("y")),
          struct(lit(2L).as("lg"), col("c").as("x"), col("l2").as("y")),
          struct(lit(3L).as("lg"), col("c").as("x"), col("l3").as("y")))).as("p"))
        .select(col("event_type"), col("p.lg").as("lag"),
          col("p.x").as("x"), col("p.y").as("y"))
        .filter(col("y").isNotNull)
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("lag"), col("n"),
          when(den === 0.0, lit(null)).otherwise(num / den).as("acf"))
        .orderBy("event_type", "lag")
    },

    // Cross-correlation (CCF) between the view and purchase daily count
    // series at lags −3..3 — "does view activity LEAD purchases" (peak
    // at positive lag = views precede). Same exact-integer co-moment
    // discipline as q_autocorr: the day join aligns x_t with y_{t+k},
    // all five sums are exact BIGINTs, Pearson r is one double formula.
    "q_lag_corr" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val x = daily.filter(col("event_type") === "view")
        .select(unix_date(col("day")).cast(LongType).as("d"), col("c").as("x"))
      val y = daily.filter(col("event_type") === "purchase")
        .select(unix_date(col("day")).cast(LongType).as("dy"), col("c").as("y"))
      val lags = explode(sequence(lit(-3L), lit(3L))).as("lag")
      val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
      val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)) *
        sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType))
      x.select(col("d"), col("x"), lags)
        .join(y, col("dy") === col("d") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lag"), col("n"),
          when(den === 0.0, lit(null)).otherwise(num / den).as("ccf"))
        .orderBy("lag")
    },

    // Inter-arrival gap distribution per user (median / IQR / mean of
    // microsecond gaps) — the burstiness profile behind rate-limit and
    // engagement models. One user-keyed window for lag, then one
    // aggregate that REUSES the window's hash partitioning (no second
    // exchange). Determinism: gaps are integer micros, and the
    // quantile probes are dyadic (0.25/0.5/0.75), so the interpolated
    // values are exact doubles in any engine.
    "q_interarrival" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("gap").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          percentile(col("gap"), lit(0.5)).as("median_gap_us"),
          (percentile(col("gap"), lit(0.75)) - percentile(col("gap"), lit(0.25)))
            .as("iqr_gap_us"),
          (sum(col("gap")).cast(DoubleType) / count(lit(1))).as("mean_gap_us"))
        .orderBy("user_id")
    },

    // Welch's two-sample t-statistic per event_type (variant = user_id
    // parity — the deterministic stand-in for an assignment column):
    // the A/B-significance primitive. Scale + determinism design: ONE
    // conditional-aggregation shuffle (no pivot, no per-variant scan);
    // values quantized to an exact 1e6 grid so Σx and Σx² are exact
    // integers (DECIMAL(38) for the squares — they pass 2^63 at fleet
    // row counts), and the t formula is one identically-shaped double
    // expression over correctly-rounded casts in both engines.
    "q_ab_test" -> { (s, dir) =>
      val dec = DecimalType(38, 0)
      def f(variant: Int, e: Column) = sum(when(col("variant") === variant, e))
      def cnt(variant: Int) = count(when(col("variant") === variant, lit(1)))
      def mean(sx: Column, n: Column) = sx.cast(DoubleType) / (n * lit(1e6))
      def varTerm(q: Column, sx: Column, n: Column) =
        (q * n - sx.cast(dec) * sx).cast(DoubleType) /
          (n.cast(DoubleType) * n * (n - lit(1)) * lit(1e12))
      Tables(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 2).as("variant"),
          floor(col("value") * lit(1000000) + lit(0.5)).cast(LongType).as("gv"))
        .groupBy(col("event_type"))
        .agg(cnt(0).as("n_a"), cnt(1).as("n_b"),
          f(0, col("gv")).as("sa"), f(1, col("gv")).as("sb"),
          f(0, (col("gv") * col("gv")).cast(dec)).as("qa"),
          f(1, (col("gv") * col("gv")).cast(dec)).as("qb"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          mean(col("sa"), col("n_a")).as("mean_a"),
          mean(col("sb"), col("n_b")).as("mean_b"),
          ((mean(col("sa"), col("n_a")) - mean(col("sb"), col("n_b"))) /
            sqrt(varTerm(col("qa"), col("sa"), col("n_a")) +
              varTerm(col("qb"), col("sb"), col("n_b")))).as("t_welch"))
        .orderBy("event_type")
    },

    // CUSUM change-point probe on the daily count series per
    // event_type: the k with the largest |Σ_{i<=k}(c_i − mean)| marks
    // the most likely level shift. Exactness trick: cusum_k scaled by
    // n is the INTEGER n·prefix_k − k·S, so the argmax ordering (and
    // the reported peak) involves no accumulated float error at all —
    // engines agree bit-for-bit. All four windows share one
    // event_type-hash exchange.
    "q_cusum" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("prefix",
          sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("k", row_number().over(w).cast(LongType))
        .withColumn("s", sum(col("c")).over(wAll))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("scaled", col("n") * col("prefix") - col("k") * col("s"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(abs(col("scaled")).desc, col("day").asc)))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
          (col("scaled").cast(DoubleType) / col("n")).as("cusum_peak"))
        .orderBy("event_type")
    },

    // Day-of-week seasonality profile: per (event_type, weekday) mean
    // daily count and the seasonal index (weekday mean / overall mean).
    // Exchange discipline: the per-type totals window runs BEFORE the
    // (type, dow) regroup, so the final groupBy reuses the window's
    // type-hash partitioning (prefix-key elision) — three exchanges
    // total including the output sort. All ratios divide exact integer
    // sums in the same shape both engines.
    "q_seasonality" -> { (s, dir) =>
      val wAll = Window.partitionBy(col("event_type"))
      Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("s_all", sum(col("c")).over(wAll))
        .withColumn("n_all", count(lit(1)).over(wAll))
        .withColumn("dow", weekday(col("day")).cast(LongType))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sum_events"),
          max(col("s_all")).as("s_all"), max(col("n_all")).as("n_all"))
        .select(col("event_type"), col("dow"), col("n_days"), col("sum_events"),
          (col("sum_events").cast(DoubleType) / col("n_days")).as("avg_events"),
          ((col("sum_events").cast(DoubleType) / col("n_days")) /
            (col("s_all").cast(DoubleType) / col("n_all"))).as("seasonal_idx"))
        .orderBy("event_type", "dow")
    },

    // Per-user Shannon entropy of the event-type mix (+ normalized by
    // ln k) — the behavioral-diversity signal. The -p·ln p terms are a
    // cross-row double sum, so they go through the shared exact-grid
    // idiom (GridSum) and a final round(6) absorbs any residual
    // last-ulp libm ln() disagreement between engines — the same
    // discipline as q_drift_psi's (s-p)·ln(s/p) terms.
    "q_entropy" -> { (s, dir) =>
      val wUser = Window.partitionBy(col("user_id"))
      val p = col("c").cast(DoubleType) / col("n")
      Tables(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(wUser))
        .withColumn("k", count(lit(1)).over(wUser))
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n_events"), max(col("k")).as("n_types"),
          GridSum.exactGridSum(-p * log(p)).as("hg"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          round(GridSum.fromGrid(col("hg")), 6).as("entropy"),
          when(col("n_types") === 1, lit(0.0))
            .otherwise(round(GridSum.fromGrid(col("hg")) /
              log(col("n_types").cast(DoubleType)), 6)).as("entropy_norm"))
        .orderBy("user_id")
    },

    // Seasonal-naive forecast backtest: predict each day's count with
    // the count 7 days earlier, score MAE against the lag-1 naive
    // baseline (skill = 1 − mae7/mae1). Errors are INTEGER count
    // differences, so every aggregate is exact and the skill ratio is
    // one deterministic double division. The lag window and the final
    // per-type aggregate share one event_type exchange.
    "q_forecast_backtest" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("l7", lag(col("c"), 7).over(w))
        .withColumn("l1", lag(col("c"), 1).over(w))
        .filter(col("l7").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_evals"),
          sum(abs(col("c") - col("l7"))).as("ae7"),
          sum(abs(col("c") - col("l1"))).as("ae1"),
          sum(col("c") - col("l7")).as("e7"))
        .select(col("event_type"), col("n_evals"),
          (col("ae7").cast(DoubleType) / col("n_evals")).as("mae_seasonal"),
          (col("ae1").cast(DoubleType) / col("n_evals")).as("mae_naive"),
          (col("e7").cast(DoubleType) / col("n_evals")).as("mean_bias"),
          when(col("ae1") === 0, lit(null)).otherwise(
            lit(1.0) - col("ae7").cast(DoubleType) / col("ae1")).as("skill"))
        .orderBy("event_type")
    },

    // Growth accounting: DAU, rolling 7-day WAU, new users, cumulative
    // users per day. Scale design: ONE distinct over (user, day)
    // collapses the event stream; everything after runs on that
    // activity grid. Rolling distinct counts can't be windowed
    // directly, so each activity row is EXPANDED into the ≤7 report
    // days it covers and deduped — bounded 7x inflation of the grid,
    // exact, instead of a per-day distinct rescan. The cumulative sum
    // is a window over the |days|-sized daily frame (aggregated-domain
    // pattern). first-seen day doubles as the new-user flag, so no
    // second pass over raw events anywhere.
    "q_growth_accounting" -> { (s, dir) =>
      val acts = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .localCheckpoint() // branched 3x (dau, wau expansion, first-seen)
      val dau = acts.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = acts
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      val newByDay = acts.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      // BOUNDED global window: input is the daily grid, |days| rows
      // (calendar-bounded, not corpus-bounded) — ExplainSpec allowlist
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(wau, Seq("day")).join(newByDay, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_users", sum(col("new_users")).over(wCum))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"), col("new_users"), col("cum_users"))
        .orderBy("day")
    },

    // Mann–Whitney U / AUC per event_type — the nonparametric location
    // test (and the probability a random A value beats a random B one,
    // i.e. the ROC-AUC effect size). Determinism: doubled midranks of
    // tied blocks are INTEGERS on the shared value grid — 2·midrank =
    // 2·cum − block + 1 — so the rank sum is exact (DECIMAL at fleet
    // counts) and U/AUC are two final double divisions. Same one
    // event_type exchange as the KS test.
    "q_mannwhitney" -> { (s, dir) =>
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy(col("event_type")).orderBy(col("gv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      Tables(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 2).as("variant"),
          floor(col("value") * lit(1000000) + lit(0.5)).cast(LongType).as("gv"))
        .groupBy(col("event_type"), col("gv"))
        .agg(count(when(col("variant") === 0, lit(1))).as("ca"),
          count(when(col("variant") === 1, lit(1))).as("cb"))
        .withColumn("cum", sum(col("ca") + col("cb")).over(w))
        .withColumn("na", sum(col("ca")).over(wAll))
        .withColumn("nb", sum(col("cb")).over(wAll))
        .groupBy(col("event_type"))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum((col("ca").cast(dec) *
            (lit(2) * col("cum") - col("ca") - col("cb") + lit(1))).cast(dec))
            .as("r2a"))
        .select(col("event_type"), col("na"), col("nb"),
          ((col("r2a") - col("na").cast(dec) * (col("na") + lit(1)))
            .cast(DoubleType) / lit(2.0)).as("u_a"),
          ((col("r2a") - col("na").cast(dec) * (col("na") + lit(1)))
            .cast(DoubleType) / lit(2.0) /
            (col("na").cast(DoubleType) * col("nb"))).as("auc"))
        .orderBy("event_type")
    },

    // Two-sample Kolmogorov–Smirnov distance per event_type — "did the
    // treatment change the SHAPE of the value distribution", which
    // mean-based tests miss. Exactness: both ECDFs live on the shared
    // integer value grid, and the sup-distance is maximized on the
    // CROSS-MULTIPLIED integer numerator |Fa·na·nb − Fb·na·nb| =
    // |ca·nb − cb·na| (DECIMAL — it passes int64 at fleet counts), so
    // the argmax involves no float at all; ONE division at the end.
    // The cumsum window and final max share one event_type exchange.
    "q_ks_test" -> { (s, dir) =>
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy(col("event_type")).orderBy(col("gv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      Tables(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 2).as("variant"),
          floor(col("value") * lit(1000000) + lit(0.5)).cast(LongType).as("gv"))
        .groupBy(col("event_type"), col("gv"))
        .agg(count(when(col("variant") === 0, lit(1))).as("ca"),
          count(when(col("variant") === 1, lit(1))).as("cb"))
        .withColumn("cca", sum(col("ca")).over(w))
        .withColumn("ccb", sum(col("cb")).over(w))
        .withColumn("na", sum(col("ca")).over(wAll))
        .withColumn("nb", sum(col("cb")).over(wAll))
        .groupBy(col("event_type"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          max(abs(col("cca").cast(dec) * col("nb")
            - col("ccb").cast(dec) * col("na"))).as("dnum"))
        .select(col("event_type"), col("n_a").as("na"), col("n_b").as("nb"),
          (col("dnum").cast(DoubleType) /
            (col("n_a").cast(DoubleType) * col("n_b"))).as("ks_d"))
        .orderBy("event_type")
    },

    // CUPED variance reduction — the industry experimentation
    // methodology (Deng et al., WSDM'13): regress the experiment
    // metric on a pre-period covariate (here: first-half event count
    // vs second-half value sum), subtract θ·(x − x̄), and report
    // per-variant means/variances of both raw and adjusted metrics.
    // Determinism: θ comes from exact integer/DECIMAL co-moments (one
    // tiny reduce, broadcast back); the adjusted-metric aggregates go
    // through exact-grid sums + round, so no accumulation order leaks.
    "q_cuped" -> { (s, dir) =>
      val dec = DecimalType(38, 0)
      val cut = lit("2024-01-16").cast(DateType)
      val per = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(when(to_date(col("ts")) < cut, lit(1))).as("x"),
          coalesce(sum(when(to_date(col("ts")) >= cut,
            floor(col("value") * lit(1000000) + lit(0.5)).cast(LongType))),
            lit(0L)).as("yg"))
        .withColumn("variant", col("user_id") % 2)
        .localCheckpoint() // branched: co-moment reduce + adjusted pass
      val mom = per.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("yg")).as("sy"),
        sum((col("x") * col("yg")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
      val theta = mom.select(
        (col("sx").cast(DoubleType) / col("n")).as("xbar"),
        ((col("n").cast(DoubleType) * col("sxy").cast(DoubleType)
          - col("sx").cast(DoubleType) * col("sy")) /
          (col("n").cast(DoubleType) * col("sxx").cast(DoubleType)
            - col("sx").cast(DoubleType) * col("sx")) / lit(1e6)).as("th"))
      val adj = per.crossJoin(broadcast(theta))
        .select(col("variant"), (col("yg") / lit(1e6)).as("y"),
          (col("yg") / lit(1e6) - col("th") * (col("x") - col("xbar"))).as("ya"))
      def gsum(c: Column, g: Double): Column =
        sum(floor(c * lit(g) + lit(0.5)).cast(LongType)).cast(DoubleType) / lit(g)
      adj.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"),
          round(gsum(col("y"), 1e9) / count(lit(1)), 6).as("mean_y"),
          round(gsum(col("ya"), 1e9) / count(lit(1)), 6).as("mean_y_adj"),
          round(gsum(col("y") * col("y"), 1e3) / count(lit(1))
            - pow(gsum(col("y"), 1e9) / count(lit(1)), 2), 3).as("var_y"),
          round(gsum(col("ya") * col("ya"), 1e3) / count(lit(1))
            - pow(gsum(col("ya"), 1e9) / count(lit(1)), 2), 3).as("var_y_adj"))
        .orderBy("variant")
    },

    // Event debounce — stream cleaning: keep only the FIRST event of
    // each burst (a burst = the same 30-min-gap session q_sessionize
    // derives), collapsing retry storms and double-clicks before
    // analytics. One user window; the kept row is the session opener,
    // so the lag-gap predicate IS the filter (no second pass, and
    // semantically identical to rank-1-per-session).
    "q_debounce" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .filter(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000)
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"), col("event_type"))
        .orderBy("user_id", "event_id")
    },

    // Time-to-convert between funnel stages: per user, the delay from
    // first view to first subsequent click, and from that click to the
    // first subsequent purchase — then median/p90-free dyadic stats per
    // stage pair (median + IQR on integer microsecond deltas, exact
    // like q_interarrival). Same single-window conditional-minima fold
    // as q_funnel, so the stage times come from ONE pass.
    "q_funnel_time" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tV = min(when(col("event_type") === "view", col("ts"))).over(w)
      val base = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("t_view", tV)
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("t_view").isNotNull,
            col("ts"))).over(w))
        .withColumn("t_buy",
          min(when(col("event_type") === "purchase" && col("t_click").isNotNull,
            col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("t_view")).as("v"), max(col("t_click")).as("c"),
          max(col("t_buy")).as("b"))
      val stages = base.select(lit("view_to_click").as("stage"),
        (unix_micros(col("c")) - unix_micros(col("v"))).as("delta"))
        .filter(col("delta").isNotNull)
        .unionByName(base.select(lit("click_to_purchase").as("stage"),
          (unix_micros(col("b")) - unix_micros(col("c"))).as("delta"))
          .filter(col("delta").isNotNull))
      stages.groupBy(col("stage"))
        .agg(count(lit(1)).as("n_users"),
          percentile(col("delta"), lit(0.5)).as("median_us"),
          (percentile(col("delta"), lit(0.75)) - percentile(col("delta"), lit(0.25)))
            .as("iqr_us"))
        .orderBy("stage")
    },

    // Audience overlap: Jaccard similarity between the user sets of
    // every event-type pair — the segmentation/cannibalization view.
    // One (type, user) distinct, a self-join on user (narrow rows),
    // and per-type audience sizes broadcast onto the tiny pair matrix.
    "q_audience_overlap" -> { (s, dir) =>
      val ut = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct().localCheckpoint()
      val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val shared = ut.withColumnRenamed("event_type", "type_a")
        .join(ut.withColumnRenamed("event_type", "type_b"), Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("n_shared"))
      shared
        .join(broadcast(sizes.withColumnsRenamed(
          Map("event_type" -> "type_a", "n" -> "n_a"))), "type_a")
        .join(broadcast(sizes.withColumnsRenamed(
          Map("event_type" -> "type_b", "n" -> "n_b"))), "type_b")
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_shared"),
          (col("n_shared").cast(DoubleType) /
            (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
        .orderBy("type_a", "type_b")
    },

    // Kaplan–Meier survival curve over user lifetimes (days between
    // first and last activity; users still active on the corpus's last
    // day are right-censored) — the churn-analysis primitive. Scale
    // design: ONE per-user aggregate collapses the stream; everything
    // after runs on the |distinct lifetimes| domain (at-risk counts are
    // a suffix sum, the product Π(1−d/n) a cumulative window). The
    // product is carried as an exact-grid sum of ln terms (the GridSum
    // discipline) and exponentiated once, round(6) — so partial-agg
    // order can't perturb it and engines agree.
    "q_survival" -> { (s, dir) =>
      // BOUNDED global windows: input is the |distinct lifetimes| frame,
      // <= |days| rows (calendar-bounded) — ExplainSpec allowlist
      val wDesc = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAsc = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = Tables(s, dir, "events")
      val life = e.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"))
      val mx = e.agg(max(to_date(col("ts"))).as("corpus_max"))
      val grid = lit(1e9)
      life.crossJoin(broadcast(mx))
        .select(datediff(col("ld"), col("fd")).cast(LongType).as("t"),
          when(col("ld") === col("corpus_max"), 1L).otherwise(0L).as("censored"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_at_t"),
          sum(when(col("censored") === 0, 1L).otherwise(0L)).as("d"))
        .withColumn("n_risk", sum(col("n_at_t")).over(wDesc))
        .withColumn("g",
          when(col("d") === 0, lit(0L))
            .when(col("d") === col("n_risk"), lit(null))
            .otherwise(floor(
              log(lit(1.0) - col("d").cast(DoubleType) / col("n_risk")) * grid
                + lit(0.5)).cast(LongType)))
        .withColumn("dead",
          when(col("d") === col("n_risk"), 1L).otherwise(0L))
        .withColumn("gcum", sum(coalesce(col("g"), lit(0L))).over(wAsc))
        .withColumn("anydead", max(col("dead")).over(wAsc))
        .select(col("t").as("t_days"), col("n_risk"), col("d"),
          when(col("anydead") === 1, lit(0.0))
            .otherwise(round(exp(col("gcum").cast(DoubleType) / grid), 6))
            .as("s_km"))
        .orderBy("t_days")
    },

    // Maximum drawdown of each user's running value balance — the
    // risk/quant statistic (largest peak-to-trough decline). The whole
    // computation stays in DECIMAL(18,4): per-row cast, running sum,
    // running max, and their difference are all EXACT, so no float
    // accumulation order can perturb the max; one double cast at the
    // very end. Single user exchange drives both windows and the
    // rollup.
    "q_drawdown" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").cast(DecimalType(18, 4)).as("v"))
        .withColumn("bal", sum(col("v")).over(w))
        .withColumn("peak", max(col("bal")).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("bal")).as("peak_dec"),
          max(col("peak") - col("bal")).as("dd_dec"))
        .select(col("user_id"), col("n_events"),
          col("peak_dec").cast(DoubleType).as("peak_balance"),
          col("dd_dec").cast(DoubleType).as("max_drawdown"))
        .orderBy("user_id")
    },

    // Theil–Sen robust trend per event_type: the MEDIAN of all pairwise
    // slopes of the daily count series — outlier days can't drag it the
    // way one spike drags OLS. The pair join runs on the AGGREGATED
    // daily frame (bounded by the time span, not corpus size: ~30 days
    // → ≤435 pairs per type at any SF). The median is an explicit
    // sort + row_number + dyadic midpoint — not percentile() — so the
    // result is deterministic by construction even over arbitrary
    // double slopes (interpolation formula differences can't appear).
    "q_theil_sen" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .select(col("event_type"), unix_date(col("day")).cast(LongType).as("d"),
          col("c"))
      val a = daily.withColumnsRenamed(Map("d" -> "da", "c" -> "ca"))
      val b = daily.withColumnsRenamed(Map("d" -> "db", "c" -> "cb"))
      val slopes = a.join(b, Seq("event_type")).filter(col("da") < col("db"))
        .select(col("event_type"), col("da"), col("db"),
          ((col("cb") - col("ca")).cast(DoubleType) / (col("db") - col("da")))
            .as("slope"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("slope"), col("da"), col("db"))
      val wAll = Window.partitionBy(col("event_type"))
      slopes
        .withColumn("r", row_number().over(w).cast(LongType))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("r") === expr("(n + 1) div 2") ||
          col("r") === expr("(n + 2) div 2"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_pairs"), avg(col("slope")).as("ts_slope"))
        .orderBy("event_type")
    },

    // Last-touch conversion attribution: each purchase is credited to
    // the most recent PRECEDING non-purchase event of the same user —
    // the marketing-attribution primitive. ONE pass: a running
    // last(non-purchase, ignoreNulls) over the user timeline carries
    // the candidate credit to every purchase row (no purchases⋈events
    // self-join, no per-purchase subquery), then a tiny rollup counts
    // conversions per attributed type. Purchases with no prior touch
    // report as 'none' rather than vanishing.
    "q_attribution" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("last_touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("last_touch"), lit("none")).as("attributed_type"))
        .agg(count(lit(1)).as("n_conversions"))
        .orderBy("attributed_type")
    },

    // Chi-square 2x2 conversion test per event_type (categorical twin
    // of q_ab_test's Welch t): did users of variant A convert (emit the
    // event type at least once) at a different rate than variant B?
    // One (user, type) distinct + one conditional aggregate; the
    // variant population sizes are a 1-row broadcast. The 2x2 closed
    // form N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is computed in
    // DECIMAL(38) — (ad−bc)² overflows int64 at fleet scale — and cast
    // to double once, correctly rounded in both engines.
    "q_chi2" -> { (s, dir) =>
      val dec = DecimalType(38, 0)
      val users = Tables(s, dir, "events")
        .select(col("user_id")).distinct()
        .agg(count(when(col("user_id") % 2 === 0, lit(1))).as("n_a"),
          count(when(col("user_id") % 2 === 1, lit(1))).as("n_b"))
      val conv = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type")).distinct()
        .groupBy(col("event_type"))
        .agg(count(when(col("user_id") % 2 === 0, lit(1))).as("conv_a"),
          count(when(col("user_id") % 2 === 1, lit(1))).as("conv_b"))
      val a = col("conv_a")
      val b = col("n_a") - col("conv_a")
      val c = col("conv_b")
      val d = col("n_b") - col("conv_b")
      val n = col("n_a") + col("n_b")
      val det = a.cast(dec) * d - b.cast(dec) * c
      val denom = (a + b).cast(dec) * (c + d) * (a + c) * (b + d)
      conv.crossJoin(broadcast(users))
        .select(col("event_type"), col("n_a"), col("n_b"),
          col("conv_a"), col("conv_b"),
          (a.cast(DoubleType) / col("n_a")).as("rate_a"),
          (c.cast(DoubleType) / col("n_b")).as("rate_b"),
          when(denom === 0, lit(null)).otherwise(
            (n.cast(dec) * det * det).cast(DoubleType) /
              denom.cast(DoubleType)).as("chi2"))
        .orderBy("event_type")
    },

    // Rolling 7-day median of daily counts per event_type — the robust
    // smoother (median shrugs off the spike that drags a rolling mean).
    // No engine has a median-over-window, so the trailing 7 values are
    // collected IN-ROW (bounded: the frame is ≤ 7 elements regardless
    // of corpus size), sorted, and interpolated with the dyadic
    // midpoint rule — exact for integer counts in any engine. One
    // event_type exchange drives both the window and the output sort.
    "q_rolling_median" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      val sorted = array_sort(collect_list(col("c")).over(w))
      val m = size(col("win"))
      val med = when(m % 2 === 1,
        element_at(col("win"), ((m + 1) / 2).cast(IntegerType)).cast(DoubleType))
        .otherwise((element_at(col("win"), (m / 2).cast(IntegerType)) +
          element_at(col("win"), (m / 2 + 1).cast(IntegerType)))
          .cast(DoubleType) / lit(2.0))
      Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("win", sorted)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("c"),
          size(col("win")).cast(LongType).as("n_win"), med.as("med7"))
        .orderBy("event_type", "day")
    },

    // Union-of-intervals coverage (sweep line as windows): each lineitem
    // is a date interval [shipdate, shipdate + quantity days]; per
    // supplier, merge overlapping intervals into "islands" (an interval
    // opens a new island iff its start lies past the running max end of
    // everything before it in start order) and report distinct covered
    // days. Island membership is invariant to tie order within equal
    // (st, en) keys — a tied predecessor's end >= this start — so both
    // engines converge regardless of intra-tie row order. One
    // l_suppkey exchange serves the two windows AND both aggregates
    // (hash(k) satisfies the (k, island) clustering); the fact table
    // shuffles exactly once.
    "q_interval_coverage" -> { (s, dir) =>
      val iv = Tables(s, dir, "lineitem").select(
        col("l_suppkey"),
        to_date(col("l_shipdate")).as("st"),
        date_add(to_date(col("l_shipdate")),
          floor(col("l_quantity")).cast(IntegerType)).as("en"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("st"), col("en"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevMax = max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1))
      iv.withColumn("new_island",
          when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
        .withColumn("island", sum(col("new_island")).over(cum))
        .groupBy(col("l_suppkey"), col("island"))
        .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_islands"),
          sum(datediff(col("ien"), col("ist")) + 1).as("covered_days"))
        .orderBy("l_suppkey")
    },

    // Max concurrent intervals (overlap depth): the +1/-1 boundary-event
    // sweep over the same supplier intervals — open at st, close at
    // en + 1 day (inclusive-date intervals), cumulative-sum in
    // (date, delta) order so closes land before opens on the same day
    // (touching intervals don't count as overlapping). Boundary events
    // aggregate to (key, date, delta) BEFORE the window — map-side
    // partials absorb the corpus, so the sweep's sort runs over the
    // date-domain-bounded frame, not the fact table (and the window
    // keys are unique, so the cumsum is trivially order-deterministic).
    // Bulk same-sign deltas preserve the running max: opens peak at the
    // bulk value, closes peak before it.
    "q_interval_overlap" -> { (s, dir) =>
      // fanOut (r20): the boundary explode + date arithmetic otherwise
      // run on the scan's 3 byte-sized splits; identity at scale
      val iv = graft.ops.CoreOps.fanOut(
        Tables(s, dir, "lineitem").select(
          col("l_suppkey"),
          to_date(col("l_shipdate")).as("st"),
          date_add(to_date(col("l_shipdate")),
            floor(col("l_quantity")).cast(IntegerType)).as("en")),
        col("l_suppkey"), col("st"))
      // one scan, not a unionAll of two: each interval explodes into its
      // own (open, close) boundary pair
      val pts = iv.select(col("l_suppkey"), explode(array(
          struct(col("st").as("d"), lit(1).as("delta")),
          struct(date_add(col("en"), 1).as("d"), lit(-1).as("delta")))).as("p"))
        .select(col("l_suppkey"), col("p.d").as("d"), col("p.delta").as("delta"))
        .groupBy(col("l_suppkey"), col("d"), col("delta"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("d"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("depth", sum(col("delta") * col("c")).over(w))
        .groupBy(col("l_suppkey"))
        .agg(sum(when(col("delta") === 1, col("c")).otherwise(0L)).as("n_intervals"),
          max(col("depth")).as("max_depth"))
        .orderBy("l_suppkey")
    })

  /** Shared by q_scd2 (the BUILD side) and q_pit_enrich (the READ
    * side): the event changelog collapsed to one row per consecutive
    * run of equal state — (user_id, version, state, vf, n_events), vf
    * the run's first timestamp. One user_id exchange serves the lag
    * window and the run groupBy.
    */
  private def scd2Versions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(cum))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"),
        min(col("ts")).as("vf"), count(lit(1)).as("n_events"))
  }

  val oracles: Map[String, String] = Map(
    "q_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q_sliding_window" ->
      """WITH shifted AS (
           SELECT time_bucket(INTERVAL '30 minutes', ts) AS half, ts FROM events),
         expanded AS (
           SELECT half AS window_start FROM shifted
           UNION ALL
           SELECT half - INTERVAL '30 minutes' AS window_start FROM shifted)
         SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n
         FROM expanded GROUP BY 1 ORDER BY window_start""",
    "q_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id, event_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
         FROM sessions GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q_session_window" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM sessions GROUP BY user_id, session_id
         ORDER BY user_id, session_start""",
    // ordering by epoch_us matches Spark's micros view of the nanos
    // timestamps (Tables truncates TIMESTAMP(NANOS) to micros)
    "q_latest_per_key" ->
      """WITH ranked AS (
           SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
           FROM events)
         SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_type, value
         FROM ranked WHERE rk = 1 ORDER BY user_id""",
    // All timestamp comparisons below run on epoch_us(ts): DuckDB sees
    // the parquet nanos, Spark the micros truncation — comparing at
    // micros on both sides keeps boundary predicates aligned.
    "q_funnel" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS m, event_type FROM events),
         s1 AS (
           SELECT *, min(CASE WHEN event_type = 'view' THEN m END)
             OVER (PARTITION BY user_id ORDER BY m, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_view FROM e),
         s2 AS (
           SELECT *, min(CASE WHEN event_type = 'click' AND m >= t_view THEN m END)
             OVER (PARTITION BY user_id ORDER BY m, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_click FROM s1),
         s3 AS (
           SELECT *, min(CASE WHEN event_type = 'purchase' AND m >= t_click THEN m END)
             OVER (PARTITION BY user_id ORDER BY m, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_buy FROM s2),
         per AS (
           SELECT user_id, min(t_view) AS t1, min(t_click) AS t2, min(t_buy) AS t3
           FROM s3 GROUP BY user_id)
         SELECT step, stage, n_users FROM (
           SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage, count(t1) AS n_users FROM per
           UNION ALL SELECT 2, 'click', count(t2) FROM per
           UNION ALL SELECT 3, 'purchase', count(t3) FROM per)
         ORDER BY step""",
    "q_cohort_retention" ->
      """WITH active AS (
           SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
           FROM events),
         first_seen AS (
           SELECT user_id, min(wk) AS cohort_wk FROM active GROUP BY user_id)
         SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST((wk - cohort_wk) // 7 AS BIGINT) AS week_no,
           count(*) AS n_active
         FROM active a JOIN first_seen USING (user_id)
         GROUP BY cohort_wk, week_no
         ORDER BY cohort_week, week_no""",
    "q_scd2" ->
      """WITH o AS (
           SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev
           FROM events),
         v AS (
           SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
               THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
           FROM o),
         g AS (
           SELECT user_id, CAST(version AS BIGINT) AS version,
             min(event_type) AS state, min(ts) AS vf, count(*) AS n_events
           FROM v GROUP BY user_id, version),
         f AS (
           SELECT *, lead(vf) OVER (PARTITION BY user_id ORDER BY version) AS vt
           FROM g)
         SELECT user_id, version, state,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
           vt IS NULL AS is_current, n_events
         FROM f ORDER BY user_id, version""",
    "q_pit_enrich" ->
      """WITH o AS (
           SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev
           FROM events),
         v AS (
           SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
               THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
           FROM o),
         g AS (
           SELECT user_id, CAST(version AS BIGINT) AS version,
             min(event_type) AS state, min(ts) AS vf
           FROM v GROUP BY user_id, version),
         p AS (
           SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase'),
         j AS (
           SELECT p.user_id, p.event_id, g.version, g.state,
             row_number() OVER (PARTITION BY p.event_id
               ORDER BY epoch_us(g.vf) DESC, g.version DESC) AS rk
           FROM p JOIN g ON g.user_id = p.user_id AND g.vf <= p.ts)
         SELECT user_id, event_id, version, state
         FROM j WHERE rk = 1 ORDER BY event_id""",
    "q_anomaly_mad" ->
      """WITH m AS (
           SELECT *, median(value) OVER (PARTITION BY user_id) AS med FROM events),
         d AS (
           SELECT *, median(abs(value - med)) OVER (PARTITION BY user_id) AS mad
           FROM m)
         SELECT user_id, event_id, value,
           round(abs(value - med) / (1.4826 * mad), 6) AS score
         FROM d
         WHERE mad > 0 AND round(abs(value - med) / (1.4826 * mad), 6) > 3
         ORDER BY user_id, event_id""",
    "q_basket_rules" ->
      """WITH b AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
           FROM events),
         tot AS (
           SELECT count(DISTINCT (user_id, CAST(ts AS DATE))) AS n_baskets
           FROM events),
         itemn AS (SELECT event_type, count(*) AS n_item FROM b GROUP BY event_type),
         pairs AS (
           SELECT x.event_type AS a, y.event_type AS b, count(*) AS n_ab
           FROM b x JOIN b y
             ON x.user_id = y.user_id AND x.day = y.day
               AND x.event_type < y.event_type
           GROUP BY 1, 2),
         rules AS (
           SELECT a AS ante, b AS conseq, n_ab FROM pairs
           UNION ALL
           SELECT b AS ante, a AS conseq, n_ab FROM pairs)
         SELECT r.ante, r.conseq, r.n_ab,
           round(CAST(r.n_ab AS DOUBLE) / t.n_baskets, 6) AS support,
           round(CAST(r.n_ab AS DOUBLE) / na.n_item, 6) AS confidence,
           round(r.n_ab * CAST(t.n_baskets AS DOUBLE) / (na.n_item * nc.n_item), 6)
             AS lift
         FROM rules r
           JOIN itemn na ON na.event_type = r.ante
           JOIN itemn nc ON nc.event_type = r.conseq, tot t
         WHERE r.n_ab >= 5
         ORDER BY lift DESC, ante, conseq LIMIT 20""",
    "q_ewma" ->
      """WITH seq AS (
           SELECT user_id,
             list_sort(list(struct_pack(ts := ts, event_id := event_id,
                                        value := value))) AS evs
           FROM events GROUP BY user_id)
         SELECT user_id, len(evs) AS n_events,
           list_reduce(list_transform(evs, e -> e.value),
             (acc, x) -> 0.75e0 * acc + 0.25e0 * x) AS ewma
         FROM seq ORDER BY user_id""",
    "q_event_paths" ->
      """WITH o AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
           FROM events),
         c AS (
           SELECT event_type, next_type, count(*) AS n
           FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2)
         SELECT event_type, next_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY event_type), 6) AS p
         FROM c ORDER BY event_type, next_type""",
    "q_k_anonymity" ->
      """WITH pu AS (
           SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(floor(value / 10) AS BIGINT) AS vbucket, user_id,
             count(*) AS c
           FROM events GROUP BY 1, 2, 3, 4)
         SELECT event_type, day, vbucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(c) AS BIGINT) AS n_rows,
           count(*) < 5 AS risky
         FROM pu GROUP BY event_type, day, vbucket
         ORDER BY event_type, day, vbucket""",
    "q_gap_fill" ->
      """WITH h AS (
           SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS v
           FROM events GROUP BY 1, 2),
         sp AS (
           SELECT user_id,
             unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr
           FROM h GROUP BY user_id)
         SELECT sp.user_id,
           strftime(sp.hr, '%Y-%m-%d %H:%M:%S') AS hour,
           last_value(h.v IGNORE NULLS) OVER (PARTITION BY sp.user_id
             ORDER BY sp.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
           h.v IS NULL AS is_gap
         FROM sp LEFT JOIN h ON sp.user_id = h.user_id AND sp.hr = h.hr
         ORDER BY sp.user_id, hour""",
    "q_streak" ->
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         numbered AS (
           SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
           FROM days),
         runs AS (
           SELECT user_id, day - CAST(rn AS INTEGER) AS anchor, count(*) AS len
           FROM numbered GROUP BY user_id, anchor)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days
         FROM runs GROUP BY user_id ORDER BY user_id""",
    "q_autocorr" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, c,
             lag(c, 1) OVER w AS l1, lag(c, 2) OVER w AS l2,
             lag(c, 3) OVER w AS l3
           FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         pairs AS (
           SELECT event_type, p.lg AS lag, p.x AS x, p.y AS y
           FROM lagged, LATERAL (VALUES (1, c, l1), (2, c, l2), (3, c, l3))
             AS p(lg, x, y)
           WHERE p.y IS NOT NULL),
         mom AS (
           SELECT event_type, CAST(lag AS BIGINT) AS lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(y*y) AS BIGINT) AS syy
           FROM pairs GROUP BY 1, 2)
         SELECT event_type, lag, n,
           CASE WHEN sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                     sqrt(CAST(n*syy - sy*sy AS DOUBLE)) = 0e0 THEN NULL
                ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
                  (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                   sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
           END AS acf
         FROM mom ORDER BY event_type, lag""",
    "q_lag_corr" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events WHERE event_type IN ('view', 'purchase')
           GROUP BY 1, 2),
         x AS (
           SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS d,
             c AS x
           FROM daily WHERE event_type = 'view'),
         y AS (
           SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS dy,
             c AS y
           FROM daily WHERE event_type = 'purchase'),
         pairs AS (
           SELECT l.lag, x.x, y.y
           FROM x CROSS JOIN (SELECT unnest(range(-3, 4)) AS lag) l
             JOIN y ON y.dy = x.d + l.lag),
         mom AS (
           SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(y*y) AS BIGINT) AS syy
           FROM pairs GROUP BY 1)
         SELECT lag, n,
           CASE WHEN sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                     sqrt(CAST(n*syy - sy*sy AS DOUBLE)) = 0e0 THEN NULL
                ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
                  (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                   sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
           END AS ccf
         FROM mom ORDER BY lag""",
    "q_interarrival" ->
      """WITH gaps AS (
           SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap
           FROM events),
         g AS (SELECT user_id, gap FROM gaps WHERE gap IS NOT NULL)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           quantile_cont(gap, 0.5e0) AS median_gap_us,
           quantile_cont(gap, 0.75e0) - quantile_cont(gap, 0.25e0) AS iqr_gap_us,
           CAST(sum(gap) AS DOUBLE) / count(*) AS mean_gap_us
         FROM g GROUP BY user_id ORDER BY user_id""",
    // exact-grid Σx/Σx² (1e6 quantization) -> identical Welch formula;
    // HUGEINT squares cast to DOUBLE via VARCHAR (strtod correctly
    // rounds; the direct int128->double cast can be a ulp off)
    "q_ab_test" ->
      """WITH g AS (
           SELECT event_type, user_id % 2 AS variant,
             CAST(floor(value * 1000000 + 0.5e0) AS BIGINT) AS gv
           FROM events),
         agg AS (
           SELECT event_type,
             CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n_b,
             CAST(sum(gv) FILTER (variant = 0) AS BIGINT) AS sa,
             CAST(sum(gv) FILTER (variant = 1) AS BIGINT) AS sb,
             sum(CAST(gv AS HUGEINT) * gv) FILTER (variant = 0) AS qa,
             sum(CAST(gv AS HUGEINT) * gv) FILTER (variant = 1) AS qb
           FROM g GROUP BY 1)
         SELECT event_type, n_a, n_b,
           CAST(sa AS DOUBLE) / (n_a * 1e6) AS mean_a,
           CAST(sb AS DOUBLE) / (n_b * 1e6) AS mean_b,
           (CAST(sa AS DOUBLE) / (n_a * 1e6) - CAST(sb AS DOUBLE) / (n_b * 1e6)) /
           sqrt( CAST(CAST(qa * n_a - CAST(sa AS HUGEINT)*sa AS VARCHAR) AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1) * 1e12)
               + CAST(CAST(qb * n_b - CAST(sb AS HUGEINT)*sb AS VARCHAR) AS DOUBLE)
                   / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1) * 1e12)) AS t_welch
         FROM agg ORDER BY event_type""",
    "q_cusum" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, day, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
             sum(c) OVER (PARTITION BY event_type) AS s,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM daily),
         sc AS (
           SELECT event_type, day, n,
             CAST(n AS BIGINT)*prefix - CAST(k AS BIGINT)*s AS scaled,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(CAST(n AS BIGINT)*prefix - CAST(k AS BIGINT)*s) DESC,
                 day ASC) AS rk
           FROM w)
         SELECT event_type, CAST(n AS BIGINT) AS n_days,
           strftime(day, '%Y-%m-%d') AS cp_day,
           CAST(scaled AS DOUBLE) / n AS cusum_peak
         FROM sc WHERE rk = 1 ORDER BY event_type""",
    // isodow - 1 == Spark weekday (0 = Monday)
    "q_seasonality" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, day, c,
             sum(c) OVER (PARTITION BY event_type) AS s_all,
             count(*) OVER (PARTITION BY event_type) AS n_all
           FROM daily),
         byDow AS (
           SELECT event_type, CAST(isodow(day) - 1 AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS sum_events,
             CAST(max(s_all) AS BIGINT) AS s_all,
             CAST(max(n_all) AS BIGINT) AS n_all
           FROM tot GROUP BY 1, 2)
         SELECT event_type, dow, n_days, sum_events,
           CAST(sum_events AS DOUBLE) / n_days AS avg_events,
           (CAST(sum_events AS DOUBLE) / n_days) /
             (CAST(s_all AS DOUBLE) / n_all) AS seasonal_idx
         FROM byDow ORDER BY event_type, dow""",
    "q_entropy" ->
      s"""WITH cnt AS (
           SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT user_id, c,
             sum(c) OVER (PARTITION BY user_id) AS n,
             count(*) OVER (PARTITION BY user_id) AS k
           FROM cnt)
         SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           CAST(max(k) AS BIGINT) AS n_types,
           round(${GridSum.gridSumSql(
              "- (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)")}, 6)
             AS entropy,
           CASE WHEN max(k) = 1 THEN 0e0
                ELSE round(${GridSum.gridSumSql(
                  "- (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)")}
                  / ln(CAST(max(k) AS DOUBLE)), 6)
           END AS entropy_norm
         FROM tot GROUP BY user_id ORDER BY user_id""",
    "q_forecast_backtest" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, c,
             lag(c, 7) OVER w AS l7, lag(c, 1) OVER w AS l1
           FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_evals,
             CAST(sum(abs(c - l7)) AS BIGINT) AS ae7,
             CAST(sum(abs(c - l1)) AS BIGINT) AS ae1,
             CAST(sum(c - l7) AS BIGINT) AS e7
           FROM lagged WHERE l7 IS NOT NULL GROUP BY 1)
         SELECT event_type, n_evals,
           CAST(ae7 AS DOUBLE) / n_evals AS mae_seasonal,
           CAST(ae1 AS DOUBLE) / n_evals AS mae_naive,
           CAST(e7 AS DOUBLE) / n_evals AS mean_bias,
           CASE WHEN ae1 = 0 THEN NULL
                ELSE 1e0 - CAST(ae7 AS DOUBLE) / ae1 END AS skill
         FROM agg ORDER BY event_type""",
    "q_growth_accounting" ->
      """WITH acts AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         dau AS (SELECT day, count(*) AS dau FROM acts GROUP BY 1),
         cov AS (
           SELECT DISTINCT user_id, day + o AS day
           FROM acts CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS o)),
         wau AS (SELECT day, count(*) AS wau FROM cov GROUP BY 1),
         fs AS (SELECT user_id, min(day) AS day FROM acts GROUP BY 1),
         nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
         SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
         FROM dau d JOIN wau w ON d.day = w.day
           LEFT JOIN nu n ON d.day = n.day
         ORDER BY day""",
    "q_rolling_median" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
         win AS (
           SELECT event_type, day, c,
             list_sort(list(c) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS w
           FROM daily)
         SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c,
           CAST(len(w) AS BIGINT) AS n_win,
           CASE WHEN len(w) % 2 = 1 THEN CAST(w[(len(w) + 1) // 2] AS DOUBLE)
                ELSE CAST(w[len(w) // 2] + w[len(w) // 2 + 1] AS DOUBLE) / 2e0
           END AS med7
         FROM win ORDER BY event_type, day""",
    "q_chi2" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         pop AS (
           SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
                  CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_b
           FROM u),
         ut AS (SELECT DISTINCT user_id, event_type FROM events),
         conv AS (
           SELECT event_type,
             CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS conv_a,
             CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS conv_b
           FROM ut GROUP BY 1),
         cells AS (
           SELECT event_type, n_a, n_b, conv_a, conv_b,
             CAST(conv_a AS HUGEINT) * (n_b - conv_b)
               - CAST(n_a - conv_a AS HUGEINT) * conv_b AS det,
             CAST(n_a AS HUGEINT) * n_b
               * (conv_a + conv_b) * (n_a + n_b - conv_a - conv_b) AS denom
           FROM conv, pop)
         SELECT event_type, n_a, n_b, conv_a, conv_b,
           CAST(conv_a AS DOUBLE) / n_a AS rate_a,
           CAST(conv_b AS DOUBLE) / n_b AS rate_b,
           CASE WHEN denom = 0 THEN NULL
                ELSE CAST(CAST((n_a + n_b) * det * det AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(denom AS VARCHAR) AS DOUBLE)
           END AS chi2
         FROM cells ORDER BY event_type""",
    "q_cohort_ltv" ->
      """WITH e AS (
           SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(value AS DECIMAL(18,4)) AS v
           FROM events),
         fs AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
         sz AS (
           SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
           FROM fs GROUP BY 1),
         wkv AS (
           SELECT f.cohort_wk,
             CAST(floor(datediff('day', f.cohort_wk, e.wk) / 7) AS BIGINT) AS week_no,
             sum(e.v) AS wk_value
           FROM e JOIN fs f USING (user_id) GROUP BY 1, 2),
         cum AS (
           SELECT cohort_wk, week_no, wk_value,
             sum(wk_value) OVER (PARTITION BY cohort_wk ORDER BY week_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value
           FROM wkv)
         SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week, week_no,
           cohort_size,
           CAST(CAST(wk_value AS VARCHAR) AS DOUBLE) AS wk_value,
           CAST(CAST(cum_value AS VARCHAR) AS DOUBLE) / cohort_size AS ltv_per_user
         FROM cum c JOIN sz ON c.cohort_wk = sz.cohort_wk
         ORDER BY cohort_week, week_no""",
    "q_mannwhitney" ->
      """WITH g AS (
           SELECT event_type, user_id % 2 AS variant,
             CAST(floor(value * 1000000 + 0.5e0) AS BIGINT) AS gv
           FROM events),
         pv AS (
           SELECT event_type, gv,
             CAST(count(*) FILTER (variant = 0) AS BIGINT) AS ca,
             CAST(count(*) FILTER (variant = 1) AS BIGINT) AS cb
           FROM g GROUP BY 1, 2),
         rk AS (
           SELECT event_type, gv, ca, cb,
             sum(ca + cb) OVER (PARTITION BY event_type ORDER BY gv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(ca) OVER (PARTITION BY event_type) AS na,
             sum(cb) OVER (PARTITION BY event_type) AS nb
           FROM pv),
         ranks AS (
           SELECT event_type, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             sum(CAST(ca AS HUGEINT) * (2*cum - ca - cb + 1)) AS r2a
           FROM rk GROUP BY 1, 2, 3)
         SELECT event_type, na, nb,
           CAST(CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS VARCHAR) AS DOUBLE)
             / 2e0 AS u_a,
           CAST(CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS VARCHAR) AS DOUBLE)
             / 2e0 / (CAST(na AS DOUBLE) * nb) AS auc
         FROM ranks ORDER BY event_type""",
    "q_ks_test" ->
      """WITH g AS (
           SELECT event_type, user_id % 2 AS variant,
             CAST(floor(value * 1000000 + 0.5e0) AS BIGINT) AS gv
           FROM events),
         pv AS (
           SELECT event_type, gv,
             CAST(count(*) FILTER (variant = 0) AS BIGINT) AS ca,
             CAST(count(*) FILTER (variant = 1) AS BIGINT) AS cb
           FROM g GROUP BY 1, 2),
         cum AS (
           SELECT event_type, gv, ca, cb,
             sum(ca) OVER w AS cca, sum(cb) OVER w AS ccb,
             sum(ca) OVER (PARTITION BY event_type) AS na,
             sum(cb) OVER (PARTITION BY event_type) AS nb
           FROM pv WINDOW w AS (PARTITION BY event_type ORDER BY gv
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         d AS (
           SELECT event_type, CAST(max(na) AS BIGINT) AS na,
             CAST(max(nb) AS BIGINT) AS nb,
             max(abs(CAST(cca AS HUGEINT) * nb - CAST(ccb AS HUGEINT) * na))
               AS dnum
           FROM cum GROUP BY 1)
         SELECT event_type, na, nb,
           CAST(CAST(dnum AS VARCHAR) AS DOUBLE)
             / (CAST(na AS DOUBLE) * nb) AS ks_d
         FROM d ORDER BY event_type""",
    "q_cuped" ->
      """WITH per AS (
           SELECT user_id, user_id % 2 AS variant,
             CAST(count(*) FILTER (CAST(ts AS DATE) < DATE '2024-01-16') AS BIGINT) AS x,
             CAST(sum(CAST(floor(value * 1000000 + 0.5e0) AS BIGINT))
               FILTER (CAST(ts AS DATE) >= DATE '2024-01-16') AS BIGINT) AS yg0
           FROM events GROUP BY 1, 2),
         pu AS (SELECT user_id, variant, x, coalesce(yg0, 0) AS yg FROM per),
         mom AS (
           SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(yg) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * yg) AS VARCHAR) AS sxyv,
             CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR) AS sxxv
           FROM pu),
         theta AS (
           SELECT CAST(sx AS DOUBLE) / n AS xbar,
             (CAST(n AS DOUBLE) * CAST(sxyv AS DOUBLE)
               - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * CAST(sxxv AS DOUBLE)
                 - CAST(sx AS DOUBLE) * sx) / 1e6 AS th
           FROM mom),
         adj AS (
           SELECT variant, yg / 1e6 AS y, yg / 1e6 - th * (x - xbar) AS ya
           FROM pu, theta)
         SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(CAST(floor(y * 1.0e9 + 0.5e0) AS BIGINT)) AS DOUBLE)
             / 1.0e9 / count(*), 6) AS mean_y,
           round(CAST(sum(CAST(floor(ya * 1.0e9 + 0.5e0) AS BIGINT)) AS DOUBLE)
             / 1.0e9 / count(*), 6) AS mean_y_adj,
           round(CAST(sum(CAST(floor(y * y * 1.0e3 + 0.5e0) AS BIGINT)) AS DOUBLE)
             / 1.0e3 / count(*)
             - pow(CAST(sum(CAST(floor(y * 1.0e9 + 0.5e0) AS BIGINT)) AS DOUBLE)
               / 1.0e9 / count(*), 2), 3) AS var_y,
           round(CAST(sum(CAST(floor(ya * ya * 1.0e3 + 0.5e0) AS BIGINT)) AS DOUBLE)
             / 1.0e3 / count(*)
             - pow(CAST(sum(CAST(floor(ya * 1.0e9 + 0.5e0) AS BIGINT)) AS DOUBLE)
               / 1.0e9 / count(*), 2), 3) AS var_y_adj
         FROM adj GROUP BY variant ORDER BY variant""",
    "q_debounce" ->
      """WITH g AS (
           SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events)
         SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type
         FROM g
         WHERE prev_ts IS NULL
           OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
         ORDER BY user_id, event_id""",
    "q_funnel_time" ->
      """WITH st AS (
           SELECT user_id, ts, event_id, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER w AS t_view
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         st2 AS (
           SELECT user_id, ts, event_id, event_type, t_view,
             min(CASE WHEN event_type = 'click' AND t_view IS NOT NULL THEN ts END)
               OVER w AS t_click
           FROM st
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         st3 AS (
           SELECT user_id, t_view, t_click,
             min(CASE WHEN event_type = 'purchase' AND t_click IS NOT NULL THEN ts END)
               OVER w AS t_buy
           FROM st2
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         per AS (
           SELECT user_id, max(t_view) AS v, max(t_click) AS c, max(t_buy) AS b
           FROM st3 GROUP BY 1),
         deltas AS (
           SELECT 'view_to_click' AS stage, epoch_us(c) - epoch_us(v) AS delta
           FROM per WHERE c IS NOT NULL
           UNION ALL
           SELECT 'click_to_purchase' AS stage, epoch_us(b) - epoch_us(c) AS delta
           FROM per WHERE b IS NOT NULL)
         SELECT stage, CAST(count(*) AS BIGINT) AS n_users,
           quantile_cont(delta, 0.5e0) AS median_us,
           quantile_cont(delta, 0.75e0) - quantile_cont(delta, 0.25e0) AS iqr_us
         FROM deltas GROUP BY stage ORDER BY stage""",
    "q_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
         sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
         shared AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM ut a JOIN ut b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_shared,
           CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
         FROM shared
           JOIN sizes sa ON sa.event_type = type_a
           JOIN sizes sb ON sb.event_type = type_b
         ORDER BY type_a, type_b""",
    "q_survival" ->
      """WITH life AS (
           SELECT user_id, min(CAST(ts AS DATE)) AS fd, max(CAST(ts AS DATE)) AS ld
           FROM events GROUP BY 1),
         mx AS (SELECT max(CAST(ts AS DATE)) AS corpus_max FROM events),
         lives AS (
           SELECT user_id, datediff('day', fd, ld) AS life,
             CASE WHEN ld = corpus_max THEN 1 ELSE 0 END AS censored
           FROM life, mx),
         tg AS (
           SELECT life AS t, count(*) AS n_at_t,
             sum(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS d
           FROM lives GROUP BY 1),
         risk AS (
           SELECT t, CAST(d AS BIGINT) AS d,
             CAST(sum(n_at_t) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
           FROM tg),
         terms AS (
           SELECT t, d, n_risk,
             CASE WHEN d = 0 THEN 0
                  WHEN d = n_risk THEN NULL
                  ELSE CAST(floor(ln(1e0 - CAST(d AS DOUBLE)/n_risk) * 1.0e9 + 0.5e0)
                    AS BIGINT) END AS g,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead
           FROM risk),
         cum AS (
           SELECT t, d, n_risk,
             sum(coalesce(g, 0)) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum,
             max(dead) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anydead
           FROM terms)
         SELECT CAST(t AS BIGINT) AS t_days, n_risk, d,
           CASE WHEN anydead = 1 THEN 0e0
                ELSE round(exp(CAST(gcum AS DOUBLE) / 1.0e9), 6) END AS s_km
         FROM cum ORDER BY t_days""",
    // decimal running sums/maxes are exact in both engines; the final
    // decimal->double casts go via VARCHAR (DuckDB's direct cast can be
    // a ulp off the correctly-rounded value)
    "q_drawdown" ->
      """WITH running AS (
           SELECT user_id, ts, event_id,
             sum(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
           FROM events),
         bal AS (
           SELECT user_id, bal,
             max(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           FROM running)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(max(bal) AS VARCHAR) AS DOUBLE) AS peak_balance,
           CAST(CAST(max(peak - bal) AS VARCHAR) AS DOUBLE) AS max_drawdown
         FROM bal GROUP BY user_id ORDER BY user_id""",
    "q_theil_sen" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS d, c
           FROM daily),
         slopes AS (
           SELECT a.event_type, a.d AS da, b.d AS db,
             CAST(b.c - a.c AS DOUBLE) / (b.d - a.d) AS slope
           FROM idx a JOIN idx b
             ON a.event_type = b.event_type AND a.d < b.d),
         ranked AS (
           SELECT event_type, slope,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY slope, da, db) AS BIGINT) AS r,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM slopes)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n_pairs,
           avg(slope) AS ts_slope
         FROM ranked
         WHERE r = (n + 1) // 2 OR r = (n + 2) // 2
         GROUP BY event_type ORDER BY event_type""",
    "q_attribution" ->
      """WITH touched AS (
           SELECT event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
           FROM events)
         SELECT coalesce(last_touch, 'none') AS attributed_type,
           count(*) AS n_conversions
         FROM touched WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY attributed_type""",
    "q_interval_coverage" ->
      """WITH iv AS (
           SELECT l_suppkey, CAST(l_shipdate AS DATE) AS st,
             CAST(l_shipdate AS DATE) + CAST(floor(l_quantity) AS INTEGER) AS en
           FROM lineitem),
         flagged AS (
           SELECT l_suppkey, st, en,
             CASE WHEN max(en) OVER (PARTITION BY l_suppkey ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                 OR st > max(en) OVER (PARTITION BY l_suppkey ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
           FROM iv),
         islands AS (
           SELECT l_suppkey, st, en,
             sum(new_island) OVER (PARTITION BY l_suppkey ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM flagged),
         merged AS (
           SELECT l_suppkey, island, min(st) AS ist, max(en) AS ien
           FROM islands GROUP BY 1, 2)
         SELECT l_suppkey, count(*) AS n_islands,
           CAST(sum(date_diff('day', ist, ien) + 1) AS BIGINT) AS covered_days
         FROM merged GROUP BY l_suppkey ORDER BY l_suppkey""",
    "q_interval_overlap" ->
      """WITH iv AS (
           SELECT l_suppkey, CAST(l_shipdate AS DATE) AS st,
             CAST(l_shipdate AS DATE) + CAST(floor(l_quantity) AS INTEGER) AS en
           FROM lineitem),
         pts AS (
           SELECT l_suppkey, d, delta, count(*) AS c FROM (
             SELECT l_suppkey, st AS d, 1 AS delta FROM iv
             UNION ALL
             SELECT l_suppkey, en + 1 AS d, -1 AS delta FROM iv)
           GROUP BY 1, 2, 3),
         depth AS (
           SELECT l_suppkey, delta, c,
             sum(delta * c) OVER (PARTITION BY l_suppkey ORDER BY d, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
           FROM pts)
         SELECT l_suppkey,
           CAST(sum(CASE WHEN delta = 1 THEN c ELSE 0 END) AS BIGINT) AS n_intervals,
           CAST(max(depth) AS BIGINT) AS max_depth
         FROM depth GROUP BY l_suppkey ORDER BY l_suppkey""")
}
