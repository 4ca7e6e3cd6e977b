package graft.queries

import graft.Tables
import graft.ops.CoreOps.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
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
      hourly
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
    })

  val oracles: Map[String, String] = Map(
    "q_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
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
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
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
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
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
    "q_gap_fill" ->
      """WITH h AS (
           SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
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
         ORDER BY sp.user_id, hour""")
}
