package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch-family aggregates that have no DuckDB
  * oracle (engine-specific internals): approx_percentile rank error and
  * approx_count_distinct relative error, both on real testdata.
  */
class SketchSpec extends SparkSpec {

  private lazy val li = Tables(spark, "/root/testdata/sf0.01", "lineitem")

  test("approx_percentile(accuracy=10000) lands within rank-error of exact") {
    // guarantee: rank error <= 1/accuracy; with n ~ 60k rows and
    // accuracy 10k the returned value's true rank must be within
    // n/10000 ~ 6 positions of the target — assert via value bounds at
    // target-rank +- tolerance over the sorted column
    val xs = li.select(col("l_extendedprice")).orderBy("l_extendedprice")
      .collect().map(_.getDouble(0))
    val n = xs.length
    val approx = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
      expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("p95"))
      .head()
    val tol = math.max(1, n / 10000 * 4) // 4x slack on the bound
    def bounds(q: Double): (Double, Double) = {
      val r = (q * (n - 1)).toInt
      (xs(math.max(0, r - tol)), xs(math.min(n - 1, r + tol)))
    }
    val (lo50, hi50) = bounds(0.5)
    val (lo95, hi95) = bounds(0.95)
    assert(approx.getDouble(0) >= lo50 && approx.getDouble(0) <= hi50)
    assert(approx.getDouble(1) >= lo95 && approx.getDouble(1) <= hi95)
  }

  test("approx_count_distinct is within 5% of exact on the order keys") {
    val exact = li.select(count_distinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketch union of daily partials equals the direct sketch exactly") {
    // The q_sketch_merge contract: register-wise max-merge of per-day
    // sketches is LOSSLESS at equal lgK, so the two-level rollup must
    // produce the identical estimate to sketching all raw events at
    // once — not merely a close one. This is what makes per-partition
    // sketch columns safe to persist and re-aggregate incrementally.
    val ev = Tables(spark, "/root/testdata/sf0.01", "events")
    val daily = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == d, s"merged=$m direct=$d")
    // and the estimate itself is within HLL error of the exact count
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(m(k) - n).toDouble / n < 0.05, s"$k: est=${m(k)} exact=$n")
    }
  }
}
