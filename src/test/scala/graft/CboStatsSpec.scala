package graft

import org.apache.spark.sql.functions._

/** Catalog statistics surface (`ANALYZE TABLE`): row and column stats
  * land in the catalog and flow into logical-plan statistics — what the
  * cost-based optimizer consumes for join reorder and build-side picks.
  * (Plain datasource tables always know their FILE size from the file
  * index — that alone drives threshold broadcasts — so what ANALYZE
  * adds, and what this spec pins, is the exact rowCount and per-column
  * distinct/null stats that file listings cannot provide.)
  */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE TABLE row and column stats flow into plan statistics") {
    val sf = "/root/testdata/sf0.001"
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      Tables(spark, sf, "nation").write.mode("overwrite").saveAsTable("n_stats")

      // before ANALYZE: no row count on the plan
      assert(spark.table("n_stats").queryExecution.optimizedPlan.stats.rowCount.isEmpty)

      spark.sql("ANALYZE TABLE n_stats COMPUTE STATISTICS")
      val expected = spark.table("n_stats").count()
      val rc = spark.table("n_stats").queryExecution.optimizedPlan.stats.rowCount
      assert(rc.exists(_.toLong == expected))

      // column stats: exact distinct count for the join key, zero nulls
      spark.sql("ANALYZE TABLE n_stats COMPUTE STATISTICS FOR COLUMNS n_nationkey")
      val attrStats = spark.table("n_stats")
        .queryExecution.optimizedPlan.stats.attributeStats
      val keyStats = attrStats.toSeq
        .collectFirst { case (a, s) if a.name == "n_nationkey" => s }
      assert(keyStats.isDefined, s"no column stats recorded: $attrStats")
      assert(keyStats.get.distinctCount.exists(_.toLong == expected))
      assert(keyStats.get.nullCount.exists(_.toLong == 0L))

      // the CBO-visible filter estimate uses those stats: an equality on
      // the analyzed key estimates ~1/distinct of the rows, not the
      // stats-free "unknown" passthrough
      val est = spark.table("n_stats")
        .filter(col("n_nationkey") === 3)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(_.toLong <= (expected / 2).max(1L)), s"estimate $est")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS n_stats")
    }
  }
}
