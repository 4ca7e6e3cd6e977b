package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed by the join key
  * into the same bucket count join WITHOUT a shuffle exchange — the
  * pre-partitioning strategy for repeated big-big joins at 100 TB
  * (pay one write-time shuffle, then every join is exchange-free).
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle exchange") {
    // default warehouse dir (spark.sql.warehouse.dir is static); tables
    // dropped in the finally below
    val sf = "/root/testdata/sf0.001"

    // force a sort-merge join: at test scale the dim fits the broadcast
    // threshold, which would sidestep the bucketing path under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "lineitem")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables(spark, sf, "orders")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // SortMergeJoin with NO Exchange below it: bucketing satisfied the
      // join's distribution requirement (only the final agg may exchange).
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange"), plan)

      // and it computes the same result as the plain shuffle join
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
