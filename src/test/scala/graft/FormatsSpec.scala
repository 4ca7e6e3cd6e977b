package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: CSV, JSON (lines), ORC
  * round-trips preserve values bit-for-bit on the events subset.
  */
class FormatsSpec extends SparkSpec {

  private def events = Tables(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "user_id", "event_type", "value", "props")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_id").collect().map(_.toSeq).toSeq

  test("csv round-trip (header + quoted JSON column)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/ev"
    events.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(events.schema) // explicit schema: csv is untyped
      .csv(dir)
    assert(canon(back) == canon(events))
  }

  test("json-lines round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString + "/ev"
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    assert(canon(back) == canon(events))
  }

  test("orc round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/ev"
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(canon(back) == canon(events))
    // typed columnar format: schema survives without redeclaration
    assert(back.schema == events.schema)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/ev"
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    // partition pruning shows in the scan's partition filters, and the
    // data files for other event types are never listed for read
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(one.count() ==
      Tables(spark, "/root/testdata/sf0.001", "events")
        .filter(col("event_type") === "click").count())
  }
}
