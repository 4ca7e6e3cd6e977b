package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** readStream over the real events parquet — proves the file-source path
  * (schema handling incl. the nanos timestamp) matches the batch twin.
  */
class FileStreamSpec extends SparkSpec {

  test("file-based streaming tumbling agg matches the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    // file streams track directories; stage the single parquet file
    val staged = java.nio.file.Files.createTempDirectory("graft_evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val stream = StreamingOps.readEventsStream(spark, staged.toString)
    val agg = StreamingOps.tumblingAgg(stream, "1 hour", "10 years") // no late drop
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = agg.writeStream.format("memory")
      .queryName("file_tumbling").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_tumbling")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val expected = Tables(spark, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("readEventsStream on an empty-at-start directory waits for files instead of failing") {
    // a normal ingest condition: the watched directory exists but holds
    // no files yet — the schema sniff can't run, so the canonical
    // eventsSchema fallback must keep the stream constructible
    val staged = java.nio.file.Files.createTempDirectory("graft_evstream_empty")
    val stream = StreamingOps.readEventsStream(spark, staged.toString)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val q = stream.groupBy("event_type").count()
      .writeStream.format("memory").queryName("empty_dir_events")
      .outputMode("complete").start()
    try {
      q.processAllAvailable() // zero batches, zero rows — and zero throws
      assert(spark.table("empty_dir_events").isEmpty)
      // a file landing AFTER start is picked up with the fallback schema
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        staged.resolve("events.parquet"))
      q.processAllAvailable()
      assert(spark.table("empty_dir_events").count() > 0)
    } finally q.stop()
  }
}
