package graft

import graft.sources.StagedSink
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The DSv2 write-side commit protocol (sources.StagedSink): winning
  * attempts commit exactly once, orphans stay invisible, aborts leave
  * the committed table byte-identical, overwrite swaps atomically via
  * the manifest.
  */
class StagedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("staged_sink").toString

  private def writeVals(path: String, vals: Seq[Long], mode: String = "append",
      extra: Map[String, String] = Map.empty): Unit = {
    var w = vals.toDF("v").repartition(3)
      .write.format("graft.sources.StagedSink").option("path", path).mode(mode)
    extra.foreach { case (k, v) => w = w.option(k, v) }
    w.save()
  }

  private def readVals(path: String): Seq[Long] =
    StagedSink.readCommitted(spark, path).as[Long].collect().sorted.toSeq

  test("append commits across partitions; manifest-resolved read; staging cleaned") {
    val path = tmp()
    writeVals(path, 1L to 20L)
    assert(readVals(path) == (1L to 20L))
    writeVals(path, 21L to 25L) // second append accumulates
    assert(readVals(path) == (1L to 25L))
    assert(!Files.exists(Paths.get(path, "_staging")) ||
      Files.list(Paths.get(path, "_staging")).count() == 0,
      "staging not cleaned after commit")
  }

  test("orphaned part files (losing attempts, mid-commit crashes) stay invisible") {
    val path = tmp()
    writeVals(path, 1L to 10L)
    // simulate a losing speculative attempt's leftover landing in the
    // table directory without a manifest entry
    Files.write(Paths.get(path, "part-99999-7.tsv"),
      "4242\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(readVals(path) == (1L to 10L), "orphan file became visible")
  }

  test("a failed write aborts: committed table byte-identical, no partial data") {
    val path = tmp()
    writeVals(path, 1L to 10L)
    val before = readVals(path)
    intercept[Exception] {
      // poison value 15 sits in the second batch -> one writer throws
      writeVals(path, 11L to 20L, extra = Map("failOn" -> "15"))
    }
    assert(readVals(path) == before,
      "failed job changed the visible table")
    assert(!Files.exists(Paths.get(path, "_staging")) ||
      Files.list(Paths.get(path, "_staging")).count() == 0,
      "abort left staging behind")
  }

  test("overwrite truncates via one manifest swap; old files dropped after") {
    val path = tmp()
    writeVals(path, 1L to 10L)
    writeVals(path, 100L to 103L, mode = "overwrite")
    assert(readVals(path) == (100L to 103L))
    // the truncated-away data files are physically gone too
    val leftovers = Files.list(Paths.get(path)).iterator()
    var dataFiles = 0
    while (leftovers.hasNext) {
      val f = leftovers.next().getFileName.toString
      if (f.startsWith("part-")) dataFiles += 1
    }
    val manifest = StagedSink.readCommitted(spark, path)
    assert(manifest.count() == 4)
    assert(dataFiles <= 3, s"old generation not cleaned: $dataFiles part files")
  }

  test("the DSv2 read side round-trips through spark.read.format") {
    val path = tmp()
    writeVals(path, 1L to 12L)
    val back = spark.read.format("graft.sources.StagedSink")
      .option("path", path).load()
    assert(back.schema.fieldNames.toSeq == Seq("v"))
    assert(back.as[Long].collect().sorted.toSeq == (1L to 12L))
    // plan-time manifest freeze: the scan reads one committed generation
    assert(back.filter(col("v") > 6).count() == 6)
  }

  test("streaming append lands each micro-batch through the atomic manifest swap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    val mem = MemoryStream[Long]
    val q = graft.streaming.StreamingOps
      .stagedAppendEachBatch(mem.toDF().withColumnRenamed("value", "v"), path)
      .start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      assert(readVals(path) == Seq(1L, 2L, 3L))
      mem.addData(4L, 5L)
      q.processAllAvailable()
      assert(readVals(path) == (1L to 5L))
    } finally q.stop()
  }

  test("schema round-trips through the manifest (long, double, string, null)") {
    val path = tmp()
    Seq((1L, 1.5, "alpha"), (2L, -0.25, "beta"), (3L, 2.0, null))
      .toDF("k", "x", "s")
      .write.format("graft.sources.StagedSink").option("path", path)
      .mode("append").save()
    val back = StagedSink.readCommitted(spark, path)
      .orderBy("k").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back.map(_.getDouble(1)).toSeq == Seq(1.5, -0.25, 2.0))
    assert(back(0).getString(2) == "alpha" && back(2).isNullAt(2))
  }
}
