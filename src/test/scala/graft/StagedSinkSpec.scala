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

  private def partFiles(path: String): Int = {
    val it = Files.list(Paths.get(path)).iterator()
    var n = 0
    while (it.hasNext) {
      if (it.next().getFileName.toString.startsWith("part-")) n += 1
    }
    n
  }

  test("overwrite truncates via one manifest swap; N-1 dropped at commit of N+1") {
    val path = tmp()
    writeVals(path, 1L to 10L) // gen 1: 3 part files
    writeVals(path, 100L to 103L, mode = "overwrite") // gen 2
    assert(readVals(path) == (100L to 103L))
    // one-generation retention: gen 1's files SURVIVE the overwrite
    // that superseded them (an in-flight gen-1 scan may still need
    // them) — 3 + 3 part files on disk, only gen 2 visible
    assert(partFiles(path) == 6, "previous generation not retained")
    writeVals(path, 200L to 201L, mode = "overwrite") // gen 3
    assert(readVals(path) == (200L to 201L))
    // gen 1 is now two commits old: physically gone; gen 2 retained
    assert(partFiles(path) == 6,
      s"expected gen2+gen3 only (3+3 files), got ${partFiles(path)}")
    assert(StagedSink.readCommitted(spark, path).count() == 2)
  }

  test("a scan planned before an overwrite completes against its own generation") {
    val path = tmp()
    writeVals(path, 1L to 10L)
    val old = StagedSink.readCommitted(spark, path)
    // force physical planning NOW: the DSv2 scan freezes gen 1's file
    // list (newScanBuilder runs during planning, not execution)
    old.queryExecution.executedPlan
    writeVals(path, 100L to 103L, mode = "overwrite")
    // the overwrite already landed; the frozen scan must still read
    // gen 1 in full because retention kept its files. Collect through
    // the SAME DataFrame — a derived Dataset builds a fresh
    // QueryExecution and would (correctly) re-plan against gen 2.
    assert(old.collect().map(_.getLong(0)).sorted.toSeq == (1L to 10L),
      "in-flight scan lost its generation to the overwrite")
    assert(readVals(path) == (100L to 103L))
  }

  test("generation=previous reads the retained N-1; depth limits fail loudly") {
    val path = tmp()
    writeVals(path, 1L to 5L)
    // first commit: nothing retained yet — previous must fail loudly
    val e = intercept[Exception] {
      StagedSink.readPreviousGeneration(spark, path).collect()
    }
    assert(e.getMessage.contains("no retained previous generation"),
      e.getMessage)
    // overwrite: current flips to the new rows, previous IS generation 1
    writeVals(path, 10L to 12L, mode = "overwrite")
    assert(readVals(path) == (10L to 12L))
    assert(StagedSink.readPreviousGeneration(spark, path)
      .as[Long].collect().sorted.toSeq == (1L to 5L))
    // the post-overwrite audit: both generations diffable while live
    val gained = StagedSink.readCommitted(spark, path)
      .except(StagedSink.readPreviousGeneration(spark, path)).count()
    assert(gained == 3L)
    // one more overwrite: generation 1 is beyond retention — the
    // previous read now returns generation 2, never a mixed view
    writeVals(path, 100L to 101L, mode = "overwrite")
    assert(StagedSink.readPreviousGeneration(spark, path)
      .as[Long].collect().sorted.toSeq == (10L to 12L))
    // and an unknown generation label is rejected at planning
    val bad = intercept[Exception] {
      spark.read.format("graft.sources.StagedSink").option("path", path)
        .option("generation", "v0").load().collect()
    }
    assert(bad.getMessage.contains("generation must be"), bad.getMessage)
  }

  test("generation=previous decodes with its OWN schema after a schema change") {
    val path = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.format("graft.sources.StagedSink").option("path", path)
      .mode("append").save()
    // schema-CHANGING overwrite: a double column lands between id and
    // name, so decoding gen-1 lines through the new layout would read
    // "a"/"b" as doubles (or worse, silently null them) — the manifest
    // must instead serve gen 1 with its recorded two-column DDL
    Seq((10L, 0.5, "x"), (11L, 0.7, "y")).toDF("id", "score", "name")
      .write.format("graft.sources.StagedSink").option("path", path)
      .mode("overwrite").save()
    assert(StagedSink.readCommitted(spark, path).schema.fieldNames.toSeq ==
      Seq("id", "score", "name"))
    val prev = StagedSink.readPreviousGeneration(spark, path)
    assert(prev.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(prev.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // a legacy manifest (no prev_schema recorded) must FAIL LOUDLY on a
    // previous-generation read — silently decoding through the current
    // layout is exactly the hazard the field exists to close
    val mPath = Paths.get(path, "_MANIFEST.json")
    val json = new String(Files.readAllBytes(mPath), "UTF-8")
    assert(json.contains("\"prev_schema\""), json)
    val legacy = json.substring(0, json.indexOf("\"prev_schema\"")) +
      json.substring(json.indexOf("\"schema\""))
    Files.write(mPath, legacy.getBytes("UTF-8"))
    val e = intercept[Exception] {
      StagedSink.readPreviousGeneration(spark, path).collect()
    }
    assert(e.getMessage.contains("prev_schema"), e.getMessage)
    // the current generation stays readable through the same manifest
    assert(StagedSink.readCommitted(spark, path).count() == 2L)
  }

  test("strings with newlines, quotes, backslashes and empties round-trip") {
    val path = tmp()
    val tricky = Seq(
      (1L, "line1\nline2"),     // LF would split the row unescaped
      (2L, "cr\rhere"),         // CR
      (3L, "back\\slash\\n"),   // literal backslash + fake escape
      (4L, "say \"hi\", ok"),   // CSV-style quoting must NOT kick in
      (5L, ""),                 // empty string is NOT null
      (6L, null))               // null is NOT empty string
    tricky.toDF("k", "s")
      .write.format("graft.sources.StagedSink").option("path", path)
      .mode("append").save()
    val back = StagedSink.readCommitted(spark, path).orderBy("k").collect()
    tricky.sortBy(_._1).zipWithIndex.foreach { case ((k, s), i) =>
      assert(back(i).getLong(0) == k)
      if (s == null) assert(back(i).isNullAt(1), s"row $k: null became non-null")
      else assert(back(i).getString(1) == s, s"row $k: '$s' corrupted")
    }
    // row count is the sharpest splitting check: 6 in, 6 out
    assert(StagedSink.readCommitted(spark, path).count() == 6)
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

  test("column pruning reaches the DSv2 scan: projected width, reordered, correct") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val path = tmp()
    Seq((1L, "a", 10.5), (2L, null: String, 20.25), (3L, "c", 30.125))
      .toDF("id", "name", "score")
      .write.format("graft.sources.StagedSink").option("path", path)
      .mode("append").save()
    val projected = spark.read.format("graft.sources.StagedSink")
      .option("path", path).load().select("score", "id") // subset, reordered
    val scans = projected.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    // Spark hands pruneColumns the required subset in TABLE order (the
    // Project above the scan reorders): the gate is the WIDTH — "name"
    // must not reach the scan
    assert(scans.nonEmpty && scans.head.output.map(_.name) == Seq("id", "score"),
      s"scan not pruned: ${scans.map(_.output.map(_.name))}")
    assert(projected.as[(Double, Long)].collect().sortBy(_._2).toSeq ==
      Seq((10.5, 1L), (20.25, 2L), (30.125, 3L)))
    // null round-trips through a pruned single-column read too
    val names = spark.read.format("graft.sources.StagedSink")
      .option("path", path).load().select("name")
      .as[String].collect().toSeq
    assert(names.count(_ == null) == 1 && names.toSet == Set("a", null, "c"))
    // zero-column prune (count(*)) still counts every line
    assert(spark.read.format("graft.sources.StagedSink")
      .option("path", path).load().count() == 3)
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

  test("legacy files encoding null as empty string still read as null") {
    val path = tmp()
    // Option[Long] -> nullable column: a legacy '' null can only have
    // been written where the schema admitted null in the first place
    Seq((Option(1L), "a"), (Option(2L), "b")).toDF("v", "s").coalesce(1)
      .write.format("graft.sources.StagedSink").option("path", path)
      .mode("append").save()
    // rewrite the single committed part file with pre-sentinel content:
    // old writers encoded a null non-string column as the empty string
    val part = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(p => Paths.get(p).getFileName.toString.startsWith("part-"))
    assert(part.length == 1, s"expected one part file, got ${part.length}")
    Files.write(Paths.get(part.head),
      "\u0001x\n3\u0001\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val back = StagedSink.readCommitted(spark, path).orderBy(asc_nulls_first("v")).collect()
    assert(back.length == 2)
    assert(back(0).isNullAt(0) && back(0).getString(1) == "x",
      s"legacy empty-string null not mapped: ${back(0)}")
    // a legacy full-width row with an empty STRING keeps the empty
    // string (the old format could not distinguish it from null)
    assert(back(1).getLong(0) == 3L && back(1).getString(1) == "")
  }
}
